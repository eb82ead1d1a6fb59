"""ParametersABC round-trips (reference tier: tests/agora/base_test.py)."""

import pytest

from aliby_tpu.utils.abc import ParametersABC, StepABC


class DummyParams(ParametersABC):
    _defaults = {"alpha": 1, "nested": {"beta": [2, 3], "gamma": "g"}}


def test_dict_roundtrip():
    p = DummyParams.default()
    d = p.to_dict()
    assert d == {"alpha": 1, "nested": {"beta": [2, 3], "gamma": "g"}}
    q = DummyParams.from_dict(d)
    assert q == p


def test_default_overrides():
    p = DummyParams.default(alpha=7)
    assert p.alpha == 7
    assert p.nested["beta"] == [2, 3]
    # defaults are not mutated by override instances
    p.nested["beta"].append(9)
    assert DummyParams.default().nested["beta"] == [2, 3]


def test_yaml_roundtrip(tmp_path):
    p = DummyParams.default(alpha=5)
    f = tmp_path / "params.yaml"
    text = p.to_yaml(f)
    assert "alpha: 5" in text
    q = DummyParams.from_yaml(f)
    assert q.to_dict() == p.to_dict()
    # also from a yaml string
    r = DummyParams.from_yaml(text)
    assert r == p


def test_fuzzy_update():
    p = DummyParams.default()
    p.update("alpha", 9)
    assert p.alpha == 9
    p.update("gamma", "zzz")  # nested key found by search
    assert p.nested["gamma"] == "zzz"
    with pytest.raises(KeyError):
        p.update("missing_key", 1)


def test_stepabc_timing_delegates():
    calls = []

    class Step(StepABC):
        def _run_tp(self, tp, **kw):
            calls.append(tp)
            return tp * 2

    s = Step(DummyParams.default())
    assert s.alpha == 1  # params become attributes
    assert s.run_tp(3) == 6
    assert calls == [3]
