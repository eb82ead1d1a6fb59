"""The only REAL data on this machine exercises the rebuild's equivalents
(VERDICT r2 item #7).

- ``/root/reference/tests/extraction/data/mo_bud.pkl``: real production
  mother->bud assignments from a phluorin_glt1 experiment — 111 mothers,
  (position, trap, mother_label) -> [(position, trap, daughter_label), ...]
  — driven through ``postprocess/indexing.py``'s validate_lineage /
  group_merges / apply_merges instead of synthetic chains.
- ``/root/reference/tests/agora/data/parameters.yaml``: the reference's
  params yaml fixture round-tripped through ``utils/abc.ParametersABC``
  (mirrors ``/root/reference/tests/agora/base_test.py``).

Both skip cleanly when the reference checkout is absent.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
import pytest

MO_BUD = Path("/root/reference/tests/extraction/data/mo_bud.pkl")
PARAMS_YAML = Path("/root/reference/tests/agora/data/parameters.yaml")


@pytest.fixture(scope="module")
def mo_bud():
    if not MO_BUD.exists():
        pytest.skip("reference mo_bud.pkl not available")
    with open(MO_BUD, "rb") as f:
        return pickle.load(f)


def _lineage_array(mo_bud) -> np.ndarray:
    """(M, 2, 2) rows of [[trap, mother], [trap, daughter]]."""
    rows = []
    for (pos, trap, mother), daughters in mo_bud.items():
        for (dpos, dtrap, dlabel) in daughters:
            assert dpos == pos, "cross-position lineage in fixture?"
            rows.append([[int(trap), int(mother)], [int(dtrap), int(dlabel)]])
    return np.asarray(rows, dtype=np.int64)


def test_mo_bud_inventory(mo_bud):
    """Pin the real fixture's production quirks: 111 mothers, 119 links,
    and 6 buds assigned to MORE than one mother (including one
    self-assignment) — exactly the irregularities the reference's
    first-mother-wins rule exists for."""
    assert len(mo_bud) == 111
    lineage = _lineage_array(mo_bud)
    assert lineage.shape == (119, 2, 2)
    buds = [tuple(r) for r in lineage[:, 1]]
    assert len(buds) - len(set(buds)) == 6  # real duplicate assignments


def test_validate_lineage_on_real_chains(mo_bud):
    from aliby_tpu.postprocess.indexing import validate_lineage

    lineage = _lineage_array(mo_bud)
    all_cells = np.unique(lineage.reshape(-1, 2), axis=0)

    # full index: every FIRST assignment is kept; the 6 real duplicate
    # bud assignments are discarded (first mother wins)
    kept, involved = validate_lineage(lineage, all_cells)
    assert len(kept) == 113
    buds = [tuple(r) for r in kept[:, 1]]
    assert len(buds) == len(set(buds))  # no bud keeps two mothers
    # involved covers exactly the cells present in kept rows
    in_kept = {tuple(r) for r in kept.reshape(-1, 2)}
    expect_involved = np.array([tuple(r) in in_kept for r in all_cells])
    assert (involved == expect_involved).all()

    # drop 10 real daughters from the index: expectation computed
    # independently with plain python (presence + first-mother rules)
    dropped = {tuple(r) for r in lineage[:10, 1]}
    index_rows = [r for r in all_cells if tuple(r) not in dropped]
    index = np.asarray(index_rows, np.int64)
    present = {tuple(r) for r in index_rows}
    seen: set = set()
    expected = 0
    for m, d in ((tuple(a), tuple(b)) for a, b in lineage):
        first = d not in seen
        seen.add(d)
        if first and m in present and d in present:
            expected += 1
    kept2, _ = validate_lineage(lineage, index)
    assert len(kept2) == expected
    assert not any(tuple(r) in dropped for r in kept2[:, 1])


def test_group_and_apply_merges_on_real_tracks(mo_bud):
    """Treat real mother->daughter links as track merges (the production
    scenario: a bud track merging back into its mother's row) and splice a
    synthetic value matrix along them. The real data chains ACROSS
    generations (a daughter is later a mother), which is exactly what
    group_merges must fold into single groups."""
    from aliby_tpu.postprocess.indexing import apply_merges, group_merges

    lineage = _lineage_array(mo_bud)
    merges = lineage[:, ::-1, :]  # (M, 2, 2): [daughter -> mother]
    groups = group_merges(merges)
    assert sum(len(g) for g in groups) == len(merges)
    # independent connected-component count over the link graph (BFS)
    adj: dict = {}
    for a, b in ((tuple(x), tuple(y)) for x, y in merges):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set = set()
    n_comp = 0
    for node in adj:
        if node in seen:
            continue
        n_comp += 1
        stack = [node]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            stack.extend(adj[cur] - seen)
    assert len(groups) == n_comp
    assert any(len(g) > 1 for g in groups)  # real multi-bud mothers chain

    # apply_merges on the pure two-generation subset (mother not itself a
    # merged-away daughter, no self-loops) — the common case, asserted
    # exactly; multi-generation chains are covered by group_merges above
    daughters = {tuple(r) for r in merges[:, 0]}
    seen_d: set = set()
    simple_rows = []
    for m in merges:
        d, mo = tuple(m[0]), tuple(m[1])
        # first assignment only (the 6 real duplicate buds would leave
        # their second mother with nothing to inherit), mother not itself
        # a merged-away daughter, no self-loops
        if d not in seen_d and mo not in daughters and d != mo:
            simple_rows.append(m)
        seen_d.add(d)
    simple = np.asarray(simple_rows, np.int64)
    assert len(simple) >= 80  # bulk of the real links are simple
    index = np.unique(simple.reshape(-1, 2), axis=0)
    lut = {tuple(r): i for i, r in enumerate(index)}
    T = 5
    values = np.full((len(index), T), np.nan)
    for d, m in ((tuple(a), tuple(b)) for a, b in simple):
        values[lut[m], :3] = lut[m]
        values[lut[d], 3:] = lut[d]
    out, keep = apply_merges(values, index, simple)
    for d, m in ((tuple(a), tuple(b)) for a, b in simple):
        assert not keep[lut[d]]
        assert np.isnan(out[lut[d]]).all()
        assert np.isfinite(out[lut[m], 3:]).all()


def test_parameters_yaml_roundtrip():
    if not PARAMS_YAML.exists():
        pytest.skip("reference parameters.yaml not available")
    from aliby_tpu.utils.abc import ParametersABC

    class DummyParameters(ParametersABC):
        @classmethod
        def default(cls):
            return cls.from_dict({})

    params = DummyParameters.from_yaml(PARAMS_YAML)
    assert isinstance(params, ParametersABC)
    assert params.to_yaml() == PARAMS_YAML.read_text()
    assert DummyParameters.default().to_dict() == {}
