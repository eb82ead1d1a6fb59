"""Spot detection, 3-D z-stitch mode, early-stop policy, global dispatch."""

import numpy as np
import pytest

from aliby_tpu.engine.earlystop import EarlyStopMonitor
from aliby_tpu.engine.global_steps import dispatch_global_step
from aliby_tpu.models.segment import dispatch_segmenter


def test_spot_detector_finds_puncta():
    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.02, (96, 96)).astype(np.float32)
    truth = [(20, 30), (50, 70), (80, 15)]
    yy, xx = np.mgrid[0:96, 0:96]
    for cy, cx in truth:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0**2))
    pixels = img[None, None, None]  # (F, C, Z, Y, X)
    seg = dispatch_segmenter("spots", channel_to_segment=0)
    masks = seg(pixels)
    found = masks[0]
    n = int(found.max())
    assert n == 3
    for cy, cx in truth:
        assert found[cy, cx] > 0  # a labeled disk covers each spot


def test_cellpose_3d_zstitch():
    from aliby_tpu.test_data import render_cells

    rng = np.random.default_rng(5)
    cells, nuclei, labels = render_cells(64, 5, rng)
    # 3 z-planes of the same field with varying intensity
    zstack = np.stack([cells * f for f in (0.7, 1.0, 0.8)])
    pixels = np.stack([zstack, np.stack([nuclei] * 3)])[None]  # (1, 2, 3, Y, X)
    seg = dispatch_segmenter(
        "cellpose", channel_to_segment=0, second_channel=1,
        three_d=True, flow_iters=20, max_labels=64,
    )
    masks = seg(pixels)
    assert masks[0].shape == (64, 64)
    assert masks[0].max() > 0  # stitched-and-projected labels exist


def test_earlystop_monitor():
    cfg = {"min_tp": 2, "thresh_pos_clogged": 0.4, "thresh_trap_ncells": 3,
           "thresh_trap_area": 0.9, "ntps_to_eval": 2}
    mon = EarlyStopMonitor(cfg)
    clogged_tile = np.zeros((20, 20), np.uint16)
    clogged_tile[:10, :10] = 1
    clogged_tile[:10, 10:] = 2
    clogged_tile[10:, :10] = 3
    clogged_tile[10:, 10:] = 4  # 4 objects > 3
    clean_tile = np.zeros((20, 20), np.uint16)
    clean_tile[5:9, 5:9] = 1
    # before min_tp nothing happens
    assert not mon.should_stop(0, [[clogged_tile]])
    assert not mon.should_stop(1, [[clogged_tile]])
    # needs ntps_to_eval consecutive clogged tps
    assert not mon.should_stop(2, [[clogged_tile]])
    assert mon.should_stop(3, [[clogged_tile]])
    # a clean tp resets the counter
    mon2 = EarlyStopMonitor(cfg)
    assert not mon2.should_stop(2, [[clogged_tile]])
    assert not mon2.should_stop(3, [[clean_tile]])
    assert not mon2.should_stop(4, [[clogged_tile]])
    assert mon2.should_stop(5, [[clogged_tile]])


def test_earlystop_disabled_by_default():
    mon = EarlyStopMonitor(None)
    assert not mon.enabled
    assert not mon.should_stop(999, [[np.ones((5, 5), np.uint16)]])


def test_dispatch_global_step():
    fn = dispatch_global_step("track_global")
    masks = np.zeros((3, 16, 16), np.int32)
    masks[:, 4:10, 4:10] = 1
    table = fn(masks[None])
    assert "track_id" in table.column_names
    with pytest.raises(ValueError):
        dispatch_global_step("mystery_step")


def test_should_compile_auto_and_explicit(monkeypatch):
    """compiled: unset -> AUTO (accelerator yes, cpu no); explicit wins."""
    import jax

    from aliby_tpu.engine.core import _should_compile

    assert _should_compile({"compiled": True}) is True
    assert _should_compile({"compiled": False}) is False
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _should_compile({}) is False
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _should_compile({}) is True


def test_try_compile_refuses_uncovered_steps():
    """Pipelines with per-tp steps CompiledStep cannot execute (embed*,
    nahual_*) must fall back to interpretation, not silently drop them."""
    from aliby_tpu.engine.compiled import try_compile

    pipeline = {
        "steps": {
            "tile": {},
            "segment_cell": {"channel_to_segment": 0},
            "extract_cell": {"tree": {}},
            "embed_x": {},
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "passed_data": {
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")],
        },
    }
    assert try_compile(pipeline, None, None) is None


def test_try_compile_cached_across_positions():
    """Positions differing only in tile.image_kwargs share ONE CompiledStep
    (re-tracing the fused program per position costs ~10-30 s host each)."""
    from copy import deepcopy

    from aliby_tpu.engine import compiled as C

    base = {
        "steps": {
            "tile": {"tile_size": None, "image_kwargs": {"source": "A"}},
            "segment_cell": {
                "channel_to_segment": 0,
                "segmenter_kwargs": {"kind": "cellpose"},
            },
            "extract_cell": {"tree": {"None": {"None": ["area"]}}, "kwargs": {}},
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "passed_data": {
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")],
        },
    }
    other = deepcopy(base)
    other["steps"]["tile"]["image_kwargs"] = {"source": "B"}
    assert C._pipeline_signature(base) == C._pipeline_signature(other)
    a = C.try_compile(base, None, None)
    b = C.try_compile(other, None, None)
    assert a is not None and a is b
