"""Post-hoc query layer: Signal/Cells over a real pipeline output."""

import numpy as np
import pytest

from aliby_tpu.io.dataset import DatasetZarr
from aliby_tpu.pipe_baby import run_pipeline_and_post
from aliby_tpu.pipe_builder_baby import build_pipeline_steps
from aliby_tpu.postprocess import Cells, Signal
from aliby_tpu.postprocess.indexing import (
    apply_merges,
    group_merges,
    index_isin,
    validate_lineage,
)
from aliby_tpu.test_data import get_dataset_path


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory, data_dir):
    root = get_dataset_path("yeast_zarr")
    position = DatasetZarr(root).get_position_ids()[0]
    pipeline = build_pipeline_steps(
        channels_to_segment={"cell": 1},
        channels_to_extract=[1],
        features_to_extract=("intensity",),
        tile_size=None,
        base_kind="threshold",
        threshold_scale=0.6,
    )
    pipeline["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": position["key"], "path": position["path"]},
        "capture_order": "TCZYX",
    }
    pipeline["ntps"] = 3
    out = tmp_path_factory.mktemp("post")
    run_pipeline_and_post(
        pipeline=pipeline, pipeline_name=position["key"],
        output_path=out, overwrite=True,
    )
    return out, position["key"]


def test_signal_matrix(run_dir):
    out, pos = run_dir
    sig = Signal(out, pos)
    assert any("Intensity_MeanIntensity" in c for c in sig.columns)
    col = next(c for c in sig.columns if c.endswith("Intensity_MeanIntensity"))
    matrix = sig[col]
    assert list(matrix.columns) == [0, 1, 2]
    assert matrix.shape[0] > 5
    # track-consistent labels: most rows have all 3 tps
    full = matrix.notna().all(axis=1).mean()
    assert full > 0.5
    retained = sig.retained(matrix, fraction=1.0)
    assert retained.notna().all().all()


def test_cells_queries(run_dir):
    out, pos = run_dir
    cells = Cells(out, pos, step="segment_cell")
    assert cells.ntimepoints == 3
    masks = cells.masks_at_time(0)
    assert masks[0].ndim == 2 and masks[0].max() > 0
    labels = cells.labels_at_time(1)
    assert len(labels[0]) > 5
    pres = cells.presence_matrix(0)
    assert pres.shape[1] == 3
    assert pres.any(axis=1).all()
    outlines = cells.outlines_at_time(0)
    assert outlines[0].dtype == bool and outlines[0].any()


def test_index_utils():
    idx = np.array([[0, 1], [0, 2], [1, 3]])
    targets = np.array([[0, 2], [1, 3]])
    np.testing.assert_array_equal(index_isin(idx, targets), [False, True, True])

    merges = np.array([[[0, 1], [0, 2]], [[0, 2], [0, 3]], [[1, 5], [1, 6]]])
    groups = group_merges(merges)
    assert sorted(len(g) for g in groups) == [1, 2]

    values = np.array(
        [[1.0, np.nan, np.nan], [np.nan, 2.0, 3.0]], dtype=float
    )
    index = np.array([[0, 1], [0, 2]])
    out, keep = apply_merges(values, index, np.array([[[0, 2], [0, 1]]]))
    np.testing.assert_array_equal(keep, [True, False])
    np.testing.assert_allclose(out[0], [1.0, 2.0, 3.0])

    lineage = np.array([[[0, 1], [0, 2]], [[0, 9], [0, 2]]])
    valid, involved = validate_lineage(lineage, index)
    assert len(valid) == 1
    assert involved.all()


def test_progress_estimation(run_dir):
    out, pos = run_dir
    from aliby_tpu.postprocess.progress import (
        count_objects_per_tp,
        get_npairs,
        run_progress,
    )

    step_dir = out / "steps" / pos / "segment_cell"
    counts = count_objects_per_tp(step_dir)
    assert len(counts) == 3 and all(c > 5 for c in counts)
    assert get_npairs(step_dir) > 0
    report = run_progress(out, [pos, "ghost_position"])
    assert report["positions"][pos]["done"]
    assert report["positions"][pos]["tps_written"] == 3
    assert not report["positions"]["ghost_position"]["done"]
    assert report["fraction_done"] == 0.5


def test_cells_extended_queries(run_dir):
    """Reference Cells surface (agora/io/cells.py:154-295): at_times,
    per-cell where/mask/outline, presence tensors, sliding retention."""
    out, pos = run_dir
    cells = Cells(out, pos, step="segment_cell")
    # at_time/at_times
    per_tile = cells.at_time(0)
    assert set(per_tile) == {0}
    assert all(m.dtype == bool for m in per_tile[0])
    assert len(per_tile[0]) == len(cells.labels_at_time(0)[0])
    stacks = cells.at_times(range(3))
    assert len(stacks) == 3 and stacks[0][0].ndim == 3
    edges = cells.at_time(0, kind="edgemask")
    assert edges[0][0].sum() < per_tile[0][0].sum()
    # per-cell queries
    lbl = cells.labels_at_time(0)[0][0]
    tps, masks = cells.where(lbl, 0)
    assert len(tps) >= 1 and masks[0].any()
    tps2, outlines = cells.outline(lbl, 0)
    assert (tps2 == tps).all() and outlines[0].sum() < masks[0].sum()
    # inventories
    assert lbl in cells.cell_labels_in_trap(0)
    assert cells.nonempty_tp_in_trap(0) == {0, 1, 2}
    assert cells.ntraps == 1
    assert cells.max_label == max(cells.max_labels)
    # presence tensors
    cvt = cells.cells_vs_tps
    assert cvt.shape[1] == 3 and cvt.any(axis=1).all()
    tvt = cells.tiles_vs_cells_vs_tps
    assert tvt.shape == (1, cells.max_label, 3)
    assert tvt.sum() == cvt.sum()
    # sliding-window retention
    win = cells.cell_tp_where(min_consecutive_tps=3)
    ret = cells.retained(min_consecutive_tps=3)
    assert ret.shape[0] == cvt.shape[0]
    assert ret.sum() >= 1  # track-consistent cells persist all 3 tps
    assert (win.any(axis=1) == ret).all()
    # interval restriction zeroes out-of-range windows
    win_hi = cells.cell_tp_where(min_consecutive_tps=1, interval=(1, 2))
    assert not win_hi[:, 0].any() and not win_hi[:, 2:].any()
