"""Fused whole-step program equals the step-by-step pipeline."""

import numpy as np
import pytest

from aliby_tpu.engine.fused import FusedObject, compile_fused_step, results_from_fused
from aliby_tpu.extract.extract import format_extraction, process_tree_masks
from aliby_tpu.models.segment import BUNDLED_WEIGHTS, dispatch_segmenter
from aliby_tpu.test_data import render_cells


@pytest.mark.skipif(not BUNDLED_WEIGHTS.exists(), reason="no bundled weights")
def test_fused_matches_stepwise():
    rng = np.random.default_rng(13)
    fovs = []
    for _ in range(2):
        cells, nuclei, _ = render_cells(96, 8, rng)
        noise = rng.normal(0, 0.02, cells.shape).astype(np.float32)
        fovs.append(np.stack([nuclei + noise, cells + noise])[:, None])
    pixels = np.stack(fovs)  # (F=2, C=2, Z=1, Y, X)

    mono_tree = {"None": {"None": ("sizeshape",)}, 0: {"max": ["mean", "intensity"]}}
    multi_tree = {(0, 1): {"None": {"max": ["pearson"]}}}
    cpkw = {"intensity": {"edge_measurements": False}}

    seg = dispatch_segmenter(
        "cellpose", channel_to_segment=0, second_channel=1, max_labels=64
    )
    masks = seg(pixels)
    ref_mono = process_tree_masks(mono_tree, masks, pixels, cp_measure_kwargs=cpkw)
    ref_multi = process_tree_masks(multi_tree, masks, pixels)

    fused = compile_fused_step(
        [
            FusedObject(
                seg.engine, 0, 1, [(mono_tree, cpkw), (multi_tree, None)]
            )
        ],
        max_labels=64,
    )
    out = fused(pixels)
    np.testing.assert_array_equal(out["labels"][0], np.stack(masks))

    fused_mono = results_from_fused(
        fused.plans[0][0], *out["features"][0][0], out["labels"][0]
    )
    fused_multi = results_from_fused(
        fused.plans[0][1], *out["features"][0][1], out["labels"][0]
    )
    for (ref_i, ref_r), (f_i, f_r) in (
        list(zip(zip(*ref_mono), zip(*fused_mono)))
        + list(zip(zip(*ref_multi), zip(*fused_multi)))
    ):
        assert ref_i == f_i
        if isinstance(ref_r, dict):
            for k in ref_r:
                np.testing.assert_allclose(
                    ref_r[k], f_r[k], rtol=2e-4, atol=1e-5, err_msg=k
                )
        else:
            assert np.isclose(ref_r, f_r, rtol=2e-4, atol=1e-5) or (
                np.isnan(ref_r) and np.isnan(f_r)
            )
    # tables built from both agree
    t_ref = format_extraction(ref_mono)
    t_fused = format_extraction(fused_mono)
    assert t_ref.column_names == t_fused.column_names
    assert t_ref.num_rows == t_fused.num_rows


@pytest.mark.skipif(not BUNDLED_WEIGHTS.exists(), reason="no bundled weights")
def test_compiled_pipeline_matches_interpreted(tmp_path, data_dir):
    """pipeline['compiled']=True yields the same profiles parquet."""
    from copy import deepcopy

    import pyarrow.parquet as pq

    from aliby_tpu.io.dataset import DatasetDir
    from aliby_tpu.pipe import run_pipeline_and_post
    from aliby_tpu.pipe_builder import build_pipeline_steps
    from aliby_tpu.test_data import get_dataset, get_dataset_path

    entry = get_dataset("crop_cellpainting_256")
    pos = DatasetDir(
        get_dataset_path(entry["name"]),
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    ).get_position_ids()[0]
    base = build_pipeline_steps(
        channels_to_segment={"nuclei": 0},
        channels_to_extract=[0, 3],
        features_to_extract=("intensity",),
        cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
    )
    base["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": pos["key"], "path": pos["path"]},
        "regex": entry["regex"],
        "capture_order": entry["capture_order"],
    }
    interp = deepcopy(base)
    comp = deepcopy(base)
    comp["compiled"] = True
    run_pipeline_and_post(pipeline=interp, pipeline_name="interp",
                          output_path=tmp_path, overwrite=True)
    run_pipeline_and_post(pipeline=comp, pipeline_name="comp",
                          output_path=tmp_path, overwrite=True)
    t_i = pq.read_table(tmp_path / "profiles" / "interp.parquet")
    t_c = pq.read_table(tmp_path / "profiles" / "comp.parquet")
    assert t_i.column_names == t_c.column_names
    assert t_i.num_rows == t_c.num_rows
    import numpy as np

    for col in t_i.column_names:
        if col.startswith("metadata_object"):
            assert t_i.column(col).to_pylist() == t_c.column(col).to_pylist()
            continue
        a = np.asarray(t_i.column(col).to_pylist(), dtype=float)
        b = np.asarray(t_c.column(col).to_pylist(), dtype=float)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5, err_msg=col)
    # per-tp masks still checkpointed in compiled mode
    assert sorted((tmp_path / "steps" / "comp" / "segment_nuclei").glob("*.npz"))


@pytest.mark.skipif(not BUNDLED_WEIGHTS.exists(), reason="no bundled weights")
def test_compiled_pipeline_with_tracking(tmp_path, data_dir):
    """Compiled mode threads per-tp stitch tracking like the interpreted loop."""
    from aliby_tpu.io.dataset import DatasetZarr
    from aliby_tpu.pipe import run_pipeline_and_post
    from aliby_tpu.test_data import get_dataset_path

    pos = DatasetZarr(get_dataset_path("yeast_zarr")).get_position_ids()[0]
    pipeline = {
        "steps": {
            "tile": {
                "tile_size": None,
                "track_drift": False,
                "image_kwargs": {
                    "source": {"key": pos["key"], "path": pos["path"]},
                    "capture_order": "TCZYX",
                },
            },
            "segment_cell": {
                "segmenter_kwargs": {"kind": "cellpose", "second_channel": 2},
                "channel_to_segment": 1,
            },
            "track": {"kind": "stitch"},
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "track": [("masks", "segment_cell")],
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")],
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": [],
        "save_interval": 1,
        "retain": {"segment_cell": 2},
        "ntps": 3,
        "compiled": True,
    }
    profiles, _ = run_pipeline_and_post(
        pipeline=pipeline, pipeline_name="ct", output_path=tmp_path, overwrite=True,
    )
    assert set(profiles.column("metadata_tp").to_pylist()) == {0, 1, 2}


@pytest.mark.skipif(not BUNDLED_WEIGHTS.exists(), reason="no bundled weights")
def test_builder_single_channel_empty_coloc(tmp_path):
    """The builder's pair-less coloc tree (single extract channel — the
    reference emits it too, pipe_builder.py:19-43) compiles through the
    fused path as a 0-row feature block instead of crashing jnp.stack."""
    import copy

    from aliby_tpu.io.dataset import DatasetZarr
    from aliby_tpu.pipe import run_pipeline_and_post
    from aliby_tpu.pipe_builder import build_pipeline_steps
    from aliby_tpu.test_data import get_dataset_path

    pos = DatasetZarr(get_dataset_path("yeast_zarr")).get_position_ids()[0]
    pipeline = copy.deepcopy(
        build_pipeline_steps(
            channels_to_segment={"cell": 0},
            features_to_extract=("intensity",),
        )
    )
    pipeline["steps"]["tile"]["image_kwargs"] = {"source": pos}
    pipeline["ntps"] = 1
    pipeline["compiled"] = True
    profiles, _ = run_pipeline_and_post(
        pipeline=pipeline, pipeline_name="p1", output_path=tmp_path,
        overwrite=True,
    )
    assert profiles.num_rows > 0
    assert any("Intensity_" in c for c in profiles.column_names)
