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
