"""Position discovery across input modalities (reference: tests/test_dataset.py)."""

import numpy as np
import pytest

from aliby_tpu.io.dataset import DatasetDir, DatasetZarr, dispatch_dataset
from aliby_tpu.test_data import DATASETS, get_dataset, get_dataset_path


def test_dispatch_types(data_dir):
    tiff_root = get_dataset_path("crop_cellpainting_256")
    zarr_root = get_dataset_path("yeast_zarr")
    entry = get_dataset("crop_cellpainting_256")
    assert isinstance(
        dispatch_dataset(
            tiff_root, regex=entry["regex"], capture_order=entry["capture_order"]
        ),
        DatasetDir,
    )
    assert isinstance(dispatch_dataset(zarr_root), DatasetZarr)


def test_cellpainting_positions(data_dir):
    entry = get_dataset("crop_cellpainting_256")
    ds = DatasetDir(
        get_dataset_path(entry["name"]),
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    )
    positions = ds.get_position_ids()
    assert [p["key"] for p in positions] == ["A01__1"]
    assert len(positions[0]["path"]) == 5  # five channels
    # Channel files must be in dim order (sorted C captures)
    names = [p.split("__")[-1] for p in positions[0]["path"]]
    assert names == sorted(names)


def test_yeast_tiff_positions(data_dir):
    entry = get_dataset("yeast_tiff")
    ds = DatasetDir(
        get_dataset_path(entry["name"]),
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    )
    positions = ds.get_position_ids()
    assert [p["key"] for p in positions] == ["1", "2"]
    # T*C*Z files per position
    assert all(len(p["path"]) == 4 * 3 * 3 for p in positions)
    # Files sorted with T slowest-varying
    first = positions[0]["path"]
    assert "T00" in first[0] and "T03" in first[-1]


def test_zarr_positions(data_dir):
    ds = DatasetZarr(get_dataset_path("yeast_zarr"))
    positions = ds.get_position_ids()
    assert [p["key"] for p in positions] == ["pos1", "pos2"]


def test_all_datasets_known():
    assert set(DATASETS) == {
        "crop_cellpainting_256",
        "cellpainting_zarr",
        "yeast_tiff",
        "yeast_multitiff",
        "yeast_zarr",
        "cellpainting_zarr_jxl",
    }


def test_jxl_plate_matches_zlib_plate(data_dir):
    """The JXL-chunked plate decodes bit-identically to the zlib one
    (lossless first-party libjxl codec over the same pixels)."""
    from aliby_tpu.io import jxl
    from aliby_tpu.io.zarrlite import ZarrArray

    if not jxl.available():
        pytest.skip("system libjxl not present")
    a = ZarrArray(get_dataset_path("cellpainting_zarr") / "A01")
    b = ZarrArray(get_dataset_path("cellpainting_zarr_jxl") / "A01")
    np.testing.assert_array_equal(a[:], b[:])


def test_grouping_string_sort(tmp_path):
    """Captures sort as strings (reference quirk, dataset.py:227-231)."""
    for t in [1, 2, 10]:
        (tmp_path / f"x__1__T{t}.tif").write_bytes(b"\x00")
    ds = DatasetDir(tmp_path, regex=r".*__([0-9])__T([0-9]+)\.tif", capture_order="FT")
    pos = ds.get_position_ids()
    order = [p.split("T")[-1].split(".")[0] for p in pos[0]["path"]]
    assert order == ["1", "10", "2"]
