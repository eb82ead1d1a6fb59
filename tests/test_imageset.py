"""Lazy 5-D assembly across image classes (reference: tests/test_imageset.py)."""

import numpy as np
import pytest

from aliby_tpu.io.dataset import DatasetDir, DatasetZarr
from aliby_tpu.io.image import (
    ImageList,
    ImageMultiTiff,
    ImageZarr,
    adjust_dimensions,
    dispatch_image,
)
from aliby_tpu.test_data import get_dataset, get_dataset_path


def _first_position(name):
    entry = get_dataset(name)
    ds = DatasetDir(
        get_dataset_path(name),
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    )
    return entry, ds.get_position_ids()[0]


def test_imagelist_cellpainting(data_dir):
    entry, pos = _first_position("crop_cellpainting_256")
    source = {"key": pos["key"], "path": pos["path"]}
    cls = dispatch_image(source)
    assert cls is ImageList
    img = cls(source, regex=entry["regex"], capture_order=entry["capture_order"])
    data = img.get_data_lazy()
    assert data.shape == (1, 5, 1, 256, 256)
    frame = data[0, 2, 0]
    assert frame.shape == (256, 256)
    assert frame.dtype == np.uint16
    assert frame.max() > 1000  # cells present


def test_imagelist_yeast_tczyx(data_dir):
    entry, pos = _first_position("yeast_tiff")
    img = ImageList(
        {"key": pos["key"], "path": pos["path"]},
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    )
    data = img.get_data_lazy()
    assert data.shape == (4, 3, 3, 160, 160)
    # Frame pulled lazily equals the file on disk
    frame = data[2, 1, 0]
    assert frame.shape == (160, 160)


def test_image_zarr(data_dir):
    root = get_dataset_path("yeast_zarr")
    pos = DatasetZarr(root).get_position_ids()[0]
    cls = dispatch_image(str(pos["path"]))
    assert cls is ImageZarr
    img = cls({"key": pos["key"], "path": pos["path"]}, capture_order="TCZYX")
    data = img.get_data_lazy()
    assert data.shape == (4, 3, 3, 293, 293)
    assert data[0, 0, 0].dtype == np.uint16


def test_image_zarr_cyx(data_dir):
    root = get_dataset_path("cellpainting_zarr")
    pos = DatasetZarr(root).get_position_ids()[0]
    img = ImageZarr({"key": pos["key"], "path": pos["path"]}, capture_order="CYX")
    data = img.get_data_lazy()
    assert data.shape == (1, 5, 1, 256, 256)


def test_image_multitiff(data_dir):
    root = get_dataset_path("yeast_multitiff")
    f = sorted(root.glob("*.tif"))[0]
    cls = dispatch_image(f)
    assert cls is ImageMultiTiff
    # 36 pages = T4 C3 Z3 flattened on the page axis; name the page axis "S"
    # then reshape is the caller's business — here we use Z to hold pages.
    img = cls(f, capture_order="ZYX")
    assert img.get_data_lazy().shape == (1, 1, 36, 160, 160)


class TestAdjustDimensions:
    def test_identity(self):
        arr = np.zeros((2, 3, 4, 5, 6))
        out = adjust_dimensions(arr, "TCZYX", "TCZYX")
        assert out.shape == (2, 3, 4, 5, 6)

    def test_pad_missing(self):
        arr = np.zeros((5, 6))
        out = adjust_dimensions(arr, "YX", "TCZYX")
        assert out.shape == (1, 1, 1, 5, 6)

    def test_reorder(self):
        arr = np.arange(2 * 3 * 4).reshape(2, 3, 4)
        out = adjust_dimensions(arr, "CYX", "TCZYX")
        assert out.shape == (1, 2, 1, 3, 4)
        np.testing.assert_array_equal(out[0, 1, 0], arr[1])

    def test_unnamed_leading_dims(self):
        # 4-D with capture order "CYX": leading dim named from missing
        # TCZYX dims, filled from the end -> "Z"
        arr = np.zeros((7, 2, 3, 4))
        out = adjust_dimensions(arr, "CYX", "TCZYX")
        assert out.shape == (1, 2, 7, 3, 4)

    def test_squeeze_non_dim(self):
        arr = np.zeros((1, 2, 3, 4))
        out = adjust_dimensions(arr, "WCYX", "TCZYX")
        assert out.shape == (1, 2, 1, 3, 4)

    def test_squeeze_non_dim_fails_if_not_1(self):
        arr = np.zeros((2, 2, 3, 4))
        with pytest.raises(AssertionError):
            adjust_dimensions(arr, "WCYX", "TCZYX")

    def test_truncate_capture_order(self):
        # capture_order longer than ndim: align to the end
        arr = np.zeros((3, 4))
        out = adjust_dimensions(arr, "CZYX"[-2:], "TCZYX")
        assert out.shape == (1, 1, 1, 3, 4)

    def test_lazy_matches_numpy(self, data_dir):
        """Lazy-view path produces identical values to the numpy path."""
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 100, (3, 2, 5, 6), dtype=np.uint16)
        lazy_out = adjust_dimensions(_Indexable(arr), "ZCYX", "TCZYX")
        np_out = adjust_dimensions(arr, "ZCYX", "TCZYX")
        assert lazy_out.shape == np_out.shape
        np.testing.assert_array_equal(lazy_out[0, 1, 2], np_out[0, 1, 2])
        np.testing.assert_array_equal(
            lazy_out[0, :, 1:4, 2:5, :3], np_out[0, :, 1:4, 2:5, :3]
        )


class _Indexable:
    """Minimal shape/dtype/__getitem__ source (not a numpy subclass)."""

    def __init__(self, arr):
        self._arr = arr
        self.shape = arr.shape
        self.dtype = arr.dtype

    def __getitem__(self, idx):
        return self._arr[idx]


def test_imagelist_wildcard_and_instantiate(data_dir):
    from aliby_tpu.io.image import instantiate_image
    from aliby_tpu.test_data import get_dataset, get_dataset_path

    entry = get_dataset("crop_cellpainting_256")
    pattern = str(get_dataset_path(entry["name"]) / "*.tif")
    img = instantiate_image(
        pattern, regex=entry["regex"], capture_order=entry["capture_order"]
    )
    assert isinstance(img, ImageList)
    assert img.get_data_lazy().shape == (1, 5, 1, 256, 256)
    assert len(img.image_id) == 32  # md5 hex
