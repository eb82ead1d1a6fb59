"""Native host runtime: TIFF decoder vs PIL ground truth."""

import numpy as np
import pytest
from PIL import Image

from aliby_tpu import native
from aliby_tpu.test_data import get_dataset_path

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_decode_fixture_matches_pil(data_dir):
    path = sorted(get_dataset_path("crop_cellpainting_256").glob("*.tif"))[0]
    ours = native.tiff_decode(path)
    ref = np.asarray(Image.open(path))
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("compression", [None, "tiff_lzw", "packbits", "tiff_adobe_deflate"])
def test_decode_compressions(tmp_path, compression):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 2**16, (37, 53), dtype=np.uint16)
    f = tmp_path / "x.tif"
    Image.fromarray(arr).save(f, compression=compression)
    ours = native.tiff_decode(f)
    assert ours is not None, f"decode failed for {compression}"
    np.testing.assert_array_equal(ours, arr)


def test_decode_uint8(tmp_path):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    f = tmp_path / "u8.tif"
    Image.fromarray(arr).save(f)
    np.testing.assert_array_equal(native.tiff_decode(f), arr)


def test_multipage(tmp_path):
    pages = [np.full((5, 6), i, np.uint16) for i in range(4)]
    f = tmp_path / "mp.tif"
    Image.fromarray(pages[0]).save(
        f, save_all=True, append_images=[Image.fromarray(p) for p in pages[1:]]
    )
    info = native.tiff_info(f)
    assert info == (6, 5, 16, 4)
    np.testing.assert_array_equal(native.tiff_decode(f, page=2), pages[2])


def test_batch_decode(tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.integers(0, 1000, (16, 16), dtype=np.uint16) for _ in range(6)]
    paths = []
    for i, a in enumerate(arrs):
        f = tmp_path / f"b{i}.tif"
        Image.fromarray(a).save(f)
        paths.append(f)
    out = native.tiff_decode_batch(paths)
    assert out.shape == (6, 16, 16)
    for i, a in enumerate(arrs):
        np.testing.assert_array_equal(out[i], a)


def test_dataplane_uses_native(data_dir):
    """The image layer routes .tif reads through the native decoder."""
    from aliby_tpu.io.image import _read_image_file

    path = sorted(get_dataset_path("crop_cellpainting_256").glob("*.tif"))[0]
    arr = _read_image_file(path)
    ref = np.asarray(Image.open(path))
    np.testing.assert_array_equal(arr, ref)
