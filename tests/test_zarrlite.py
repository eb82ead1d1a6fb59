"""Round-trips and codec coverage for the self-contained zarr layer."""

import json

import numpy as np
import pytest

from aliby_tpu.io import zarrlite


@pytest.mark.parametrize("compressor", [None, "zlib"])
def test_roundtrip(tmp_path, compressor):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 2**16, (4, 3, 32, 33), dtype=np.uint16)
    zarrlite.write_array(tmp_path / "a", arr, chunks=(1, 1, 32, 33), compressor=compressor)
    z = zarrlite.ZarrArray(tmp_path / "a")
    assert z.shape == arr.shape
    np.testing.assert_array_equal(z[:], arr)
    np.testing.assert_array_equal(z[2, 1], arr[2, 1])
    np.testing.assert_array_equal(z[1:3, :, 4:20, 5], arr[1:3, :, 4:20, 5])


def test_ragged_chunks(tmp_path):
    arr = np.arange(7 * 11, dtype=np.float32).reshape(7, 11)
    zarrlite.write_array(tmp_path / "a", arr, chunks=(3, 4))
    z = zarrlite.ZarrArray(tmp_path / "a")
    np.testing.assert_array_equal(z[:], arr)


def test_group(tmp_path):
    zarrlite.write_group(
        tmp_path / "g", {"p1": np.ones((2, 2)), "p2": np.zeros((3, 3))}
    )
    arrays = zarrlite.open_group(tmp_path / "g")
    assert set(arrays) == {"p1", "p2"}
    np.testing.assert_array_equal(zarrlite.ZarrArray(arrays["p1"])[:], np.ones((2, 2)))


def test_zarr_v3_read(tmp_path):
    """Hand-written v3 node with gzip codec reads back correctly."""
    import gzip

    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    node = tmp_path / "v3"
    node.mkdir()
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [4, 6],
        "data_type": "int32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2, 3]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "gzip", "configuration": {"level": 1}},
        ],
        "fill_value": 0,
    }
    (node / "zarr.json").write_text(json.dumps(meta))
    for ci in range(2):
        for cj in range(2):
            chunk = arr[ci * 2 : ci * 2 + 2, cj * 3 : cj * 3 + 3]
            d = node / "c" / str(ci)
            d.mkdir(parents=True, exist_ok=True)
            (d / str(cj)).write_bytes(gzip.compress(chunk.tobytes()))
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)


def test_blosc_memcpy_frame(tmp_path):
    """Blosc 'memcpyed' frames (flag 0x2) decode via the raw path."""
    arr = np.arange(12, dtype="<u2").reshape(3, 4)
    payload = arr.tobytes()
    header = bytes(
        [2, 2, 0x2, arr.dtype.itemsize]
    ) + len(payload).to_bytes(4, "little") + len(payload).to_bytes(4, "little") + (
        len(payload) + 16
    ).to_bytes(4, "little")
    node = tmp_path / "b"
    node.mkdir()
    meta = {
        "zarr_format": 2,
        "shape": [3, 4],
        "chunks": [3, 4],
        "dtype": "<u2",
        "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 0},
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    (node / ".zarray").write_text(json.dumps(meta))
    (node / "0.0").write_bytes(header + payload)
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)


def _write_v2_node(tmp_path, name, arr, compressor, payload):
    node = tmp_path / name
    node.mkdir()
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(arr.shape),
        "dtype": arr.dtype.str,
        "compressor": compressor,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    (node / ".zarray").write_text(json.dumps(meta))
    (node / ("0" + ".0" * (arr.ndim - 1))).write_bytes(payload)
    return node


def test_jpegxl_missing_imagecodecs_names_codec(tmp_path, monkeypatch):
    """JXL chunks without imagecodecs raise a clear error naming the codec.

    Mirrors the reference's unconditional Jpegxl numcodec registration
    (reference pipe_core.py:19,34): decode when possible, never a bare
    NotImplementedError.
    """
    import sys

    arr = np.zeros((4, 4), np.uint16)
    node = _write_v2_node(
        tmp_path, "jxl", arr, {"id": "imagecodecs_jpegxl"}, b"\xff\x0a fake"
    )
    # None in sys.modules makes `import imagecodecs` raise ImportError
    monkeypatch.setitem(sys.modules, "imagecodecs", None)
    z = zarrlite.ZarrArray(node)
    with pytest.raises(RuntimeError, match="JPEG-XL.*imagecodecs"):
        z[:]


def test_jpegxl_decodes_via_imagecodecs(tmp_path, monkeypatch):
    """When imagecodecs is importable, JXL chunks decode through it."""
    import sys
    import types

    arr = np.arange(16, dtype=np.uint16).reshape(4, 4)
    node = _write_v2_node(
        tmp_path, "jxl_ok", arr, {"id": "jpegxl"}, b"JXLPAYLOAD"
    )
    fake = types.ModuleType("imagecodecs")
    fake.jpegxl_decode = lambda buf: arr  # stands in for the real decoder
    monkeypatch.setitem(sys.modules, "imagecodecs", fake)
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)


def test_lz4_top_level_compressor(tmp_path):
    import pyarrow as pa

    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    payload = pa.Codec("lz4_raw").compress(arr.tobytes())
    if not isinstance(payload, bytes):
        payload = payload.to_pybytes()
    node = _write_v2_node(tmp_path, "lz4", arr, {"id": "lz4"}, payload)
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)
