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


def test_jpegxl_no_decoder_names_codec(tmp_path, monkeypatch):
    """JXL chunks with neither libjxl nor imagecodecs raise a clear error.

    Mirrors the reference's unconditional Jpegxl numcodec registration
    (reference pipe_core.py:19,34): decode when possible, never a bare
    NotImplementedError.
    """
    import sys

    from aliby_tpu.io import jxl

    arr = np.zeros((4, 4), np.uint16)
    node = _write_v2_node(
        tmp_path, "jxl", arr, {"id": "imagecodecs_jpegxl"}, b"\xff\x0a fake"
    )
    monkeypatch.setattr(jxl, "available", lambda: False)
    # None in sys.modules makes `import imagecodecs` raise ImportError
    monkeypatch.setitem(sys.modules, "imagecodecs", None)
    z = zarrlite.ZarrArray(node)
    with pytest.raises(RuntimeError, match="JPEG-XL.*libjxl.*imagecodecs"):
        z[:]


def test_jpegxl_decodes_via_imagecodecs_fallback(tmp_path, monkeypatch):
    """Without libjxl, JXL chunks fall back to imagecodecs if importable."""
    import sys
    import types

    from aliby_tpu.io import jxl

    arr = np.arange(16, dtype=np.uint16).reshape(4, 4)
    node = _write_v2_node(
        tmp_path, "jxl_ok", arr, {"id": "jpegxl"}, b"JXLPAYLOAD"
    )
    monkeypatch.setattr(jxl, "available", lambda: False)
    fake = types.ModuleType("imagecodecs")
    fake.jpegxl_decode = lambda buf: arr  # stands in for the real decoder
    monkeypatch.setitem(sys.modules, "imagecodecs", fake)
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)


@pytest.mark.skipif(
    not __import__(
        "aliby_tpu.io.jxl", fromlist=["available"]
    ).available(),
    reason="system libjxl not present",
)
class TestJxlFirstParty:
    """First-party libjxl ctypes codec (io/jxl.py): the path the reference
    exercises through imagecodecs' Jpegxl numcodec (pipe_core.py:19,34)."""

    def test_encode_decode_roundtrip_dtypes(self):
        from aliby_tpu.io import jxl

        rng = np.random.default_rng(7)
        for arr in (
            rng.integers(0, 2**16, (40, 56), dtype=np.uint16),
            rng.integers(0, 255, (31, 17), dtype=np.uint8),
            rng.random((24, 24)).astype(np.float32),
            rng.integers(0, 255, (20, 30, 3), dtype=np.uint8),
        ):
            out = jxl.decode(jxl.encode(arr))
            assert out.dtype == arr.dtype and out.shape == arr.shape
            np.testing.assert_array_equal(out, arr)

    def test_truncated_stream_raises(self):
        from aliby_tpu.io import jxl

        buf = jxl.encode(np.zeros((8, 8), np.uint16))
        with pytest.raises((ValueError, RuntimeError)):
            jxl.decode(buf[: len(buf) // 2])

    def test_zarr_store_with_jxl_chunks(self, tmp_path):
        """A jpegxl-compressed v2 store round-trips bit-exactly through
        ZarrArray — the reference's JXL-chunked Cell Painting plate layout."""
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 2**16, (2, 3, 24, 33), dtype=np.uint16)
        zarrlite.write_array(
            tmp_path / "plate", arr, chunks=(1, 1, 24, 33), compressor="jpegxl"
        )
        z = zarrlite.ZarrArray(tmp_path / "plate")
        np.testing.assert_array_equal(z[:], arr)
        np.testing.assert_array_equal(z[1, 2], arr[1, 2])

    def test_image_zarr_over_jxl_plate(self, tmp_path):
        """ImageZarr serves TCZYX frames from a JXL-compressed store."""
        from aliby_tpu.io.image import ImageZarr

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 2**16, (2, 2, 1, 16, 16), dtype=np.uint16)
        zarrlite.write_array(
            tmp_path / "pos0", arr, chunks=(1, 1, 1, 16, 16),
            compressor="jpegxl",
        )
        img = ImageZarr(tmp_path / "pos0")
        np.testing.assert_array_equal(
            np.asarray(img.data[1, 0, 0]), arr[1, 0, 0]
        )


def test_lz4_top_level_compressor(tmp_path):
    import pyarrow as pa

    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    payload = pa.Codec("lz4_raw").compress(arr.tobytes())
    if not isinstance(payload, bytes):
        payload = payload.to_pybytes()
    node = _write_v2_node(tmp_path, "lz4", arr, {"id": "lz4"}, payload)
    z = zarrlite.ZarrArray(node)
    np.testing.assert_array_equal(z[:], arr)
