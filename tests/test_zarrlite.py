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
