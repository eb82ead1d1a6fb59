"""Remote model-serving layer: wire protocol + server round trips."""

import numpy as np
import pytest

from aliby_tpu.net.wire import _decode, _encode


def test_wire_codec_roundtrip():
    payload = {
        "op": "process",
        "data": np.arange(12, dtype=np.uint16).reshape(3, 4),
        "nested": {"floats": np.linspace(0, 1, 5), "flag": True, "none": None},
        "list": [1, "two", 3.0],
        "tup": (4, 5),
    }
    out = _decode(_encode(payload)[8:])
    assert out["op"] == "process"
    np.testing.assert_array_equal(out["data"], payload["data"])
    np.testing.assert_allclose(out["nested"]["floats"], payload["nested"]["floats"])
    assert out["nested"]["flag"] is True and out["nested"]["none"] is None
    assert out["list"] == [1, "two", 3.0]
    assert out["tup"] == (4, 5)


def test_wire_mixed_multiblob():
    """Multiple raw-bytes blobs interleaved with arrays round-trip exactly."""
    payload = {
        "a": b"first-blob",
        "arr": np.arange(6, dtype=np.float64),
        "b": b"",
        "nested": [b"third\x00blob", np.ones((2, 2), np.int8)],
    }
    out = _decode(_encode(payload)[8:])
    assert out["a"] == b"first-blob" and out["b"] == b""
    assert out["nested"][0] == b"third\x00blob"
    np.testing.assert_array_equal(out["arr"], payload["arr"])
    np.testing.assert_array_equal(out["nested"][1], payload["nested"][1])


def test_wire_legacy_unsized_blob():
    """Pre-r2 frames carried one unsized blob; the decoder still accepts them."""
    import json
    import struct

    arr = np.arange(3, dtype=np.uint8)
    blob = b"legacy-payload"
    header = json.dumps({"__dict__": [
        [{"__val__": "x"}, {"__nd__": 0, "dtype": "|u1", "shape": [3]}],
        [{"__val__": "y"}, {"__bytes__": 1}],  # no "n": unsized
    ]}).encode()
    body = arr.tobytes() + blob
    frame = struct.pack("<I", len(header)) + header + body
    out = _decode(frame)
    np.testing.assert_array_equal(out["x"], arr)
    assert out["y"] == blob


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from aliby_tpu.net.server import ModelServer

    addr = f"ipc://{tmp_path_factory.mktemp('ipc')}/model.ipc"
    with ModelServer(addr) as srv:
        yield srv


def test_remote_threshold_segmentation(server):
    from aliby_tpu.models.segment import dispatch_segmenter
    from aliby_tpu.test_data import render_cells

    rng = np.random.default_rng(0)
    cells, nuclei, labels = render_cells(96, 8, rng)
    pixels = np.stack([cells, nuclei])[None][:, :, None]
    seg = dispatch_segmenter(
        "nahual_threshold",
        channel_to_segment=0,
        address=server.address,
        setup_params={"threshold_scale": 0.4},
    )
    masks = seg(pixels)
    assert len(masks) == 1 and masks[0].dtype == np.uint16
    assert masks[0].max() >= labels.max() - 2


def test_remote_embedder(server):
    from aliby_tpu.net.client import make_remote_embedder

    embed = make_remote_embedder(
        address=server.address,
        setup_params={"dim": 16, "model_kwargs": {"base_features": (8, 16)}},
    )
    tiles = np.random.default_rng(1).normal(size=(3, 2, 1, 32, 32)).astype(np.float32)
    out = embed(tiles)
    assert out.shape == (3, 16)


def test_remote_global_tracking(server):
    from aliby_tpu.net.client import make_remote_global_step

    fn = make_remote_global_step("trackastra", address=server.address)
    masks = np.zeros((3, 32, 32), np.int32)
    for t in range(3):
        masks[t, 4 + t : 12 + t, 4:12] = 1
    table = fn(masks[None, :, None])  # (n_fetchers, T, F, Y, X)
    assert "track_id" in table.column_names
    assert len(set(table.column("track_id").to_pylist())) == 1


def test_remote_global_tracking_multitile(server):
    from aliby_tpu.net.client import make_remote_global_step

    fn = make_remote_global_step("trackastra", address=server.address)
    masks = np.zeros((3, 2, 32, 32), np.int32)  # (T, F, Y, X)
    for t in range(3):
        masks[t, 0, 4 + t : 12 + t, 4:12] = 1
        masks[t, 1, 2:10, 2 + t : 10 + t] = 1
        masks[t, 1, 20:28, 20:28] = 2
    table = fn(masks)
    tiles = table.column("tile").to_pylist()
    tracks = table.column("track_id").to_pylist()
    assert set(tiles) == {0, 1}
    per_tile = {f: {tr for ti, tr in zip(tiles, tracks) if ti == f} for f in (0, 1)}
    assert len(per_tile[0]) == 1 and len(per_tile[1]) == 2
    # track ids unique across tiles
    assert not (per_tile[0] & per_tile[1])


def test_server_error_surfaces(server):
    from aliby_tpu.net.wire import Client

    client = Client(server.address)
    with pytest.raises(RuntimeError, match="unknown model group"):
        client.call("setup", model="warp_drive", params={})
    client.close()
