"""ImageDir modality, CropTiler normalization paths, tcp serving."""

import numpy as np
import pytest
from PIL import Image


def test_imagedir_tcz_grid(tmp_path):
    from aliby_tpu.io.image import ImageDir, dispatch_image

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1000, (2, 3, 2, 24, 24)).astype(np.uint16)
    for t in range(2):
        for c in range(3):
            for z in range(2):
                Image.fromarray(frames[t, c, z]).save(
                    tmp_path / f"img_t{t:03d}_c{c:02d}_z{z:02d}.tiff"
                )
    cls = dispatch_image(tmp_path)
    assert cls is ImageDir
    img = cls(tmp_path)
    data = img.get_data_lazy()
    assert data.shape == (2, 3, 2, 24, 24)
    np.testing.assert_array_equal(np.asarray(data[1, 2, 0]), frames[1, 2, 0])


def test_croptiler_normalization_flags(data_dir):
    from aliby_tpu.io.dataset import DatasetZarr
    from aliby_tpu.io.image import ImageZarr
    from aliby_tpu.test_data import get_dataset_path
    from aliby_tpu.tile.tiler import dispatch_tiler

    pos = DatasetZarr(get_dataset_path("yeast_zarr")).get_position_ids()[0]
    img = ImageZarr({"key": pos["key"], "path": pos["path"]}, capture_order="TCZYX")
    tiler = dispatch_tiler(
        "crop", tile_size=64, track_drift=False,
        standard_scale=False, clip_outliers=True, convert_8bit=True,
    )(img)
    tiles = tiler.run_tp(0)["pixels"]
    assert tiles.min() >= 0 and tiles.max() <= 255


def test_tcp_model_server():
    import socket

    from aliby_tpu.net.server import ModelServer
    from aliby_tpu.net.wire import Client

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    with ModelServer(f"tcp://127.0.0.1:{port}"):
        client = Client(f"tcp://127.0.0.1:{port}")
        assert client.call("ping") == "pong"
        session = client.call("setup", model="embed",
                              params={"model_kwargs": {"base_features": (8, 16)}})
        out = client.call(
            "process", session=session, model="embed",
            data=np.zeros((2, 2, 1, 32, 32), np.float32),
        )
        assert np.asarray(out).shape == (2, 16)
        client.close()
