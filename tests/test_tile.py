"""Tilers: mono/crop/trap + drift + out-of-bounds semantics."""

import numpy as np
import pytest

from aliby_tpu.io.dataset import DatasetZarr
from aliby_tpu.io.image import ImageZarr
from aliby_tpu.test_data import get_dataset_path
from aliby_tpu.tile.tiler import (
    CropTiler,
    Tiler,
    TilerParameters,
    crop_with_median_pad,
    dispatch_tiler,
)


def _yeast_image():
    root = get_dataset_path("yeast_zarr")
    pos = DatasetZarr(root).get_position_ids()[0]
    return ImageZarr({"key": pos["key"], "path": pos["path"]}, capture_order="TCZYX")


def test_mono_tiler(data_dir):
    img = _yeast_image()
    tiler = dispatch_tiler(tile_size=None, track_drift=False)(img)
    assert isinstance(tiler, Tiler)
    result = tiler.run_tp(0)
    assert set(result) == {"drift", "pixels"}
    assert result["pixels"].shape == (1, 3, 3, 293, 293)
    assert "trap_locations" in result["drift"]


def test_drift_tracking(data_dir):
    """The yeast fixture drifts by (+1.5, -1.0) px per tp by construction."""
    img = _yeast_image()
    tiler = dispatch_tiler(tile_size=None, track_drift=True)(img)
    tiler.run_tp(0)
    r1 = tiler.run_tp(1)
    drift = np.asarray(r1["drift"]["drift"])
    # content moves (+2, -1); the registering shift is its negation, and
    # centres_at_time = initial - cumsum(drift) then follows the content
    assert abs(drift[0] + 2) <= 1.2 and abs(drift[1] - 1) <= 1.2
    # cumulative drift shifts tile centres
    c0 = tiler.tile_locs.centres_at_time(0)
    c1 = tiler.tile_locs.centres_at_time(1)
    assert not np.allclose(c0, c1)


def test_crop_with_median_pad():
    frame = np.full((2, 20, 20), 7.0, np.float32)
    frame[:, 5, 5] = 100.0
    out = crop_with_median_pad(frame, slice(-2, 8), slice(0, 10))
    assert out.shape == (2, 10, 10)
    assert (out[:, :2, :] == 7.0).all()  # median fill (20% padding < 25%)
    out2 = crop_with_median_pad(frame, slice(-9, 1), slice(0, 10))
    assert np.isnan(out2).all()  # >25% padded


def test_crop_tiler_grid(data_dir):
    img = _yeast_image()
    tiler = dispatch_tiler("crop", tile_size=64, track_drift=False)(img)
    assert isinstance(tiler, CropTiler)
    out = tiler.run_tp(0)
    tiles = out["pixels"]
    # 293 // 64 = 4 per side -> 16 tiles, (F, C, Z, ts, ts)
    assert tiles.shape == (16, 3, 3, 64, 64)
    # standard scale: near zero mean per channel of the pre-tiled frame
    assert abs(float(tiles.mean())) < 0.1


def _trap_field(n=6, spacing=60, trap=18, size=None, seed=0):
    size = size or (n * spacing + 40)
    rng = np.random.default_rng(seed)
    img = rng.normal(100, 3, (size, size)).astype(np.float32)
    centres = []
    for i in range(n):
        for j in range(n):
            cy, cx = 20 + spacing // 2 + i * spacing, 20 + spacing // 2 + j * spacing
            # U-shaped trap: two vertical bars + bottom bar
            img[cy - trap // 2 : cy + trap // 2, cx - trap // 2 : cx - trap // 2 + 3] += 80
            img[cy - trap // 2 : cy + trap // 2, cx + trap // 2 - 3 : cx + trap // 2] += 80
            img[cy + trap // 2 - 3 : cy + trap // 2, cx - trap // 2 : cx + trap // 2] += 80
            centres.append((cy, cx))
    return img, np.asarray(centres)


def test_trap_detection_synthetic():
    from aliby_tpu.tile.traps import segment_traps

    img, truth = _trap_field()
    found = segment_traps(img, tile_size=40, min_traps=10)
    assert len(found) >= len(truth) * 0.7
    # most found traps are near a true trap centre
    d = np.sqrt(
        ((found[:, None, :] - truth[None, :, :]) ** 2).sum(-1)
    ).min(axis=1)
    assert np.median(d) < 8


def test_tiler_trap_fallback_center(data_dir):
    """Featureless frame -> graceful fallback to a single center tile."""
    img = _yeast_image()
    tiler = dispatch_tiler(tile_size=117, track_drift=False)(img)
    result = tiler.run_tp(0)
    assert tiler.n_tiles >= 1
    assert result["pixels"].shape[0] == tiler.n_tiles
    assert result["pixels"].shape[3:] == (117, 117)
