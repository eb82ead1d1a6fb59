"""Tilers: mono-tile, trap grid with drift correction, and embedding crops.

Reference surface mirrored (``tile/tiler.py``):

- ``TilerParameters`` defaults tile_size=117, ref_channel=0, ref_z=0
  (``tiler.py:47-55``); drift tracking defaults OFF like the reference's
  effective gate (``calculate_drift``, ``tiler.py:426-438``);
- ``dispatch_tiler("crop") -> CropTiler`` else ``Tiler``; returns a factory
  taking the image instance (``tiler.py:58-72``);
- ``Tiler.run_tp`` on the first call detects traps when ``tile_size`` is
  set (falling back to one centered mono-tile on failure,
  ``tiler.py:678-681``), or covers the full frame when ``tile_size`` is
  None (``tiler.py:247``); per-tp drift comes from FFT phase correlation
  of consecutive reference frames; the return value is
  ``{"drift": tile_locs.to_dict(tp), "pixels": get_fczyx(tp)}``;
- crops that leave the frame are median-padded, or all-NaN when >25% of
  the tile is padding (``tiler.py:599-648``);
- ``CropTiler`` normalizes (clip-outliers / 8-bit / standard-scale) and
  cuts a non-overlapping grid — the embedder front-end
  (``tiler.py:138-189``).

Frames are pulled from the lazy image one (tp, channel) at a time with a
small LRU plus background prefetch of tp+1 (the dask
``scheduler="synchronous"`` pattern replaced by double-buffering).
"""

from __future__ import annotations

import logging
import threading
from collections import OrderedDict

import numpy as np

from aliby_tpu.ops.imageops import phase_cross_correlation_host
from aliby_tpu.tile.geometry import TileLocations
from aliby_tpu.utils.abc import ParametersABC, StepABC

logger = logging.getLogger("aliby_tpu")


class TilerParameters(ParametersABC):
    # track_drift defaults OFF to match the reference's EFFECTIVE behavior:
    # its TilerParameters declares track_drift=True (tiler.py:47-55) but the
    # live gate is the `calculate_drift` attribute, which defaults False and
    # is plumbed from nowhere (tiler.py:426-438) — by default the reference
    # never computes drift. Setting track_drift=True here enables the real
    # per-tp FFT drift tracking (a capability superset).
    _defaults = {
        "tile_size": 117,
        "ref_channel": 0,
        "ref_z": 0,
        "track_drift": False,
        "backup_tile_size": 64,
    }


def dispatch_tiler(kind: str = "trap", **kwargs):
    """Return a ``factory(image) -> tiler`` for the requested tiler kind."""
    tiler_param_names = set(TilerParameters._defaults) | {"max_size"}
    params = {k: v for k, v in kwargs.items() if k in tiler_param_names}
    extras = {k: v for k, v in kwargs.items() if k not in tiler_param_names}
    cls = CropTiler if kind == "crop" else Tiler

    def factory(image):
        return cls.from_image(image, TilerParameters.default(**params), **extras)

    return factory


class _FrameCache:
    """LRU of computed (tp, channel) -> (Z, Y, X) frames + async prefetch."""

    def __init__(self, pixels, capacity: int = 4):
        self.pixels = pixels  # lazy 5-D TCZYX
        self.capacity = capacity
        self._cache: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def get(self, tp: int, channel: int) -> np.ndarray:
        key = (tp, channel)
        with self._lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                return self._cache[key]
        frame = np.asarray(self.pixels[tp, channel])
        with self._lock:
            self._cache[key] = frame
            while len(self._cache) > self.capacity:
                self._cache.popitem(last=False)
        return frame

    def prefetch(self, tp: int, channel: int) -> None:
        if tp >= self.pixels.shape[0]:
            return
        threading.Thread(
            target=self.get, args=(tp, channel), daemon=True
        ).start()


def crop_with_median_pad(
    frame: np.ndarray, yslice: slice, xslice: slice, nan_frac: float = 0.25
) -> np.ndarray:
    """Crop (..., Y, X); out-of-frame area takes the frame median, and a
    tile more than ``nan_frac`` outside becomes all-NaN
    (``tiler.py:599-648``)."""
    H, W = frame.shape[-2:]
    y0, y1 = yslice.start, yslice.stop
    x0, x1 = xslice.start, xslice.stop
    th, tw = y1 - y0, x1 - x0
    if 0 <= y0 and y1 <= H and 0 <= x0 and x1 <= W:
        # fully inside (the mono-tile / undrifted common case): no pad
        # value needed — np.median on the full frame partitions a copy
        # (~14 ms at 1k x 1k), which dominated per-tp host time when
        # computed unconditionally.
        return frame[..., y0:y1, x0:x1].astype(np.float32)
    out = np.full(frame.shape[:-2] + (th, tw), np.median(frame), dtype=np.float32)
    ys0, ys1 = max(y0, 0), min(y1, H)
    xs0, xs1 = max(x0, 0), min(x1, W)
    if ys1 > ys0 and xs1 > xs0:
        out[..., ys0 - y0 : ys1 - y0, xs0 - x0 : xs1 - x0] = frame[
            ..., ys0:ys1, xs0:xs1
        ]
        inside = (ys1 - ys0) * (xs1 - xs0)
    else:
        inside = 0
    if inside < (1.0 - nan_frac) * th * tw:
        out[:] = np.nan
    return out


class Tiler(StepABC):
    """Trap-grid or mono-tile tiler with drift tracking."""

    def __init__(self, image, parameters: TilerParameters):
        super().__init__(parameters)
        self.image = image
        self.pixels = image.data
        self.tile_locs: TileLocations | None = None
        self._frames = _FrameCache(self.pixels)

    @classmethod
    def from_image(cls, image, parameters: TilerParameters, **kwargs):
        return cls(image, parameters)

    # -- geometry setup -----------------------------------------------------

    @property
    def shape(self):
        return self.pixels.shape

    @property
    def n_tiles(self) -> int:
        return len(self.tile_locs) if self.tile_locs else 0

    def _ref_frame(self, tp: int) -> np.ndarray:
        return self._frames.get(tp, self.ref_channel)[self.ref_z]

    def get_center(self) -> None:
        """One tile covering the full frame (tile_size=None mono mode)."""
        _, _, _, H, W = self.pixels.shape
        size = (H, W) if self.tile_size is None else (self.tile_size,) * 2
        self.tile_locs = TileLocations.from_tiler_init(
            np.asarray([[H / 2, W / 2]]), size
        )

    def set_areas_of_interest(self, frame: np.ndarray) -> None:
        from aliby_tpu.tile.traps import segment_traps

        try:
            centres = segment_traps(frame, self.tile_size)
            if len(centres) == 0:
                raise RuntimeError("trap detection found nothing")
            H, W = frame.shape
            half = self.tile_size // 2
            inside = (
                (centres[:, 0] >= half)
                & (centres[:, 0] < H - half)
                & (centres[:, 1] >= half)
                & (centres[:, 1] < W - half)
            )
            centres = centres[inside]
            if len(centres) == 0:
                raise RuntimeError("all traps on the edge")
            self.tile_locs = TileLocations.from_tiler_init(
                centres, self.tile_size
            )
        except Exception as e:  # graceful degradation (tiler.py:678-681)
            logger.warning("Trap detection failed (%s); using center tile.", e)
            self.tile_locs = TileLocations.from_tiler_init(
                np.asarray([[frame.shape[0] / 2, frame.shape[1] / 2]]),
                (self.tile_size, self.tile_size),
            )

    # -- drift --------------------------------------------------------------

    def find_drift(self, tp: int) -> np.ndarray:
        # host FFT: one tiny frame pair per (position, tp) — dispatching it
        # to the device would queue behind in-flight fused chunk programs
        # and pay the tunnel round-trip (~0.7 s blocked per call measured)
        prev = self._ref_frame(tp - 1)
        cur = self._ref_frame(tp)
        return phase_cross_correlation_host(prev, cur)

    # -- per-tp run ---------------------------------------------------------

    def _run_tp(self, tp: int, **kwargs) -> dict:
        if self.tile_locs is None:
            frame = self._ref_frame(0)
            if self.tile_size is not None:
                self.set_areas_of_interest(frame)
            else:
                self.get_center()
        elif tp > 0 and self.track_drift:
            self.tile_locs.add_drift(self.find_drift(tp))
        elif tp > 0:
            self.tile_locs.add_drift(np.zeros(2))
        # double-buffer: start loading the next tp's reference channel
        self._frames.prefetch(tp + 1, self.ref_channel)
        return {"drift": self.tile_locs.to_dict(tp), "pixels": self.get_fczyx(tp)}

    # -- data access --------------------------------------------------------

    def get_tp_channel(self, tp: int, channel: int) -> np.ndarray:
        """All tiles for one channel: (F, Z, th, tw) float32."""
        frame = self._frames.get(tp, channel)  # (Z, Y, X)
        tiles = [
            crop_with_median_pad(frame, *self.tile_locs.as_range(i, tp))
            for i in range(len(self.tile_locs))
        ]
        return np.stack(tiles)

    def get_fczyx(self, tp: int) -> np.ndarray:
        """(F, C, Z, th, tw) float32 pixel block for one timepoint."""
        n_channels = self.pixels.shape[1]
        per_channel = [self.get_tp_channel(tp, c) for c in range(n_channels)]
        return np.stack(per_channel, axis=1)


class CropTiler(StepABC):
    """Fixed-grid normalizing tiler for deep embedders."""

    def __init__(self, image, parameters: TilerParameters, **kwargs):
        super().__init__(parameters)
        self.image = image
        self.pixels = image.data
        self.standard_scale = kwargs.get("standard_scale", True)
        self.clip_outliers = kwargs.get("clip_outliers", False)
        self.convert_8bit = kwargs.get("convert_8bit", False)
        self._frames = _FrameCache(self.pixels)

    @classmethod
    def from_image(cls, image, parameters: TilerParameters, **kwargs):
        return cls(image, parameters, **kwargs)

    @staticmethod
    def _clip_outliers(img: np.ndarray, pct: float = 0.5) -> np.ndarray:
        lo, hi = np.percentile(img, [pct, 100 - pct])
        span = max(hi - lo, 1e-12)
        return np.clip((img - lo) / span, 0.0, 1.0)

    @staticmethod
    def _standard_scale(img: np.ndarray) -> np.ndarray:
        """Per-channel zero-mean unit-variance (tiler.py:95-102)."""
        mean = img.mean(axis=(-2, -1), keepdims=True)
        std = img.std(axis=(-2, -1), keepdims=True)
        return (img - mean) / np.maximum(std, 1e-12)

    def tile(self, stack: np.ndarray) -> np.ndarray:
        """(..., Y, X) -> (n_tiles, ..., ts, ts) non-overlapping grid."""
        ts = self.tile_size
        H, W = stack.shape[-2:]
        ny, nx = H // ts, W // ts
        trimmed = stack[..., : ny * ts, : nx * ts]
        lead = trimmed.shape[:-2]
        grid = trimmed.reshape(*lead, ny, ts, nx, ts)
        grid = np.moveaxis(grid, (-4, -2), (0, 1))  # (ny, nx, ..., ts, ts)
        return grid.reshape(ny * nx, *lead, ts, ts)

    def _run_tp(self, tp: int, **kwargs) -> dict:
        frame = np.stack(
            [self._frames.get(tp, c) for c in range(self.pixels.shape[1])]
        ).astype(np.float32)  # (C, Z, Y, X)
        if self.clip_outliers:
            frame = self._clip_outliers(frame)
        if self.convert_8bit:
            frame = (frame * 255).astype(np.uint8).astype(np.float32)
        if self.standard_scale:
            frame = self._standard_scale(frame)
        tiles = self.tile(frame)  # (F, C, Z, ts, ts)
        self._frames.prefetch(tp + 1, 0)
        return {"pixels": tiles}

    def get_fczyx(self, tp: int) -> np.ndarray:
        return self._run_tp(tp)["pixels"]
