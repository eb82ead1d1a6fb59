"""Segmenter dispatch: one factory, several kinds, uniform closure contract.

Reference surface (``segment/dispatch.py:22-253``): ``dispatch_segmenter
(kind, channel_to_segment, ...)`` returns ``segment(pixels) -> masks`` where
``pixels`` is ``(F, C, Z, Y, X)`` (a leading T of size 1 is dropped) and
``masks`` is a list of per-tile 2-D uint16 label maps.

Kinds:
- ``cellpose`` (default): the in-process Flax U-Net + flow-field mask
  reconstruction — the TPU replacement for the reference's torch
  CellposeModel. Weights from ``pretrained_path`` (flax msgpack) or the
  bundled synthetic-trained checkpoint.
- ``threshold``: Otsu + EDT-peak Voronoi splitting — dependency-free
  baseline, also the trap-pipeline default for bright-field-free fixtures.
- ``nahual_cellpose`` / ``nahual_baby`` / ``nahual_spotiflow``: remote
  model-server clients (``aliby_tpu.net``), kept for off-slice serving
  parity; the on-slice path needs no RPC.
"""

from __future__ import annotations

import functools
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from aliby_tpu.models.flows import masks_from_flows
from aliby_tpu.ops.edt import edt_to_other_label, nearest_seed
from aliby_tpu.ops.imageops import gaussian_blur, otsu_threshold, peak_local_max
from aliby_tpu.ops.labels import connected_components, relabel_sequential

BUNDLED_WEIGHTS = Path(__file__).parent / "weights" / "cellpose_synthetic.msgpack"


def _to_uint16(mask: np.ndarray) -> np.ndarray:
    if mask.max() > np.iinfo(np.uint16).max:
        raise ValueError("Label overflow: >65535 objects in one tile.")
    return mask.astype(np.uint16)


def _drop_leading_time(pixels: np.ndarray) -> np.ndarray:
    if pixels.ndim == 6:
        pixels = pixels[0]
    return pixels


# ---------------------------------------------------------------------------
# threshold segmenter
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("min_distance", "max_labels", "min_size", "threshold_scale"))
def _threshold_segment_2d(
    img: jnp.ndarray,
    min_distance: int = 8,
    max_labels: int = 256,
    min_size: int = 20,
    threshold_scale: float = 1.0,
) -> jnp.ndarray:
    smoothed = gaussian_blur(img.astype(jnp.float32), 1.5)
    # scale lets soft-edged objects keep their skirts (otsu cuts at the
    # mid-profile on smooth blobs)
    thr = otsu_threshold(smoothed) * threshold_scale
    mask = smoothed > thr
    dist = edt_to_other_label(mask.astype(jnp.int32))
    coords, valid = peak_local_max(
        dist, min_distance=min_distance, threshold=1.0, max_peaks=max_labels
    )
    seed_map = jnp.zeros(img.shape, bool)
    seed_map = seed_map.at[coords[:, 0], coords[:, 1]].set(valid)
    sy, sx = nearest_seed(seed_map)
    H, W = img.shape
    seed_ids = jnp.cumsum(seed_map.reshape(-1)).reshape(H, W)  # 1..n at seeds
    lbl = seed_ids[jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1)]
    labels = jnp.where(mask & (sy > -(2**20)), lbl, 0).astype(jnp.int32)
    # fall back to plain CC where no seeds (tiny blobs)
    cc = connected_components(mask & (labels == 0))
    cc_shift = jnp.where(cc > 0, cc + labels.max(), 0)
    labels = jnp.where(labels > 0, labels, cc_shift)
    labels, _ = relabel_sequential(labels, max_labels)
    from aliby_tpu.ops.labels import segment_sum

    areas = segment_sum(jnp.ones(H * W, jnp.float32), labels, max_labels)
    keep = areas >= min_size
    keep_px = keep[jnp.clip(labels - 1, 0, max_labels - 1)] & (labels > 0)
    labels = jnp.where(keep_px, labels, 0)
    labels, _ = relabel_sequential(labels, max_labels)
    return labels


def _make_threshold_segmenter(channel_to_segment: int = 0, **kwargs):
    seg_kwargs = {
        k: kwargs[k]
        for k in ("min_distance", "max_labels", "min_size", "threshold_scale")
        if k in kwargs
    }

    def segment(pixels, **_ignored):
        pixels = _drop_leading_time(np.asarray(pixels))
        imgs = pixels[:, channel_to_segment]  # (F, Z, Y, X)
        imgs = imgs.max(axis=1) if imgs.shape[1] > 1 else imgs[:, 0]
        batched = jax.vmap(lambda im: _threshold_segment_2d(im, **seg_kwargs))(
            jnp.asarray(imgs)
        )
        return [_to_uint16(np.asarray(m)) for m in batched]

    return segment


# ---------------------------------------------------------------------------
# cellpose-TPU segmenter
# ---------------------------------------------------------------------------


def _normalize_percentile(img: jnp.ndarray) -> jnp.ndarray:
    # float-exact vs jnp.percentile(img, 1/99) but sort-free: the batched
    # 65k-element lax.sort per (image, channel) cost 32 ms per fused
    # 16-image batch on v5e; bit-bisection selection runs in ~1 ms
    # (ops.imageops.order_statistics; exactness pinned by
    # tests/test_ops_imageops.py::test_order_statistics_exact_vs_sort)
    from aliby_tpu.ops.imageops import percentile_pair

    lo, hi = percentile_pair(img, 1.0, 99.0)
    return (img - lo) / jnp.maximum(hi - lo, 1e-6)


def _pad_to_multiple(img: np.ndarray, m: int = 8):
    H, W = img.shape[-2:]
    ph = (-H) % m
    pw = (-W) % m
    if ph or pw:
        pad = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
        img = np.pad(img, pad, mode="reflect")
    return img, (H, W)


class CellposeTPU:
    """Jitted forward + flow dynamics with weight management."""

    def __init__(
        self,
        pretrained_path: str | Path | None = None,
        model_kwargs: dict | None = None,
        cellprob_threshold: float = 0.0,
        flow_iters: int | None = None,
        max_labels: int = 256,
        min_size: int = 15,
        flow_threshold: float | None = 0.4,
        fill_holes: bool = True,
    ):
        # flow_threshold mirrors cellpose's flow-error QC (the reference's
        # model.eval default 0.4). The bundled weights are trained against
        # the same median-center flow convention QC recomputes, so the
        # default is on; pass None to disable.
        model_kwargs = dict(model_kwargs or {})
        arch = model_kwargs.pop("arch", None)
        is_torch_ckpt = pretrained_path is not None and (
            arch == "cpnet"
            or str(pretrained_path).endswith((".pt", ".pth"))
            or "torch" in Path(pretrained_path).name
        )
        if is_torch_ckpt:
            # real pretrained Cellpose: faithful CPnet graph + ported weights
            from aliby_tpu.models.cpnet import load_cellpose_checkpoint

            self.model, params = load_cellpose_checkpoint(
                pretrained_path, **model_kwargs
            )
        else:
            from aliby_tpu.models.unet import init_params

            self.model, params = init_params(
                jax.random.PRNGKey(0), in_channels=2, **model_kwargs
            )
            path = pretrained_path or (
                BUNDLED_WEIGHTS if BUNDLED_WEIGHTS.exists() else None
            )
            if path is not None:
                from aliby_tpu.models.training import load_params

                params = load_params(path, params)
            else:
                warnings.warn(
                    "CellposeTPU running with untrained weights; pass "
                    "pretrained_path or bundle weights for real masks."
                )
        if flow_iters is None:
            # 2 Euler steps (+2^8 pointer-doubled successor steps) is
            # validated against the bundled/flax training pipeline (masks
            # unchanged vs 8 on held-out renders); ported torch Cellpose
            # checkpoints keep the conservative 8 — their flow statistics
            # were never validated at the shorter schedule.
            flow_iters = 8 if is_torch_ckpt else 2
        self.params = params
        self.cellprob_threshold = cellprob_threshold
        self.flow_iters = flow_iters
        self.max_labels = max_labels
        self.min_size = min_size
        self.flow_threshold = flow_threshold
        self.fill_holes = fill_holes

        model = self.model
        cpt = float(cellprob_threshold)
        fi, ml, ms = int(flow_iters), int(max_labels), int(min_size)
        ft = None if flow_threshold is None else float(flow_threshold)
        fh = bool(fill_holes)

        @jax.jit
        def _segment_all(params, images):
            """ONE executable: normalize + forward + flow reconstruction.

            (F, 2, H, W) raw float -> (F, H, W) int32 labels. A single
            dispatch/readback per segmentation call (the split
            normalize/forward/reconstruct version paid three round trips
            and ran the normalize vmap eagerly op-by-op).
            """
            x = images.transpose(0, 2, 3, 1)  # NHWC
            x = jax.vmap(
                lambda im: jax.vmap(
                    _normalize_percentile, in_axes=-1, out_axes=-1
                )(im)
            )(x)
            pred = model.apply(params, x)
            if isinstance(pred, tuple):  # CPnetFlax returns (out, style)
                pred = pred[0]

            def one(p):
                flows = jnp.stack([p[..., 0], p[..., 1]]) / 5.0
                return masks_from_flows(
                    flows,
                    p[..., 2],
                    cellprob_threshold=cpt,
                    n_iter=fi,
                    max_labels=ml,
                    min_size=ms,
                    flow_threshold=ft,
                    fill_holes=fh,
                )

            return jax.vmap(one)(pred)

        self._segment_all = _segment_all

    def segment_tiles(self, images: np.ndarray) -> list[np.ndarray]:
        """(F, 2, Y, X) float -> list of (Y, X) uint16 label maps."""
        padded, (H, W) = _pad_to_multiple(images)
        labels = self._segment_all(self.params, jnp.asarray(padded))
        out = np.asarray(labels)[:, :H, :W]
        return [_to_uint16(m) for m in out]


_ENGINE_CACHE: dict[tuple, CellposeTPU] = {}


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _get_engine(**kw) -> CellposeTPU:
    """Engine instances are immutable after init (params + jitted program),
    so identical configurations share ONE instance. Besides memory, this
    lets the fused whole-step program (``engine.fused``) batch every object
    that uses the same engine through a single segmentation call — the
    dynamics stages are sequential small kernels, so halving their count
    roughly halves their wall-clock."""
    key = _freeze(
        {**kw, "pretrained_path": str(kw.get("pretrained_path"))}
    )
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = CellposeTPU(**kw)
    return _ENGINE_CACHE[key]


def _make_cellpose_segmenter(
    channel_to_segment: int = 0,
    second_channel: int | None = None,
    three_d: bool = False,
    stitch_threshold: float = 0.01,
    **kwargs,
):
    engine = _get_engine(
        pretrained_path=kwargs.get("pretrained_path"),
        model_kwargs=kwargs.get("model_kwargs"),
        cellprob_threshold=kwargs.get("cellprob_threshold", 0.0),
        flow_iters=kwargs.get("flow_iters"),  # None -> per-checkpoint auto
        max_labels=kwargs.get("max_labels", 256),
        min_size=kwargs.get("min_size", 15),
        flow_threshold=kwargs.get("flow_threshold", 0.4),
        fill_holes=kwargs.get("fill_holes", True),
    )

    def _channel(pixels, channel):
        sel = pixels[:, channel]  # (F, Z, Y, X)
        return sel, (sel.max(axis=1) if sel.shape[1] > 1 else sel[:, 0])

    def segment(pixels, **_ignored):
        pixels = _drop_leading_time(np.asarray(pixels)).astype(np.float32)
        main_z, main = _channel(pixels, channel_to_segment)
        if second_channel is not None:
            sec_z, sec = _channel(pixels, second_channel)
        else:
            sec_z, sec = np.zeros_like(main_z), np.zeros_like(main)
        del _ignored
        if three_d and main_z.shape[1] > 1:
            # Reference 3-D semantics (segment/dispatch.py:214-247): segment
            # each z plane, IoU-stitch labels across z (threshold 0.01),
            # then max-project to one 2-D label map + relabel.
            import jax.numpy as jnp

            from aliby_tpu.ops.labels import relabel_sequential
            from aliby_tpu.track.trackers import stitch_sequence

            out = []
            F, Z = main_z.shape[:2]
            for f in range(F):
                planes = np.stack([main_z[f], sec_z[f]], axis=1)  # (Z, 2, Y, X)
                z_masks = engine.segment_tiles(planes)
                stitched = np.asarray(
                    stitch_sequence(
                        jnp.asarray(np.stack(z_masks).astype(np.int32)),
                        max_labels=engine.max_labels,
                        iou_threshold=stitch_threshold,
                    )
                )
                flat = stitched.max(axis=0)
                relab, _ = relabel_sequential(
                    jnp.asarray(flat), engine.max_labels
                )
                out.append(_to_uint16(np.asarray(relab)))
            return out
        images = np.stack([main, sec], axis=1)  # (F, 2, Y, X)
        return engine.segment_tiles(images)

    segment.engine = engine
    return segment


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def dispatch_segmenter(
    kind: str = "cellpose", channel_to_segment: int = 0, **kwargs
):
    if kind in ("cellpose", "cellpose_tpu"):
        return _make_cellpose_segmenter(channel_to_segment, **kwargs)
    if kind == "threshold":
        return _make_threshold_segmenter(channel_to_segment, **kwargs)
    if kind == "baby":
        from aliby_tpu.models.baby import make_baby_segmenter

        return make_baby_segmenter(channel_to_segment, **kwargs)
    if kind in ("spots", "spotiflow"):
        from aliby_tpu.models.spots import make_spot_segmenter

        return make_spot_segmenter(channel_to_segment, **kwargs)
    if kind.startswith("nahual"):
        from aliby_tpu.net.client import make_remote_segmenter

        return make_remote_segmenter(
            kind, channel_to_segment=channel_to_segment, **kwargs
        )
    raise ValueError(f"Unknown segmenter kind {kind!r}")
