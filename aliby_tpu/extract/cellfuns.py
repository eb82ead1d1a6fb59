"""Vectorized ports of the reference's hand-written per-cell metrics.

Reference: ``extraction/core/functions/cell.py:18-303`` (scalar functions
applied one object at a time) and ``functions/trap.py:6-43`` (tile-level
background metrics). Here each metric is computed for all labels of a tile
in one pass; semantics follow the originals, including their quirks
(1-indexed centroid coordinates, rounded axis approximations from chained
distance transforms, NaN for max5px_median on tiny cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aliby_tpu.extract.reductions import (
    counts,
    quantile_from_sorted,
    seg_max,
    seg_min,
    seg_sum,
    sorted_by_label,
    topk_mean_from_sorted,
)
from aliby_tpu.ops.edt import edt_to_other_label, edt_to_seed_same_label


def _nan_absent(v, present):
    return jnp.where(present, v, jnp.nan)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def min_maj_approximation(labels: jnp.ndarray, max_labels: int):
    """Per-label (min_axis, maj_axis) via the reference's cone construction.

    nn  = EDT to outside-the-object         -> min axis = round(max nn)
    dn  = EDT to the plateau argmax(nn)      (same-label seeds)
    cone_top = EDT from plateau to the nearest non-plateau object pixel
    maj axis = round(max dn + sum(cone_top)/2)
    """
    fg = labels > 0
    nn = edt_to_other_label(labels)
    max_nn = seg_max(jnp.where(fg, nn, -jnp.inf), labels, max_labels)
    max_nn_px = jnp.nan_to_num(max_nn)[jnp.clip(labels - 1, 0, max_labels - 1)]
    plateau = fg & (nn >= max_nn_px - 1e-6)
    dn = edt_to_seed_same_label(plateau, labels)
    dn = jnp.where(fg & jnp.isfinite(dn), dn, 0.0)
    non_plateau = fg & ~plateau
    cone_top = edt_to_seed_same_label(non_plateau, labels)
    cone_top = jnp.where(plateau & jnp.isfinite(cone_top), cone_top, 0.0)
    min_ax = jnp.round(jnp.nan_to_num(max_nn, neginf=0.0))
    maj_ax = jnp.round(
        seg_max(jnp.where(fg, dn, -jnp.inf), labels, max_labels).clip(0)
        + seg_sum(cone_top, labels, max_labels) / 2.0
    )
    return min_ax, maj_ax


# -- mask-only metrics ------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_labels",))
def mask_metrics(labels: jnp.ndarray, max_labels: int) -> dict:
    """area, eccentricity, volumes, centroid family — one pass."""
    H, W = labels.shape
    area = counts(labels, max_labels)
    present = area > 0
    safe = jnp.maximum(area, 1.0)
    min_ax, maj_ax = min_maj_approximation(labels, max_labels)
    ecc = jnp.sqrt(jnp.maximum(maj_ax**2 - min_ax**2, 0.0)) / jnp.maximum(maj_ax, 1e-12)
    volume = (4 * jnp.pi * min_ax**2 * maj_ax) / 3
    nn = edt_to_other_label(labels)
    conical = 4 * seg_sum(nn, labels, max_labels)
    r = jnp.sqrt(area / jnp.pi)
    spherical = (4 * jnp.pi * r**3) / 3
    # 1-indexed centroids (reference cell.py:269-284)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 1.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 1.0
    cx = seg_sum(xx, labels, max_labels) / safe
    cy = seg_sum(yy, labels, max_labels) / safe
    out = {
        "area": area,
        "eccentricity": ecc,
        "volume": volume,
        "conical_volume": conical,
        "spherical_volume": spherical,
        "centroid_x": cx,
        "centroid_y": cy,
    }
    return {k: _nan_absent(v, present) for k, v in out.items()}


# -- mask+image metrics -----------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_labels",))
def pixel_metrics(labels: jnp.ndarray, img: jnp.ndarray, max_labels: int) -> dict:
    img = img.astype(jnp.float32)
    area = counts(labels, max_labels)
    present = area > 0
    safe = jnp.maximum(area, 1.0)
    total = seg_sum(img, labels, max_labels)
    mean = total / safe
    total_sq = seg_sum(img**2, labels, max_labels)
    var = jnp.maximum(total_sq / safe - mean**2, 0.0)
    sv, starts, cnt = sorted_by_label(img, labels, max_labels)
    median = quantile_from_sorted(sv, starts, cnt, 0.5)
    max2p5pc = topk_mean_from_sorted(sv, starts, cnt, 0.025)
    # max5px_median: mean of 5 brightest / median; NaN if <=5 px or median 0.
    # Direct gathers of the top-5 run — exact in f32, unlike a global cumsum.
    end = starts + cnt.astype(jnp.int32)
    five_sum = sum(
        sv[jnp.clip(end - k, 0, sv.size - 1)] for k in range(1, 6)
    )
    max5 = five_sum / 5.0
    max5px_median = jnp.where(
        (cnt > 5) & (jnp.abs(median) > 0), max5 / median, jnp.nan
    )
    # moment of inertia (1-indexed, intensity-weighted; cell.py:222-261)
    H, W = labels.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 1.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 1.0
    m00 = total
    safe_m = jnp.where(jnp.abs(m00) > 1e-12, m00, 1.0)
    xm = seg_sum(img * xx, labels, max_labels) / safe_m
    ym = seg_sum(img * yy, labels, max_labels) / safe_m
    xm_px = xm[jnp.clip(labels - 1, 0, max_labels - 1)]
    ym_px = ym[jnp.clip(labels - 1, 0, max_labels - 1)]
    mu20 = seg_sum(img * (xx - xm_px) ** 2, labels, max_labels)
    mu02 = seg_sum(img * (yy - ym_px) ** 2, labels, max_labels)
    # Eta20 + Eta02 with Mu00^(1+(p+q)/2) = Mu00^2 normalization
    moi = (mu20 + mu02) / safe_m**2
    moi = jnp.where(jnp.abs(m00) > 1e-12, moi, jnp.nan)
    out = {
        "mean": mean,
        "total": total,
        "total_squared": total_sq,
        "median": median,
        "max2p5pc": max2p5pc,
        "max5px_median": max5px_median,
        "std": jnp.sqrt(var),
        "moment_of_inertia": moi,
    }
    return {k: _nan_absent(v, present) for k, v in out.items()}


@functools.partial(jax.jit, static_argnames=())
def background_metrics(labels: jnp.ndarray, img: jnp.ndarray) -> dict:
    """Tile-level background stats (reference trap.py): same value per tile."""
    img = img.astype(jnp.float32)
    bg = labels == 0
    flat_bg = bg.reshape(-1)
    flat_v = img.reshape(-1)
    n_bg = flat_bg.sum()
    # median of background: sort with background-first keys
    key = jnp.where(flat_bg, 0, 1).astype(jnp.int32)
    _, sv = jax.lax.sort((key, flat_v), num_keys=2)
    pos = (n_bg - 1).astype(jnp.float32) / 2.0
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    med = sv[jnp.clip(lo, 0, sv.size - 1)] * (1 - frac) + sv[
        jnp.clip(hi, 0, sv.size - 1)
    ] * frac
    top5 = jnp.where(flat_bg, flat_v, -jnp.inf)
    top_vals, _ = jax.lax.top_k(top5, 5)
    bmax5 = jnp.where(n_bg >= 5, top_vals.mean(), jnp.nan)
    return {
        "imBackground": jnp.where(n_bg > 0, med, jnp.nan),
        "background_max5": bmax5,
    }


MASK_METRICS = ("area", "eccentricity", "volume", "conical_volume",
                "spherical_volume", "centroid_x", "centroid_y")
PIXEL_METRICS = ("mean", "total", "total_squared", "median", "max2p5pc",
                 "max5px_median", "std", "moment_of_inertia")
TRAP_METRICS = ("imBackground", "background_max5")
