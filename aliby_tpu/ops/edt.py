"""Euclidean distance transforms via jump flooding (JFA) — log-depth, static.

The reference's volume/axis estimators chain ``scipy.ndimage.
distance_transform_edt`` calls (``extraction/core/functions/cell.py``,
``min_maj_approximation``). On TPU the equivalent is the jump-flooding
algorithm: every pixel carries the coordinates of its best seed so far and,
at strides halving from half the image size down to 1 (plus a JFA+1 cleanup
round), adopts better seeds from 8 neighbors. All gathers, no
data-dependent control flow.

Three validity modes cover the reference's uses:
- ``edt(mask)``: seeds are the False pixels (scipy semantics);
- ``edt_to_other_label(labels)``: per-pixel distance to the nearest pixel of
  a *different* label (background counts) — per-object EDT that stays
  correct when objects touch;
- ``edt_to_seed_same_label(seed_mask, labels)``: distance to the nearest
  same-label seed pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_FAR = jnp.int32(-(2**20))


def _strides(h: int, w: int) -> list[int]:
    # 1+JFA+2: a stride-1 pre-pass, halving strides, then 2,1 cleanup —
    # drives the standard JFA error rate (~0.04% of pixels) to zero on
    # every case in the test-suite grids.
    s = max(h, w) // 2
    out = [1]
    while s >= 1:
        out.append(s)
        s //= 2
    out.extend([2, 1])
    return out


def _jfa(seed_mask: jnp.ndarray, labels: jnp.ndarray | None, mode: str) -> jnp.ndarray:
    """Return squared distance to the nearest *valid* seed per pixel.

    mode: "any" (any seed), "diff" (seed label != pixel label),
    "same" (seed label == pixel label).
    """
    H, W = seed_mask.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sy = jnp.where(seed_mask, yy, _FAR)
    sx = jnp.where(seed_mask, xx, _FAR)

    def dist2(py, px, qy, qx):
        dy = (py - qy).astype(jnp.float32)
        dx = (px - qx).astype(jnp.float32)
        return dy * dy + dx * dx

    def candidate_ok(cand_y, cand_x):
        has = cand_y > _FAR
        if mode == "any" or labels is None:
            return has
        ly = jnp.clip(cand_y, 0, H - 1)
        lx = jnp.clip(cand_x, 0, W - 1)
        seed_lbl = labels[ly, lx]
        if mode == "diff":
            return has & (seed_lbl != labels)
        return has & (seed_lbl == labels)

    def sweep(state, stride):
        # stride is a traced scalar: the whole stride schedule runs through
        # ONE compiled sweep via lax.scan (compile cost matters on the
        # single-core host driving the TPU).
        sy, sx = state
        best = jnp.where(
            candidate_ok(sy, sx), dist2(yy, xx, sy, sx), jnp.inf
        )
        by, bx = sy, sx
        for sdy in (-1, 0, 1):
            for sdx in (-1, 0, 1):
                if sdy == 0 and sdx == 0:
                    continue
                ny = jnp.clip(yy + sdy * stride, 0, H - 1)
                nx = jnp.clip(xx + sdx * stride, 0, W - 1)
                cy = sy[ny, nx]
                cx = sx[ny, nx]
                d = jnp.where(candidate_ok(cy, cx), dist2(yy, xx, cy, cx), jnp.inf)
                take = d < best
                best = jnp.where(take, d, best)
                by = jnp.where(take, cy, by)
                bx = jnp.where(take, cx, bx)
        return (by, bx), None

    stride_seq = jnp.asarray(_strides(H, W), jnp.int32)
    (sy, sx), _ = jax.lax.scan(sweep, (sy, sx), stride_seq)

    final = jnp.where(candidate_ok(sy, sx), dist2(yy, xx, sy, sx), jnp.inf)
    return final


@jax.jit
def nearest_seed(seed_mask: jnp.ndarray):
    """Coordinates (sy, sx) of the nearest seed pixel for every pixel.

    Feeds Voronoi-style region growing (e.g. splitting touching cells from
    EDT peaks, the watershed stand-in in the threshold segmenter).
    """
    H, W = seed_mask.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sy = jnp.where(seed_mask, yy, _FAR)
    sx = jnp.where(seed_mask, xx, _FAR)

    def dist2(qy, qx):
        dy = (yy - qy).astype(jnp.float32)
        dx = (xx - qx).astype(jnp.float32)
        return dy * dy + dx * dx

    def sweep(state, stride):
        sy, sx = state
        best = jnp.where(sy > _FAR, dist2(sy, sx), jnp.inf)
        by, bx = sy, sx
        for sdy in (-1, 0, 1):
            for sdx in (-1, 0, 1):
                if sdy == 0 and sdx == 0:
                    continue
                ny = jnp.clip(yy + sdy * stride, 0, H - 1)
                nx = jnp.clip(xx + sdx * stride, 0, W - 1)
                cy = sy[ny, nx]
                cx = sx[ny, nx]
                d = jnp.where(cy > _FAR, dist2(cy, cx), jnp.inf)
                take = d < best
                best = jnp.where(take, d, best)
                by = jnp.where(take, cy, by)
                bx = jnp.where(take, cx, bx)
        return (by, bx), None

    stride_seq = jnp.asarray(_strides(H, W), jnp.int32)
    (sy, sx), _ = jax.lax.scan(sweep, (sy, sx), stride_seq)
    return sy, sx


@jax.jit
def edt(mask: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.distance_transform_edt: distance of True pixels to the
    nearest False pixel (False pixels -> 0)."""
    d2 = _jfa(~mask, None, "any")
    d = jnp.sqrt(jnp.where(jnp.isfinite(d2), d2, 0.0))
    return jnp.where(mask, d, 0.0)


@jax.jit
def edt_to_other_label(labels: jnp.ndarray) -> jnp.ndarray:
    """Distance from each foreground pixel to the nearest pixel whose label
    differs (background included); background pixels -> 0."""
    fg = labels > 0
    d2 = _jfa(jnp.ones_like(fg), labels, "diff")
    d = jnp.sqrt(jnp.where(jnp.isfinite(d2), d2, 0.0))
    return jnp.where(fg, d, 0.0)


@jax.jit
def edt_to_seed_same_label(seed_mask: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Distance to the nearest same-label seed; pixels with no reachable
    seed get +inf (callers mask)."""
    d2 = _jfa(seed_mask, labels, "same")
    return jnp.sqrt(d2)
