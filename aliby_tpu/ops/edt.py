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

    Performance-critical formulation: the stride schedule is unrolled at
    trace time so every neighbor read is a STATIC shift — with a traced
    stride (the old ``lax.scan`` over strides), each read ``sy[ny, nx]``
    lowers to a full (H, W) dynamic gather, which serializes on the TPU
    (667 ms for an 8-image 256^2 batch; static shifts run it in ~15 ms).
    The carried state (seed y, seed x, and — for label-aware modes — the
    seed's LABEL, so validity never indexes ``labels`` at data-dependent
    positions) is stacked into one (C, H, W) block edge-padded ONCE per
    sweep; the 8 neighbor reads are then plain slices. One pad per sweep
    keeps the unrolled graph small enough for the CPU backend's compile
    passes (a pad per neighbor made XLA:CPU compile times pathological).
    """
    H, W = seed_mask.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sy = jnp.where(seed_mask, yy, _FAR)
    sx = jnp.where(seed_mask, xx, _FAR)
    with_labels = mode != "any" and labels is not None
    if with_labels:
        state = jnp.stack([sy, sx, jnp.where(seed_mask, labels, 0)])
    else:
        state = jnp.stack([sy, sx])

    def dist2(qy, qx):
        dy = (yy - qy).astype(jnp.float32)
        dx = (xx - qx).astype(jnp.float32)
        return dy * dy + dx * dx

    def candidate_ok(cand):
        has = cand[0] > _FAR
        if not with_labels:
            return has
        if mode == "diff":
            return has & (cand[2] != labels)
        return has & (cand[2] == labels)

    for stride in _strides(H, W):
        padded = jnp.pad(
            state, ((0, 0), (stride, stride), (stride, stride)), mode="edge"
        )
        best = jnp.where(candidate_ok(state), dist2(state[0], state[1]), jnp.inf)
        new_state = state
        for sdy in (-1, 0, 1):
            for sdx in (-1, 0, 1):
                if sdy == 0 and sdx == 0:
                    continue
                y0 = stride + sdy * stride
                x0 = stride + sdx * stride
                cand = padded[:, y0 : y0 + H, x0 : x0 + W]
                d = jnp.where(candidate_ok(cand), dist2(cand[0], cand[1]), jnp.inf)
                take = d < best
                best = jnp.where(take, d, best)
                new_state = jnp.where(take[None], cand, new_state)
        state = new_state

    return jnp.where(candidate_ok(state), dist2(state[0], state[1]), jnp.inf)


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

    state = jnp.stack([sy, sx])
    for stride in _strides(H, W):
        padded = jnp.pad(
            state, ((0, 0), (stride, stride), (stride, stride)), mode="edge"
        )
        best = jnp.where(state[0] > _FAR, dist2(state[0], state[1]), jnp.inf)
        new_state = state
        for sdy in (-1, 0, 1):
            for sdx in (-1, 0, 1):
                if sdy == 0 and sdx == 0:
                    continue
                y0 = stride + sdy * stride
                x0 = stride + sdx * stride
                cand = padded[:, y0 : y0 + H, x0 : x0 + W]
                d = jnp.where(cand[0] > _FAR, dist2(cand[0], cand[1]), jnp.inf)
                take = d < best
                best = jnp.where(take, d, best)
                new_state = jnp.where(take[None], cand, new_state)
        state = new_state
    return state[0], state[1]


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
