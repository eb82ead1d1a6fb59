"""Puncta (spot) detection — the in-process spotiflow equivalent.

The reference ships frames to a remote spotiflow server
(``segment/dispatch.py:105-171``) and returns per-frame labeled spot masks
with strict shape contracts (``(N, 1, Y, X)`` in, ``(N, Y, X)`` int32 out,
leading N=1 squeezed so downstream cp_measure indexing sees 2-D masks).

In-process version: scale-normalized Laplacian-of-Gaussian maxima across a
small sigma sweep (the classic blob detector), each detection painted as a
disk labeled 1..n — all jitted, batched over frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aliby_tpu.ops.imageops import gaussian_blur, peak_local_max


@functools.partial(
    jax.jit, static_argnames=("sigmas", "max_spots", "min_distance")
)
def detect_spots(
    img: jnp.ndarray,
    sigmas: tuple[float, ...] = (1.5, 2.5, 3.5),
    threshold_rel: float = 0.2,
    min_distance: int = 3,
    max_spots: int = 512,
):
    """(Y, X) image -> (coords (max_spots, 2), radii, valid)."""
    img = img.astype(jnp.float32)
    img = (img - img.mean()) / jnp.maximum(img.std(), 1e-6)

    def shift(a, dy, dx):
        # edge-replicating shift (roll would wrap and fabricate border blobs)
        p = jnp.pad(a, 1, mode="edge")
        return p[1 + dy : a.shape[0] + 1 + dy, 1 + dx : a.shape[1] + 1 + dx]

    logs = []
    for s in sigmas:
        g = gaussian_blur(img, s)
        # scale-normalized negative Laplacian (bright blobs -> positive)
        lap = (
            -4 * g
            + shift(g, 1, 0) + shift(g, -1, 0)
            + shift(g, 0, 1) + shift(g, 0, -1)
        )
        logs.append(-lap * s**2)
    scale_stack = jnp.stack(logs)  # (S, Y, X)
    best = scale_stack.max(0)
    best_scale = jnp.argmax(scale_stack, 0)
    # exclude a blur-support margin: border responses are pad artifacts
    margin = int(max(sigmas)) + 1
    H, W = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (yy >= margin) & (yy < H - margin) & (xx >= margin) & (xx < W - margin)
    )
    best = jnp.where(interior, best, -jnp.inf)
    thr = threshold_rel * best.max()
    coords, valid = peak_local_max(
        best, min_distance=min_distance, threshold=thr, max_peaks=max_spots
    )
    radii = jnp.asarray(sigmas)[
        best_scale[coords[:, 0], coords[:, 1]]
    ] * jnp.sqrt(2.0)
    return coords, radii, valid


@functools.partial(jax.jit, static_argnames=("max_spots",))
def paint_spots(shape_ref: jnp.ndarray, coords, radii, valid, max_spots: int = 512):
    """Labeled disk mask from detections (spot i -> label i+1)."""
    H, W = shape_ref.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    labels = jnp.zeros((H, W), jnp.int32)

    def body(i, labels):
        cy = coords[i, 0].astype(jnp.float32)
        cx = coords[i, 1].astype(jnp.float32)
        r = radii[i]
        inside = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r**2) & valid[i]
        return jnp.where(inside & (labels == 0), i + 1, labels)

    return jax.lax.fori_loop(0, max_spots, body, labels)


def make_spot_segmenter(channel_to_segment: int = 0, **kwargs):
    """Closure with the spotiflow shape contract: list of 2-D int masks."""
    det_kwargs = {
        k: kwargs[k]
        for k in ("sigmas", "threshold_rel", "min_distance", "max_spots")
        if k in kwargs
    }

    def segment(pixels, **_ignored):
        pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 6:
            pixels = pixels[0]
        sel = pixels[:, channel_to_segment]
        sel = sel.max(axis=1) if sel.shape[1] > 1 else sel[:, 0]
        out = []
        for frame in sel:
            coords, radii, valid = detect_spots(jnp.asarray(frame), **det_kwargs)
            labels = paint_spots(
                jnp.asarray(frame), coords, radii, valid,
                max_spots=det_kwargs.get("max_spots", 512),
            )
            out.append(np.asarray(labels).astype(np.uint16))
        return out

    return segment
