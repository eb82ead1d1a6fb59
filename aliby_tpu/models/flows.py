"""Flow-field dynamics: GT synthesis, Euler integration, mask reconstruction.

The reference delegates all of this to Cellpose's C/torch internals. Here it
is jit-native:

- ``masks_to_flows``: training targets by heat diffusion from each object's
  center (same-label masked neighborhood averaging, fixed iterations) —
  flows are the normalized gradient of the log-heat, cellpose's definition.
- ``follow_flows``: fixed-iteration Euler integration of predicted flows
  with bilinear sampling, as a ``lax.scan`` (no data-dependent trip counts).
- ``masks_from_flows``: pixels that converged to the same sink become one
  object — sink histogram, seed dilation, connected components on the seed
  map (hybrid local-sweep + hook/jump CC), per-pixel basin lookup,
  small-object removal, sort-free dense relabeling. Replaces cellpose's
  ``get_masks`` + QC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aliby_tpu.ops.labels import connected_components_hybrid, relabel_dense


def _same_label_shift(arr, labels, dy, dx, fill=0.0):
    H, W = arr.shape
    a_pad = jnp.pad(arr, 1, constant_values=fill)
    l_pad = jnp.pad(labels, 1, constant_values=-1)
    sh = a_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
    sl = l_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
    return jnp.where(sl == labels, sh, jnp.nan)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def masks_to_flows(labels: jnp.ndarray, n_iter: int = 96) -> jnp.ndarray:
    """(H, W) labels -> (2, H, W) unit flow field pointing at object centers."""
    H, W = labels.shape
    fg = labels > 0
    from aliby_tpu.ops.edt import edt_to_other_label

    # Center = in-label pixel maximizing interior distance (ties -> first).
    nn = edt_to_other_label(labels)
    flat_l = labels.reshape(-1)
    flat_nn = nn.reshape(-1)
    pos = jnp.arange(H * W, dtype=jnp.float32)
    packed = flat_nn * (H * W) - pos  # prefer deeper, then earlier pixels
    max_labels = 512
    best = jnp.full(max_labels + 1, -jnp.inf).at[
        jnp.clip(flat_l, 0, max_labels)
    ].max(jnp.where(flat_l > 0, packed, -jnp.inf))
    best_px = best[jnp.clip(flat_l, 0, max_labels)]
    is_center = (packed == best_px) & (flat_l > 0)
    center_map = is_center.reshape(H, W)

    source = center_map.astype(jnp.float32)

    def body(_, T):
        T = T + source
        acc = T
        cnt = jnp.ones_like(T)
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = _same_label_shift(T, labels, dy, dx)
            ok = ~jnp.isnan(nb)
            acc = acc + jnp.where(ok, nb, 0.0)
            cnt = cnt + ok
        return jnp.where(fg, acc / cnt, 0.0)

    T = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((H, W), jnp.float32))
    logT = jnp.log1p(T)

    def grad_axis(dy, dx):
        plus = _same_label_shift(logT, labels, dy, dx)
        minus = _same_label_shift(logT, labels, -dy, -dx)
        plus = jnp.where(jnp.isnan(plus), logT, plus)
        minus = jnp.where(jnp.isnan(minus), logT, minus)
        return (plus - minus) / 2.0

    gy = grad_axis(1, 0)
    gx = grad_axis(0, 1)
    mag = jnp.sqrt(gy**2 + gx**2)
    gy = jnp.where(fg, gy / jnp.maximum(mag, 1e-6), 0.0)
    gx = jnp.where(fg, gx / jnp.maximum(mag, 1e-6), 0.0)
    return jnp.stack([gy, gx])


@jax.jit
def _bilinear(field: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample (C, H, W) field at float positions; clamped borders."""
    C, H, W = field.shape
    py = jnp.clip(py, 0.0, H - 1.0)
    px = jnp.clip(px, 0.0, W - 1.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = py - y0
    fx = px - x0
    v00 = field[:, y0, x0]
    v01 = field[:, y0, x1]
    v10 = field[:, y1, x0]
    v11 = field[:, y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


@functools.partial(jax.jit, static_argnames=("n_iter", "n_doubling"))
def follow_flows(
    flows: jnp.ndarray,
    fg: jnp.ndarray,
    n_iter: int = 2,
    n_doubling: int = 8,
) -> jnp.ndarray:
    """Integrate pixels along (2, H, W) flows; returns final (2, H, W) positions.

    Hybrid scheme replacing cellpose's 200 Euler steps: a few bilinear Euler
    steps smooth the approach, then the *successor map* (each pixel's
    rounded one-step destination) is pointer-doubled — ``n_doubling``
    squarings compose up to ``2**n_doubling`` further steps with one integer
    gather each, ~40x fewer gather ops for the same basin convergence.
    """
    _, H, W = flows.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)

    def step(carry, _):
        py, px = carry
        v = _bilinear(flows, py, px)
        return (py + v[0], px + v[1]), None

    (py, px), _ = jax.lax.scan(step, (yy, xx), None, length=n_iter)

    if n_doubling > 0:
        # successor of each *grid pixel*: one rounded flow step
        sy = jnp.clip(jnp.round(yy + flows[0].reshape(-1)), 0, H - 1)
        sx = jnp.clip(jnp.round(xx + flows[1].reshape(-1)), 0, W - 1)
        succ = (sy * W + sx).astype(jnp.int32)

        def double(_, s):
            return s[s]

        succ = jax.lax.fori_loop(0, n_doubling, double, succ)
        # chase the composed successor map from the Euler end-points
        start = (
            jnp.clip(jnp.round(py), 0, H - 1) * W
            + jnp.clip(jnp.round(px), 0, W - 1)
        ).astype(jnp.int32)
        final = succ[start]
        py = (final // W).astype(jnp.float32)
        px = (final % W).astype(jnp.float32)

    py = jnp.where(fg.reshape(-1), py, yy)
    px = jnp.where(fg.reshape(-1), px, xx)
    return jnp.stack([py.reshape(H, W), px.reshape(H, W)])


@functools.partial(
    jax.jit, static_argnames=("max_labels", "min_size", "seed_threshold")
)
def masks_from_sinks(
    final_pos: jnp.ndarray,
    fg: jnp.ndarray,
    max_labels: int = 256,
    min_size: int = 15,
    seed_threshold: float = 2.0,
) -> jnp.ndarray:
    """Cluster converged pixel positions into labeled masks."""
    H, W = fg.shape
    sy = jnp.clip(jnp.round(final_pos[0]).astype(jnp.int32), 0, H - 1)
    sx = jnp.clip(jnp.round(final_pos[1]).astype(jnp.int32), 0, W - 1)
    sink = sy * W + sx
    hist = jnp.zeros(H * W, jnp.float32).at[
        jnp.where(fg.reshape(-1), sink.reshape(-1), 0)
    ].add(jnp.where(fg.reshape(-1), 1.0, 0.0)).reshape(H, W)
    # Seeds: dense sink bins, dilated to merge near-coincident basins.
    seed = hist > seed_threshold
    from aliby_tpu.ops.imageops import binary_dilation

    seed = binary_dilation(seed, 2, connectivity=2)
    # Hybrid CC: gather-free local sweep for the (typical, small) seed
    # blobs + 3 hook+jump rounds so large sink clusters (no-second-channel
    # flows spread 20+ px) still label exactly. ~half the pure hook+jump
    # cost per batch.
    cc = connected_components_hybrid(seed, connectivity=2)
    basin = cc.reshape(-1)[jnp.clip(sink.reshape(-1), 0, H * W - 1)]
    raw = jnp.where(fg.reshape(-1), basin, 0)  # component ids in [0, HW]
    # Small-object removal on the UNBOUNDED component ids (one HW-binned
    # scatter), then ONE sort-free dense relabel — the former
    # relabel->filter->relabel chain paid two 64k unique-sorts (~78 ms each
    # per 8-FOV batch); same ascending-original final labels.
    areas = jnp.zeros(H * W + 1, jnp.float32).at[raw].add(1.0)
    keep_px = (areas[raw] >= min_size) & (raw > 0)
    labels = jnp.where(keep_px, raw, 0).reshape(H, W)
    return relabel_dense(labels, H * W + 1, max_labels)


@functools.partial(
    jax.jit, static_argnames=("n_iter", "max_labels", "min_size")
)
def masks_from_flows(
    flows: jnp.ndarray,
    cellprob: jnp.ndarray,
    cellprob_threshold: float = 0.0,
    n_iter: int = 2,
    max_labels: int = 256,
    min_size: int = 15,
) -> jnp.ndarray:
    """(2,H,W) flows + (H,W) cell logit -> (H,W) int32 label masks."""
    fg = cellprob > cellprob_threshold
    final = follow_flows(flows, fg, n_iter=n_iter)
    return masks_from_sinks(final, fg, max_labels=max_labels, min_size=min_size)
