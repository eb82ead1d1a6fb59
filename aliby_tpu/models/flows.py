"""Flow-field dynamics: GT synthesis, Euler integration, mask reconstruction.

The reference delegates all of this to Cellpose's C/torch internals. Here it
is jit-native:

- ``masks_to_flows``: training targets by heat diffusion from each object's
  center (same-label masked neighborhood averaging, fixed iterations) —
  flows are the normalized gradient of the log-heat, cellpose's definition.
- ``follow_flows``: fixed-iteration Euler integration of predicted flows
  with bilinear sampling, reformulated gather-free (stencil selects +
  successor-key propagation; see its docstring).
- ``masks_from_flows``: pixels that converged to the same sink become one
  object — the published cellpose ``compute_masks`` stage order (histogram
  local-max seeds, 5-round corridor expansion, megamask removal, optional
  flow-error QC, hole filling + min-size removal), reformulated as
  sort-free/gather-light lexicographic key propagation. Gated against the
  independent NumPy oracle in ``tests/oracle_dynamics.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aliby_tpu.ops.labels import relabel_dense


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _bcast(x, axis_size, batched):
    return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@functools.lru_cache(maxsize=None)
def _propagate_keys(n_prop: int, block: int):
    """Successor-map key propagation with a custom vmap rule.

    Unbatched (and the CPU test suite): the blocked-early-exit XLA stencil
    loop below. Batched on TPU: the VMEM-resident Pallas kernel
    (``ops.pallas_stencil.successor_prop``) — one kernel holds the key in
    VMEM for all ``n_prop`` rounds instead of round-tripping HBM per
    round. Both compute exactly key_{n_prop} (the early exit is exact:
    a fixed point of a block of rounds stays fixed)."""

    def _xla(dcode, key):
        H, W = key.shape

        def shift_i(T, dy, dx):
            p = jnp.pad(T, 1, constant_values=0)
            return p[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]

        def body(_, key):
            new = key
            k = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        k += 1
                        continue
                    new = jnp.where(dcode == k, shift_i(key, dy, dx), new)
                    k += 1
            return new

        for _ in range(n_prop % block):
            key = body(0, key)

        def blk_cond(state):
            t, _, changed = state
            return changed & (t < n_prop // block)

        def blk_body(state):
            t, key, _ = state
            new = jax.lax.fori_loop(0, block, body, key)
            return t + 1, new, jnp.any(new != key)

        _, key, _ = jax.lax.while_loop(
            blk_cond, blk_body, (jnp.int32(0), key, jnp.bool_(True))
        )
        return key

    @jax.custom_batching.custom_vmap
    def f(dcode, key):
        return _xla(dcode, key)

    @f.def_vmap
    def _rule(axis_size, in_batched, dcode, key):
        dcode = _bcast(dcode, axis_size, in_batched[0])
        key = _bcast(key, axis_size, in_batched[1])
        if _on_tpu():
            from aliby_tpu.ops.pallas_stencil import successor_prop

            out = successor_prop(dcode, key, n_prop=n_prop, block=block)
        else:
            out = jax.vmap(_xla)(dcode, key)
        return out, True

    return f


@functools.lru_cache(maxsize=None)
def _diffuse(n_iter: int):
    """Masked 3x3 heat diffusion with a custom vmap rule (same split:
    XLA loop unbatched/CPU, ``ops.pallas_stencil.diffuse_heat`` batched on
    TPU). Returns the heat field T after ``n_iter`` rounds of cellpose's
    center-source diffusion with absorbing same-label boundaries."""

    def _xla(labels, source):
        H, W = labels.shape
        fg = labels > 0
        offsets = [
            (dy, dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)
        ]
        l_pad = jnp.pad(labels, 1, constant_values=-1)
        same = [
            (
                l_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx] == labels
            ).astype(jnp.float32)
            for dy, dx in offsets
        ]

        def _shift(T, dy, dx):
            t_pad = jnp.pad(T, 1)
            return t_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]

        def body(_, T):
            T = T + source
            acc = T
            for (dy, dx), m in zip(offsets, same):
                acc = acc + _shift(T, dy, dx) * m
            return jnp.where(fg, acc / 9.0, 0.0)

        return jax.lax.fori_loop(0, n_iter, body, jnp.zeros((H, W), jnp.float32))

    @jax.custom_batching.custom_vmap
    def f(labels, source):
        return _xla(labels, source)

    @f.def_vmap
    def _rule(axis_size, in_batched, labels, source):
        labels = _bcast(labels, axis_size, in_batched[0])
        source = _bcast(source, axis_size, in_batched[1])
        if _on_tpu():
            from aliby_tpu.ops.pallas_stencil import diffuse_heat

            out = diffuse_heat(labels, source, n_iter=n_iter)
        else:
            out = jax.vmap(_xla)(labels, source)
        return out, True

    return f


@functools.partial(jax.jit, static_argnames=("n_iter", "max_labels"))
def label_median_centers(
    labels: jnp.ndarray, max_labels: int = 512, n_iter: int = 0
) -> jnp.ndarray:
    """(H, W) labels -> (H, W) bool map of each object's center pixel.

    Published cellpose center definition: the object pixel closest to the
    per-object coordinate median (``np.median(y), np.median(x)`` snapped to
    the nearest in-object pixel; ties -> first in raster order). Medians
    come from per-label coordinate histograms (integer coordinates), not a
    sort: fused one-hot row/column count reductions, cumsum, midpoint
    lookup.
    """
    del n_iter
    H, W = labels.shape
    flat_l = jnp.clip(labels.reshape(-1), 0, max_labels)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    fgf = (labels > 0).reshape(-1)

    def coord_median(axis, size):
        # coordinate histogram WITHOUT a scatter: hist[l, v] = count of
        # label-l pixels in row/column v = a one-hot compare reduced over
        # the other axis. XLA fuses the broadcast-compare into the
        # reduction (the (H, W, L) one-hot never hits HBM), so this reads
        # the labels once — the two 1M-element scatter-adds it replaces
        # cost ~10-15 ms each on v5e and dominated masks_to_flows.
        ids = jnp.arange(max_labels + 1, dtype=labels.dtype)
        lc = jnp.clip(labels, 0, max_labels)
        oh = (lc[..., None] == ids) & (labels > 0)[..., None]
        hist = oh.sum(axis=1 - axis, dtype=jnp.int32)  # (size, L+1)
        cum = jnp.cumsum(hist, axis=0).T  # (L+1, size)
        n = cum[:, -1]
        # np.median: average of the ceil(n/2)-th and floor(n/2)+1-th order
        # statistics (1-indexed) for even n; the middle one for odd n.
        k_lo = (n + 1) // 2
        k_hi = n // 2 + 1
        lo = jnp.argmax(cum >= k_lo[:, None], axis=1)
        hi = jnp.argmax(cum >= k_hi[:, None], axis=1)
        return (lo + hi).astype(jnp.int32)  # (L+1,) 2*median, exact int

    # Snap to the nearest in-object pixel (ties -> first in raster order)
    # with ONE 1M-element op total (a packed scatter-min; the coordinate
    # histograms above are scatter-free) instead of the naive
    # 4-scatter/4-gather chain — scatters and gathers at HW elements cost
    # ~10-15 ms each on v5e, everything else here is noise:
    # - the two medians ride one int32 table lookup (2*ymed << 16 | 2*xmed);
    # - the per-label argmin rides ONE scatter-min of (d2 << 16 | pos),
    #   d2 capped at 2^15-1 (quarter-px-exact out to ~90 px from the
    #   median; a farther pixel can win only if NO pixel is nearer, where
    #   any deterministic in-object choice serves as the center);
    # - centers paint back with an L-sized scatter, not an HW gather.
    ymed2 = coord_median(0, H)
    xmed2 = coord_median(1, W)
    pos = jnp.arange(H * W, dtype=jnp.int32)
    i32max = jnp.iinfo(jnp.int32).max
    if H * W <= (1 << 16) and H <= (1 << 15) and W <= (1 << 15):
        # Packed one-scatter fast path (pos fits 16 bits).
        med_packed = (ymed2 << 16) | xmed2
        mp = med_packed[flat_l]
        dy = 2 * yy.reshape(-1) - (mp >> 16)
        dx = 2 * xx.reshape(-1) - (mp & 0xFFFF)
        # cap at 2^15 - 2 so even the largest real key stays below the int32
        # sentinel ((32767 << 16) | 65535 == iinfo.max would alias it)
        d2i = jnp.minimum(dy * dy + dx * dx, (1 << 15) - 2)
        key = (d2i << 16) | pos
        best = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(fgf, flat_l, 0)
        ].min(jnp.where(fgf, key, i32max))
        lab_ids = jnp.arange(1, max_labels + 1, dtype=jnp.int32)
        valid = best[1:] < i32max
        center_pos = jnp.where(valid, best[1:] & 0xFFFF, 0)
    else:
        # Exact two-pass path for large images (pos would overflow 16 bits):
        # scatter-min the exact int distance per label, then scatter-min the
        # raster position among pixels achieving it. Same result (nearest
        # pixel, ties -> first in raster order), one extra HW scatter.
        dy = 2 * yy.reshape(-1) - ymed2[flat_l]
        dx = 2 * xx.reshape(-1) - xmed2[flat_l]
        d2i = dy * dy + dx * dx  # <= 4*(H^2+W^2), fits int32 to ~16k px
        best_d2 = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(fgf, flat_l, 0)
        ].min(jnp.where(fgf, d2i, i32max))
        at_best = fgf & (d2i == best_d2[flat_l])
        best = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(at_best, flat_l, 0)
        ].min(jnp.where(at_best, pos, i32max))
        lab_ids = jnp.arange(1, max_labels + 1, dtype=jnp.int32)
        valid = best[1:] < i32max
        center_pos = jnp.where(valid, best[1:], 0)
    centers = jnp.zeros(H * W, jnp.bool_).at[
        jnp.where(valid, center_pos, H * W - 1)
    ].max(valid & (lab_ids > 0))
    return centers.reshape(H, W)


@functools.partial(jax.jit, static_argnames=("n_iter", "max_labels"))
def masks_to_flows(
    labels: jnp.ndarray, n_iter: int = 96, max_labels: int = 512
) -> jnp.ndarray:
    """(H, W) labels -> (2, H, W) unit flow field pointing at object centers.

    The published cellpose training-target construction (Stringer et al.
    2021 ``dynamics.masks_to_flows``): heat diffusion from each object's
    median-center pixel — per iteration the center gains +1 and every
    object pixel becomes the mean of its 3x3 neighborhood with absorbing
    (zero) boundaries outside the object — then the unit-normalized
    gradient of log1p(heat). Whole-image formulation: same-label masked
    shifts reproduce cellpose's per-object crops exactly (a different
    touching object reads as 0, like the crop edge). Fixed ``n_iter``
    replaces cellpose's per-object size-scaled iteration count (static
    shapes for jit); 96 keeps normalized gradients well-formed out to
    radius ~100 px in float32.
    """
    H, W = labels.shape
    fg = labels > 0
    source = label_median_centers(labels, max_labels).astype(jnp.float32)

    # The 8 same-label neighbor masks are loop-invariant: precompute them
    # once as float multipliers instead of re-shifting + comparing the
    # labels array inside every diffusion iteration (was ~2x the loop cost).
    offsets = [
        (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)
    ]
    l_pad = jnp.pad(labels, 1, constant_values=-1)
    same = [
        (
            l_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx] == labels
        ).astype(jnp.float32)
        for dy, dx in offsets
    ]

    def _shift(T, dy, dx):
        t_pad = jnp.pad(T, 1)
        return t_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]

    # diffusion loop: ONE VMEM-resident Pallas kernel under vmap on TPU
    # (ops.pallas_stencil.diffuse_heat), the XLA fori_loop otherwise; the
    # `same` masks above are reused by the gradient below either way
    T = _diffuse(n_iter)(labels, source)
    logT = jnp.log1p(T)

    def grad_axis(dy, dx):
        k_plus = offsets.index((dy, dx))
        k_minus = offsets.index((-dy, -dx))
        plus = _shift(logT, dy, dx) * same[k_plus]
        minus = _shift(logT, -dy, -dx) * same[k_minus]
        return (plus - minus) / 2.0

    gy = grad_axis(1, 0)
    gx = grad_axis(0, 1)
    mag = jnp.sqrt(gy**2 + gx**2)
    gy = jnp.where(fg, gy / jnp.maximum(mag, 1e-20), 0.0)
    gx = jnp.where(fg, gx / jnp.maximum(mag, 1e-20), 0.0)
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


@functools.partial(jax.jit, static_argnames=("n_iter", "n_prop"))
def follow_flows(
    flows: jnp.ndarray,
    fg: jnp.ndarray,
    n_iter: int = 2,
    n_prop: int = 96,
) -> jnp.ndarray:
    """Integrate pixels along (2, H, W) flows; returns final (2, H, W) positions.

    Hybrid scheme replacing cellpose's 200 Euler steps: ``n_iter`` bilinear
    Euler steps smooth the approach, then ``n_prop`` composed steps of the
    *successor map* (each pixel's rounded one-step destination) finish basin
    convergence. TPU formulation is gather-free where it counts — gathers on
    v5e run ~13 ms per 1M random indices, so the earlier 2-Euler(+8 bilinear
    gathers) + 8-pointer-doubling design cost ~225 ms/16 images:

    - Euler step 1 starts at integer grid positions, where bilinear sampling
      IS the pixel value — a direct read, zero gathers.
    - Euler step 2's positions lie in [p-1, p+1] (unit flows), so all four
      bilinear corners live in the 4x4 neighborhood — select over static
      shifts. (Steps 3+, used only by ported torch checkpoints, keep true
      bilinear gathers; positions drift beyond any fixed stencil.)
    - The successor of each grid pixel is one rounded unit step — always
      within its own 3x3 neighborhood — so ``succ^N`` is N rounds of
      neighbor shift-select key propagation, not N (or log N) gathers.
    - The remaining three gathers (composed key at the rounded Euler
      endpoint + 2 cycle-collapse lookups, ~13 ms each on v5e) are gone
      too: sink cycles (period <= 3) are detected by stencil composition
      of the offset field and canonicalized in the key INIT (key
      propagation computes ``key_0[succ^N(p)]``), and the Euler endpoint
      at ``n_iter <= 2`` lies within +-n_iter px, so its key read is a
      shift-select. The default path now issues ZERO pixel-space gathers.

    Both ``n_iter`` and ``n_prop`` are static (jit static_argnames; the
    residue unroll below needs a concrete Python int) — callers threading a
    traced value get a trace-time error by design, not a silent fallback.
    """
    _, H, W = flows.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    fy, fx = flows[0], flows[1]

    # Euler step 1: integer start -> bilinear == direct read.
    py = jnp.clip(yy + fy, 0.0, H - 1.0) if n_iter >= 1 else yy
    px = jnp.clip(xx + fx, 0.0, W - 1.0) if n_iter >= 1 else xx

    if n_iter >= 2:
        # Euler step 2: bilinear at p1 via stencil-select. Corner base
        # offset floor(p1)-p is in {-1,0,1} per axis; corners at base+{0,1}.
        oy = jnp.clip(jnp.floor(py) - yy, -1.0, 1.0).astype(jnp.int32)
        ox = jnp.clip(jnp.floor(px) - xx, -1.0, 1.0).astype(jnp.int32)
        ty = py - jnp.floor(py)
        tx = px - jnp.floor(px)

        def sample(field):
            fp = jnp.pad(field, 2)
            vals = {
                (dy, dx): fp[2 + dy : H + 2 + dy, 2 + dx : W + 2 + dx]
                for dy in (-1, 0, 1, 2)
                for dx in (-1, 0, 1, 2)
            }

            def pick(ay, ax):
                out = jnp.zeros_like(field)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        sel = (oy == dy) & (ox == dx)
                        out = jnp.where(sel, vals[(dy + ay, dx + ax)], out)
                return out

            return (
                pick(0, 0) * (1 - ty) * (1 - tx)
                + pick(0, 1) * (1 - ty) * tx
                + pick(1, 0) * ty * (1 - tx)
                + pick(1, 1) * ty * tx
            )

        py = jnp.clip(py + sample(fy), 0.0, H - 1.0)
        px = jnp.clip(px + sample(fx), 0.0, W - 1.0)

    if n_iter > 2:  # ported-torch-checkpoint schedule: true bilinear
        pyf, pxf = py.reshape(-1), px.reshape(-1)

        def step(carry, _):
            py, px = carry
            v = _bilinear(flows, py, px)
            return (py + v[0], px + v[1]), None

        (pyf, pxf), _ = jax.lax.scan(step, (pyf, pxf), None, length=n_iter - 2)
        py, px = pyf.reshape(H, W), pxf.reshape(H, W)

    if n_prop > 0:
        yi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        # Successor map from the UNIT-NORMALIZED direction field. GT
        # training flows are unit by construction, so this is a no-op
        # there — but network-predicted flows have sub-unit magnitude in
        # basin interiors (the regression target tapers near sinks), and
        # rounding the RAW flow stalls any pixel with |f| < 0.5,
        # fragmenting basins. Cellpose's 200 small Euler steps accumulate
        # sub-unit motion instead (dynamics.steps2D_interp); composing
        # unit steps along the direction field reaches the same sinks.
        # Pixels with genuinely negligible flow (< 0.02, i.e. < 4 px total
        # motion under cellpose's 200-step budget) stay put — they ARE the
        # sink plateau.
        fmag = jnp.sqrt(fy * fy + fx * fx)
        finv = jnp.where(fmag > 0.02, 1.0 / jnp.maximum(fmag, 1e-20), 0.0)
        uy, ux = fy * finv, fx * finv
        # one rounded unit step, clamped to the 3x3 neighborhood (unit
        # steps stay within it anyway) so the propagation select and the
        # cycle-collapse lookups walk the SAME successor map
        dy1 = jnp.clip(
            jnp.round(jnp.clip(yy + uy, 0.0, H - 1.0)).astype(jnp.int32) - yi,
            -1, 1,
        )
        dx1 = jnp.clip(
            jnp.round(jnp.clip(xx + ux, 0.0, W - 1.0)).astype(jnp.int32) - xi,
            -1, 1,
        )
        sy = yi + dy1
        sx = xi + dx1
        dcode = (dy1 + 1) * 3 + (dx1 + 1)

        # The rounded successor map converges to short cycles around each
        # sink (typically 2-cycles straddling the center); pixels land on
        # one cycle element by path parity, which would split a small
        # object's sink histogram across bins and can starve the h>10 seed
        # rule. Canonicalize cycles UP FRONT in the key INIT — key
        # propagation computes key_n[p] = key_0[succ^n(p)], so seeding
        # key_0[q] = (cycle-min of q's cycle, for q on a period-<=3 cycle)
        # makes every basin pixel land on ONE bin with ZERO post-hoc
        # gathers. The old formulation collapsed after the fact with
        # min(final, succ[final], succ[succ[final]]) — two 1M-element
        # gathers at ~13 ms each on v5e; the cycle test is pure stencil
        # algebra on the offset field (succ^2/succ^3 offsets compose by
        # shift-selects, ~0.3 ms) and is EXACTLY equivalent for cycle
        # periods 1-3 (the min runs over the same cycle-element set).
        def _sel3(field_y, field_x, oy, ox):
            # (field_y, field_x) sampled at p + (oy, ox), oy/ox in [-r, r]
            r = 1
            py_ = jnp.pad(field_y, r, constant_values=0)
            px_ = jnp.pad(field_x, r, constant_values=0)
            out_y = jnp.zeros_like(field_y)
            out_x = jnp.zeros_like(field_x)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    sel = (oy == dy) & (ox == dx)
                    out_y = jnp.where(
                        sel, py_[r + dy : H + r + dy, r + dx : W + r + dx], out_y
                    )
                    out_x = jnp.where(
                        sel, px_[r + dy : H + r + dy, r + dx : W + r + dx], out_x
                    )
            return out_y, out_x

        def _sel_wide(field, oy, ox, r):
            fp = jnp.pad(field, r, constant_values=0)
            out = jnp.zeros_like(field)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    sel = (oy == dy) & (ox == dx)
                    out = jnp.where(
                        sel, fp[r + dy : H + r + dy, r + dx : W + r + dx], out
                    )
            return out

        # offset composition: o2 = o1 + o1(p + o1); o3 = o2 + o1(p + o2)
        s1y, s1x = _sel3(dy1, dx1, dy1, dx1)
        o2y, o2x = dy1 + s1y, dx1 + s1x  # in [-2, 2]
        s2y = _sel_wide(dy1, o2y, o2x, 2)
        s2x = _sel_wide(dx1, o2y, o2x, 2)
        o3y, o3x = o2y + s2y, o2x + s2x  # in [-3, 3]
        idx0 = yi * W + xi
        id1 = (yi + dy1) * W + (xi + dx1)
        id2 = (yi + o2y) * W + (xi + o2x)
        on1 = (dy1 == 0) & (dx1 == 0)
        on2 = (o2y == 0) & (o2x == 0) & ~on1
        on3 = (o3y == 0) & (o3x == 0) & ~on1 & ~on2
        canon = jnp.where(on2, jnp.minimum(idx0, id1), idx0)
        canon = jnp.where(
            on3, jnp.minimum(idx0, jnp.minimum(id1, id2)), canon
        )

        # (A half-rounds + one squaring gather variant — succ^2k[p] ==
        # succ^k[succ^k[p]] — was measured SLOWER: the 1M-element gather
        # costs ~25 ms/16 images while 48 stencil rounds cost ~12 ms.)
        # Early exit, bit-identical: key_t[p] = key_0[succ^t(p)], so if a
        # block of B rounds leaves the key unchanged (key_{t+B} == key_t
        # pointwise) then key_{t+kB} == key_t for all k — and n_prop is a
        # multiple of B, so stopping returns EXACTLY key_{n_prop}. Pixels
        # converge to their sink cycle in ~(basin radius) rounds, after
        # which periods are 1-2 (divide 6); typical fields stop after a
        # third of the budget. Residue rounds keep the multiple-of-B
        # invariant exact. Under vmap on TPU the rounds run inside ONE
        # VMEM-resident Pallas kernel (ops.pallas_stencil.successor_prop)
        # instead of round-tripping HBM per round; unbatched/CPU keeps the
        # XLA loop.
        key = _propagate_keys(n_prop, 6)(dcode, canon)
        ry = jnp.clip(jnp.round(py), 0, H - 1).astype(jnp.int32)
        rx = jnp.clip(jnp.round(px), 0, W - 1).astype(jnp.int32)
        if n_iter <= 2:
            # the Euler endpoint lies within +-n_iter px of the origin
            # (unit-magnitude flows), so reading key there is a stencil
            # select, not a 1M-element gather (~13 ms saved on v5e)
            final = _sel_wide(
                key,
                jnp.clip(ry - yi, -n_iter, n_iter),
                jnp.clip(rx - xi, -n_iter, n_iter),
                max(n_iter, 1),
            )
        else:  # ported-torch schedule: endpoints drift beyond any stencil
            final = key.reshape(-1)[(ry * W + rx).reshape(-1)].reshape(H, W)
        py = (final // W).astype(jnp.float32)
        px = (final % W).astype(jnp.float32)

    py = jnp.where(fg, py, yy)
    px = jnp.where(fg, px, xx)
    return jnp.stack([py, px])


def _shift2(arr: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    H, W = arr.shape
    p = jnp.pad(arr, 1, constant_values=fill)
    return p[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]


_BIG_I32 = jnp.int32(2**30)


@functools.partial(jax.jit, static_argnames=("max_labels", "drop_megamasks"))
def masks_from_sinks(
    final_pos: jnp.ndarray,
    fg: jnp.ndarray,
    max_labels: int = 256,
    drop_megamasks: bool = True,
) -> jnp.ndarray:
    """Cluster converged pixel positions into labeled masks.

    Faithful to the published Cellpose ``get_masks`` clustering (Stringer
    et al. 2021; behavior the reference consumes via ``model.eval``,
    ``/root/reference/src/aliby/segment/dispatch.py:172-248``):

    1. histogram the rounded converged positions onto the pixel grid;
    2. seeds = local maxima of the histogram under a 5x5 maximum filter
       with count > 10;
    3. grow every seed for 5 rounds of 8-connected dilation restricted to
       bins with count > 2 — conflicts (a bin reachable from two seeds)
       resolve to the seed with the SMALLER count, ties to the smaller bin
       index, matching the upstream write-order rule;
    4. every foreground pixel takes the grown region its sink bin falls
       in; masks covering > 40% of the image are dropped.

    TPU formulation: the per-seed Python expansion becomes 5 rounds of
    frozen-read neighborhood min-propagation of a lexicographic
    (count, seed-rank) key over the count>2 corridor — no sorts, no
    gathers, no CC sweep (gated against the NumPy oracle by
    ``tests/test_dynamics_parity.py``). Min-size removal and hole filling
    live in :func:`masks_from_flows` (upstream applies them after flow QC).

    With ``drop_megamasks=False`` (the fused path) the returned ids are
    dense seed ranks in raster order — the same ascending order a
    sequential relabel would produce, but possibly with gaps (a grown seed
    region that captured no foreground sink); ``masks_from_flows``'s final
    compaction closes them. ``drop_megamasks=True`` (standalone) returns
    strictly sequential labels as before.
    """
    H, W = fg.shape
    HW = H * W
    sy = jnp.clip(jnp.round(final_pos[0]).astype(jnp.int32), 0, H - 1)
    sx = jnp.clip(jnp.round(final_pos[1]).astype(jnp.int32), 0, W - 1)
    sink = (sy * W + sx).reshape(-1)
    fgf = fg.reshape(-1)
    hist = (
        jnp.zeros(HW, jnp.int32)
        .at[jnp.where(fgf, sink, 0)]
        .add(jnp.where(fgf, 1, 0))
        .reshape(H, W)
    )
    # 5x5 separable maximum filter: radius-2 = two cascaded radius-1 passes
    # per axis (out-of-grid bins hold count 0)
    hmax = hist
    for _ in range(2):
        hmax = jnp.maximum(
            hmax, jnp.maximum(_shift2(hmax, 1, 0, 0), _shift2(hmax, -1, 0, 0))
        )
    for _ in range(2):
        hmax = jnp.maximum(
            hmax, jnp.maximum(_shift2(hmax, 0, 1, 0), _shift2(hmax, 0, -1, 0))
        )
    seeds = (hist >= hmax) & (hist > 10)

    # Tie-break payload: the 1-based seed RANK (cumsum over the seed map in
    # raster order) instead of the raw bin index. Rank is strictly monotone
    # in bin index across seeds, so every lexicographic (count, payload)
    # comparison below resolves identically — but the winning payload is
    # ALREADY a dense label id, which deletes the trailing
    # relabel_dense(HW-space) pass (presence scatter + HW gather,
    # ~15-20 ms/16 images on v5e) from the fused path outright.
    rank2d = jnp.cumsum(seeds.reshape(-1).astype(jnp.int32)).reshape(H, W)
    corridor = hist > 2
    key_h = jnp.where(seeds, hist, _BIG_I32)
    key_i = jnp.where(seeds, rank2d, _BIG_I32)

    def _lexmin3(kh, ki, axis_pairs):
        # lexicographic min over {self, two shifted neighbors} per channel
        nh, ni = kh, ki
        for dy, dx in axis_pairs:
            sh = _shift2(kh, dy, dx, _BIG_I32)
            si = _shift2(ki, dy, dx, _BIG_I32)
            better = (sh < nh) | ((sh == nh) & (si < ni))
            nh = jnp.where(better, sh, nh)
            ni = jnp.where(better, si, ni)
        return nh, ni

    for _ in range(5):
        # 3x3-window lexmin is separable (min is associative/commutative):
        # vertical min3 then horizontal min3 — 4 shifted lex-compares per
        # round instead of 8 (the corridor mask applies per ROUND, after
        # the full window min, so the decomposition is exact)
        nh, ni = _lexmin3(key_h, key_i, ((-1, 0), (1, 0)))
        nh, ni = _lexmin3(nh, ni, ((0, -1), (0, 1)))
        key_h = jnp.where(corridor, nh, _BIG_I32)
        key_i = jnp.where(corridor, ni, _BIG_I32)

    owner = jnp.where(key_i < _BIG_I32, key_i, 0).reshape(-1)  # [0, n_seeds]
    raw = jnp.where(fgf, owner[sink], 0)
    # seed ranks beyond the label budget drop to 0 (never alias)
    raw = jnp.where(raw <= max_labels, raw, 0).reshape(H, W)
    if drop_megamasks:
        # standalone use keeps the upstream >40%-of-image drop here plus a
        # sequential compaction (rank gaps appear when a grown seed region
        # captures no foreground sink); the fused path (masks_from_flows)
        # folds both into its per-label count pass — same final labels,
        # several fewer HW-element scatter/gathers
        rawf = raw.reshape(-1)
        areas = jnp.zeros(max_labels + 1, jnp.float32).at[rawf].add(1.0)
        keep_px = (areas[rawf] <= 0.4 * HW) & (rawf > 0)
        raw = jnp.where(keep_px, rawf, 0).reshape(H, W)
        return relabel_dense(raw, max_labels + 1, max_labels)
    return raw


@jax.jit
def fill_label_holes(labels: jnp.ndarray) -> jnp.ndarray:
    """Fill enclosed background holes per mask (cellpose
    ``fill_holes_and_remove_small_masks`` hole semantics): a 4-connected
    background component that does not touch the image border and is
    adjacent to exactly one label is assigned that label. (Nested-mask
    pockets adjacent to two labels stay background, which matches upstream
    for non-nested masks — the overwhelmingly common case.)

    The outer background sea spans the whole image, so CC over ALL of bg
    pays ~log4(diameter) hook+jump rounds of scatter+gather. Prefilter:
    ``vis`` = bg pixels straight-line visible from the border through bg
    (4 cumsums). A straight bg line from the border is itself a 4-connected
    bg path, so vis pixels can never be hole pixels — exactly the sea's
    convex-ish bulk. Only ``rest = bg & ~vis`` (holes + concave pockets,
    all small) needs component reasoning, and the decision values
    themselves — the component-wide (min, max) adjacent label — propagate
    by pure 4-neighbor stencil min/max until stable, so no component ids,
    scatters, or gathers are needed at all. Rest fragments of
    border-touching components are 4-adjacent to a vis pixel (the first
    step off the fragment inside bg lands on vis), so folding vis-adjacency
    into the border channel keeps exterior pockets unfilled —
    bit-identical output (equivalence swept in randomized tests +
    adversarial C/U/nested-annulus/snake shapes).
    """
    H, W = labels.shape
    bg = labels == 0
    blocked = (~bg).astype(jnp.int32)
    vis = (
        (jnp.cumsum(blocked, axis=0) == 0)
        | (jnp.cumsum(blocked[::-1], axis=0)[::-1] == 0)
        | (jnp.cumsum(blocked, axis=1) == 0)
        | (jnp.cumsum(blocked[:, ::-1], axis=1)[:, ::-1] == 0)
    ) & bg
    rest = bg & ~vis
    # Per-PIXEL neighbor min/max from label/vis/border adjacency. Border/vis
    # contact is folded into the max channel: such a pixel reports a BIG
    # pseudo-neighbor, so its component fails lab_min == lab_max (or fails
    # lab_min < BIG when it has no labeled neighbor).
    pmin = jnp.full((H, W), _BIG_I32)
    pmax = jnp.zeros((H, W), jnp.int32)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = _shift2(labels, dy, dx, 0)
        nvis = _shift2(vis, dy, dx, False)
        pmin = jnp.minimum(pmin, jnp.where(nb > 0, nb, _BIG_I32))
        pmax = jnp.maximum(pmax, jnp.where(nvis, _BIG_I32, nb))
    border = jnp.zeros_like(labels, bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    pmax = jnp.where(border, _BIG_I32, pmax)
    # Component-wide (min, max): pure stencil min/max propagation over the
    # rest mask until stable — no component ids, no scatters, no gathers
    # (an earlier CC + scatter-reduce version paid ~145 ms/16 images in
    # scatter/gather rounds; this runs in a few ms). Rest components are
    # small (holes + concave pockets), so trips stay low; 8 rounds per trip
    # amortize the convergence check.
    pmin = jnp.where(rest, pmin, _BIG_I32)
    pmax = jnp.where(rest, pmax, 0)

    def _round(pmin, pmax):
        nmin, nmax = pmin, pmax
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nrest = _shift2(rest, dy, dx, False)
            nmin = jnp.minimum(
                nmin, jnp.where(nrest, _shift2(pmin, dy, dx, _BIG_I32), _BIG_I32)
            )
            nmax = jnp.maximum(
                nmax, jnp.where(nrest, _shift2(pmax, dy, dx, 0), 0)
            )
        return jnp.where(rest, nmin, _BIG_I32), jnp.where(rest, nmax, 0)

    def cond(state):
        i, _, _, changed = state
        return changed & (i < H * W)

    def body(state):
        i, pmin, pmax, _ = state
        nmin, nmax = _round(pmin, pmax)
        for _ in range(7):
            nmin, nmax = _round(nmin, nmax)
        changed = jnp.any((nmin != pmin) | (nmax != pmax))
        return i + 1, nmin, nmax, changed

    _, pmin, pmax, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pmin, pmax, jnp.bool_(True))
    )
    fillable = rest & (pmin == pmax) & (pmin > 0) & (pmax < _BIG_I32)
    return jnp.where(fillable, pmin, labels)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "max_labels", "min_size", "flow_threshold", "fill_holes",
    ),
)
def masks_from_flows(
    flows: jnp.ndarray,
    cellprob: jnp.ndarray,
    cellprob_threshold: float = 0.0,
    n_iter: int = 2,
    max_labels: int = 256,
    min_size: int = 15,
    flow_threshold: float | None = None,
    fill_holes: bool = True,
) -> jnp.ndarray:
    """(2,H,W) flows + (H,W) cell logit -> (H,W) int32 label masks.

    Stage order mirrors cellpose ``compute_masks``: follow flows ->
    histogram clustering (+megamask removal) -> optional flow-error QC
    (masks whose recomputed flows disagree with the predicted flows by
    mean squared error > ``flow_threshold`` are dropped) -> hole filling +
    min-size removal. Gated against the independent NumPy oracle
    (``tests/oracle_dynamics.py``) by ``tests/test_dynamics_parity.py``.
    """
    fg = cellprob > cellprob_threshold
    final = follow_flows(flows, fg, n_iter=n_iter)
    H, W = fg.shape
    labels = masks_from_sinks(
        final, fg, max_labels=max_labels, drop_megamasks=False
    )
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    lab_px = jnp.where(labels > 0, labels, 0).reshape(-1)
    # QC error sums and label areas ride ONE 2-column scatter (areas are
    # invariant under whole-label QC drops, so min-size reuses the same
    # counts), and the drop masks apply through ONE table lookup — each
    # avoided HW-element scatter/gather is ~10-15 ms on v5e. The upstream
    # >40%-of-image megamask drop rides the SAME counts (deferred out of
    # masks_from_sinks): per-label flow errors are label-local, so
    # dropping a megamask before or after QC yields identical survivors.
    # binned_sum_cols carries a custom vmap rule: under the batched fused
    # program on TPU this rides the Pallas one-hot-MXU kernel (~2-4 ms for
    # 16 images at 257 bins) instead of the raw scatter-add the TPU
    # scatter unit serializes (~9 ms); unbatched/CPU keeps the scatter.
    from aliby_tpu.extract.reductions import binned_sum_cols

    if flow_threshold is not None:
        # the QC recomputation's label ids are bounded by THIS max_labels —
        # a tighter center table than masks_to_flows' 512 training default
        mask_flows = masks_to_flows(labels, max_labels=max_labels)
        err_px = ((mask_flows - flows) ** 2).sum(axis=0)
        cols = jnp.stack(
            [
                jnp.where(lab_px > 0, err_px.reshape(-1), 0.0),
                (lab_px > 0).astype(jnp.float32),
            ],
            axis=-1,
        )
        acc = binned_sum_cols(cols, jnp.clip(lab_px, 0, max_labels),
                              max_labels + 1)
        sums, cnts = acc[1:, 0], acc[1:, 1]
        err = sums / jnp.maximum(cnts, 1.0)
        # min-size on UNFILLED areas (upstream checks npix before filling)
        drop = (err > flow_threshold) | (cnts < min_size)
    else:
        cnts = binned_sum_cols(
            (lab_px > 0).astype(jnp.float32)[:, None],
            jnp.clip(lab_px, 0, max_labels),
            max_labels + 1,
        )[1:, 0]
        drop = cnts < min_size
    drop = drop | (cnts > 0.4 * H * W)  # deferred megamask removal
    # Drop + final sequential compaction in ONE table gather (dropped ->
    # 0, survivors -> their rank among survivors in ascending-label order,
    # exactly relabel_dense's convention). Hole filling commutes with the
    # compaction — it only compares label equality/adjacency, which any
    # injective relabeling preserves, and it never resurrects an absent
    # label — so compacting FIRST deletes the trailing
    # relabel_dense(HW-scatter + HW-gather, ~30 ms/16 images) outright.
    present = (cnts >= 1.0) & ~drop
    seq = jnp.cumsum(present.astype(jnp.int32))
    table = jnp.where(present, seq, 0).astype(jnp.int32)
    labels = jnp.where(labels > 0, table[l_idx], 0)
    if fill_holes:
        labels = fill_label_holes(labels)
    return labels
