"""Pallas TPU kernels: VMEM-resident stencil iteration for the dynamics loops.

The segmentation dynamics (``models/flows.py``) are long chains of cheap
per-pixel stencil rounds — successor-map propagation in ``follow_flows``
(up to 96 rounds of 9-way neighbor select) and heat diffusion in
``masks_to_flows`` (96 rounds of same-label 3x3 averaging). Under XLA each
round is a separate HLO with its intermediates round-tripping HBM, and the
blocked early-exit ``while_loop`` adds per-iteration sync; these kernels
instead hold the state in VMEM for the WHOLE loop (a 256x256 int32 image
is 256 KB — trivially VMEM-resident) and iterate in-register, so the only
HBM traffic is one read of the inputs and one write of the result.

Both kernels are bit-identical reformulations of the XLA loops they
replace (gated by ``tests/test_ops_stencil.py`` in interpreter mode on CPU
and exercised on the chip by the production segment path):

- :func:`successor_prop`: ``key <- key[succ]`` for ``n_prop`` rounds with
  the same blocked early exit as the XLA path (stop when a block of B
  rounds leaves the key unchanged — exact, since key_t is a pure function
  of round count and a fixed point stays fixed).
- :func:`diffuse_heat`: cellpose's center-source heat diffusion with
  absorbing same-label boundaries (the ``masks_to_flows`` interior loop).

Shifts are ``pltpu.roll`` + nothing: the successor map is clipped so a
border pixel's successor stays in-grid (``follow_flows`` builds dy1/dx1
from clipped positions), hence wrapped values are never selected; the
diffusion masks out other-label/background neighbors explicitly, and the
roll-wrapped row/column is killed by the same-label test everywhere except
exact wrap-coincidence, which the explicit border mask handles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _roll2(x, dy: int, dx: int, use_pltpu: bool = True):
    """out[..., y, x] = in[..., (y + dy) % H, (x + dx) % W] (shift-read,
    like the XLA paths' ``_shift``/``shift_i`` but wraparound, not pad).

    ``pltpu.roll`` is the Mosaic-native lane/sublane rotate; interpreter
    mode (the CPU test suite) uses ``jnp.roll`` (same semantics)."""
    roll = pltpu.roll if use_pltpu else jnp.roll
    out = x
    # pltpu.roll requires a non-negative shift; (-d) % size is the same
    # rotation (semantics match jnp.roll: out[i] = in[(i - shift) % n])
    if dy:
        out = roll(out, (-dy) % x.shape[x.ndim - 2], x.ndim - 2)
    if dx:
        out = roll(out, (-dx) % x.shape[x.ndim - 1], x.ndim - 1)
    return out


_OFFSETS = [
    (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)
]


# ---------------------------------------------------------------------------
# successor-map propagation (follow_flows' n_prop loop)
# ---------------------------------------------------------------------------


def _prop_kernel(dcode_ref, key_ref, out_ref, *, n_prop: int, block: int,
                 use_pltpu: bool):
    dcode = dcode_ref[:]
    key = key_ref[:]
    # precompute the 8 neighbor selectors once (dcode 4 = stay)
    sels = []
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                k += 1
                continue
            sels.append((dcode == k, dy, dx))
            k += 1

    def one_round(key):
        new = key
        for sel, dy, dx in sels:
            new = jnp.where(sel, _roll2(key, dy, dx, use_pltpu), new)
        return new

    for _ in range(n_prop % block):
        key = one_round(key)

    def blk_cond(state):
        t, _, changed = state
        return changed & (t < n_prop // block)

    def blk_body(state):
        t, key, _ = state
        new = key
        for _ in range(block):
            new = one_round(new)
        return t + 1, new, jnp.any(new != key)

    _, key, _ = jax.lax.while_loop(
        blk_cond, blk_body, (jnp.int32(0), key, jnp.bool_(True))
    )
    out_ref[:] = key


@functools.partial(jax.jit, static_argnames=("n_prop", "block", "interpret"))
def successor_prop(
    dcode: jnp.ndarray,
    key0: jnp.ndarray,
    n_prop: int = 96,
    block: int = 6,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) dcode in [0, 9) + (B, H, W) int32 keys -> keys after
    ``n_prop`` propagation rounds (``key <- key[succ]``), early-exited in
    blocks of ``block`` rounds exactly like the XLA path."""
    B, H, W = key0.shape
    kern = functools.partial(
        _prop_kernel, n_prop=n_prop, block=block, use_pltpu=not interpret
    )
    spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(dcode.astype(jnp.int32), key0.astype(jnp.int32))


# ---------------------------------------------------------------------------
# same-label heat diffusion (masks_to_flows' interior loop)
# ---------------------------------------------------------------------------


def _diffuse_kernel(labels_ref, source_ref, out_ref, *, n_iter: int,
                    use_pltpu: bool):
    labels = labels_ref[:]
    source = source_ref[:]
    fg = labels > 0
    H, W = labels.shape[-2], labels.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.int32, labels.shape, labels.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, labels.shape, labels.ndim - 1)
    # same-label neighbor masks, computed once: roll wraps, so kill the
    # wrapped row/column explicitly (the XLA path pads with -1)
    same = []
    for dy, dx in _OFFSETS:
        nb = _roll2(labels, dy, dx, use_pltpu)
        valid = jnp.ones_like(fg)
        if dy == 1:
            valid &= yy < H - 1
        if dy == -1:
            valid &= yy > 0
        if dx == 1:
            valid &= xx < W - 1
        if dx == -1:
            valid &= xx > 0
        same.append(((nb == labels) & valid).astype(jnp.float32))

    def body(_, T):
        T = T + source
        acc = T
        for (dy, dx), m in zip(_OFFSETS, same):
            acc = acc + _roll2(T, dy, dx, use_pltpu) * m
        return jnp.where(fg, acc / 9.0, 0.0)

    out_ref[:] = jax.lax.fori_loop(
        0, n_iter, body, jnp.zeros(labels.shape, jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("n_iter", "interpret"))
def diffuse_heat(
    labels: jnp.ndarray,
    source: jnp.ndarray,
    n_iter: int = 96,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) labels + (B, H, W) f32 center sources -> (B, H, W) heat
    after ``n_iter`` rounds of cellpose's masked 3x3 diffusion (the
    ``masks_to_flows`` interior loop, absorbing boundaries)."""
    B, H, W = labels.shape
    kern = functools.partial(
        _diffuse_kernel, n_iter=n_iter, use_pltpu=not interpret
    )
    spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=interpret,
    )(labels.astype(jnp.int32), source.astype(jnp.float32))
