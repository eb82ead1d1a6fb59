"""Training for the flagship segmentation net.

Loss follows cellpose: MSE on (5x-scaled) flow targets + binary
cross-entropy on the cell logit. Targets come from
``flows.masks_to_flows`` on label maps (synthetic or curated).

``make_sharded_train_step`` is the multi-chip path: batch sharded over the
``dp`` mesh axis and image rows over ``sp`` (spatial partitioning — XLA
inserts halo exchanges for the convs); params replicated. This is what
``__graft_entry__.dryrun_multichip`` exercises on a virtual mesh.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aliby_tpu.models import flows as flows_mod
from aliby_tpu.models.unet import CellposeNet


def loss_fn(params, model: CellposeNet, batch: dict) -> tuple[jnp.ndarray, dict]:
    pred = model.apply(params, batch["image"])  # (B, H, W, 3)
    flow_pred = pred[..., :2]
    logit = pred[..., 2]
    # targets arrive channel-first (B, 2, H, W) from masks_to_flows
    flow_target = 5.0 * jnp.moveaxis(batch["flows"], 1, -1)
    # Foreground-weighted flow MSE: the flow-error QC (threshold 0.4,
    # reference model.eval default) is a per-OBJECT statistic, and a small
    # object's whole flow field rotates when its predicted center is off by
    # a pixel — but unweighted per-pixel MSE lets the ~80% background
    # (target 0, trivially learned) dominate. Weight fg 5x relative to bg,
    # normalized so magnitudes stay comparable to the unweighted loss.
    fg = batch["fg"].astype(jnp.float32)[..., None]
    w = 0.2 + 0.8 * fg
    w = w / jnp.mean(w)
    flow_loss = jnp.mean(w * (flow_pred - flow_target) ** 2)
    prob_loss = jnp.mean(
        optax.sigmoid_binary_cross_entropy(logit, batch["fg"].astype(jnp.float32))
    )
    loss = 0.5 * flow_loss + prob_loss
    return loss, {"loss": loss, "flow_loss": flow_loss, "prob_loss": prob_loss}


def make_train_step(model: CellposeNet, tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sharded_train_step(model: CellposeNet, tx, mesh):
    """Train step jitted over a (dp, sp) mesh: batch x spatial partitioning."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = {
        "image": NamedSharding(mesh, P("dp", "sp", None, None)),
        "flows": NamedSharding(mesh, P("dp", None, "sp", None)),
        "fg": NamedSharding(mesh, P("dp", "sp", None)),
    }
    replicated = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(replicated, replicated, batch_sharding),
        out_shardings=(replicated, replicated, replicated),
    )
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step, batch_sharding


def synthetic_batch(
    rng: np.random.Generator,
    batch: int,
    size: int,
    in_channels: int = 2,
    budding_frac: float = 0.0,
    nuclei_frac: float = 0.0,
) -> dict:
    """Render (image, flows, fg) training tuples from the fixture generators.

    ``budding_frac`` mixes in budding-yeast frames (attached mother+bud
    pairs from ``render_budding_movie``) so the net learns to separate
    bud-neck-touching cells — the BABY-class training geometry.
    ``nuclei_frac`` mixes in nuclei-as-main frames (main channel = nucleus
    blobs, second channel = cytoplasm minus nuclei, ground truth = nucleus
    labels) — the channel-role layout the yeast fixture's channel-1
    segmentation uses (``test_data._yeast_timelapse``); without it the
    net's flows on that layout fail the reference flow-error QC (0.4).
    """
    from aliby_tpu.test_data import render_budding_movie, render_cells

    imgs, flows, fgs = [], [], []
    for _ in range(batch):
        draw = rng.random()
        if nuclei_frac and draw < nuclei_frac:
            n = int(rng.integers(6, 16))
            cells, nuclei, _, labels = render_cells(
                size, n, rng, with_nucleus_labels=True
            )
            noise = rng.normal(0, 0.03, (size, size)).astype(np.float32)
            ch0 = (nuclei + noise).astype(np.float32)
            ch1 = ((cells - nuclei).clip(0) + noise).astype(np.float32)
        elif budding_frac and draw < nuclei_frac + budding_frac:
            T = int(rng.integers(2, 5))
            frames, labels_t, _ = render_budding_movie(
                size, T, rng, n_mothers=int(rng.integers(4, 9)),
                bud_max_radius=float(rng.uniform(5.0, 8.0)),
            )
            t = int(rng.integers(1, T))  # pick a frame WITH buds when possible
            ch0 = frames[t].astype(np.float32)
            labels = labels_t[t]
            ch1 = np.zeros_like(ch0)
        else:
            n = int(rng.integers(6, 16))
            cells, nuclei, labels = render_cells(size, n, rng)
            noise = rng.normal(0, 0.03, (size, size)).astype(np.float32)
            ch0 = (cells + noise).astype(np.float32)
            ch1 = (nuclei + noise).astype(np.float32)
        img = np.stack([ch0, ch1] + [np.zeros_like(ch0)] * (in_channels - 2), -1)
        f = np.asarray(flows_mod.masks_to_flows(labels))
        imgs.append(img)
        flows.append(f)
        fgs.append(labels > 0)
    return {
        "image": np.stack(imgs),
        "flows": np.stack(flows),
        "fg": np.stack(fgs),
    }


def train_synthetic(
    n_steps: int = 200,
    batch: int = 4,
    size: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    model_kwargs: dict | None = None,
    log_every: int = 50,
) -> tuple[CellposeNet, Any]:
    """Train the flagship on synthetic fields; returns (model, params)."""
    from aliby_tpu.models.unet import init_params

    rng = np.random.default_rng(seed)
    model, params = init_params(
        jax.random.PRNGKey(seed), in_channels=2, size=size, **(model_kwargs or {})
    )
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    for i in range(n_steps):
        batch_data = synthetic_batch(rng, batch, size)
        params, opt_state, metrics = step(params, opt_state, batch_data)
        if log_every and (i + 1) % log_every == 0:
            print(
                f"step {i + 1}: loss={float(metrics['loss']):.4f} "
                f"flow={float(metrics['flow_loss']):.4f} "
                f"prob={float(metrics['prob_loss']):.4f}"
            )
    return model, params


# -- checkpoint helpers (msgpack via flax; no orbax dependency needed) ------


def save_params(params, path) -> None:
    import pathlib

    from flax import serialization

    data = serialization.to_bytes(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float16), params)
    )
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(path).write_bytes(data)


def load_params(path, template):
    import pathlib

    from flax import serialization

    f16 = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float16), template)
    restored = serialization.from_bytes(f16, pathlib.Path(path).read_bytes())
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), restored)
