"""Per-timepoint stitch tracking: IoU-matched label carry-over.

Reference semantics (``track/trackers.py:14-90``): per tile, the tracker
receives the masks of the last two timepoints plus its carried state
``{"labels": <global label map of tp-1>, "max_label": <int>}``; the current
mask's objects adopt the previous object's *global* label when their IoU
exceeds the threshold, otherwise they get fresh labels above ``max_label``
(cellpose ``stitch3D`` behavior).

TPU formulation: the (prev x cur) intersection matrix is one scatter-add on
a composite index; IoU, argmax assignment, and fresh-label ranking are all
dense (max_labels**2) ops under jit — no per-object loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aliby_tpu.ops.labels import relabel_sequential


@functools.partial(jax.jit, static_argnames=("max_labels",))
def stitch_pair(
    prev_global: jnp.ndarray,
    cur: jnp.ndarray,
    max_label: jnp.ndarray,
    max_labels: int = 256,
    iou_threshold: float = 0.25,
):
    """Assign global labels to ``cur`` by IoU against ``prev_global``.

    Returns (cur_global, new_max_label).
    """
    # compact the previous global map; forward[k] = global id of compact k
    prev_c, forward = relabel_sequential(prev_global.astype(jnp.int32), max_labels)
    cur = cur.astype(jnp.int32)
    L = max_labels + 1
    flat = prev_c.reshape(-1) * L + cur.reshape(-1)
    inter = jnp.zeros(L * L, jnp.float32).at[flat].add(1.0).reshape(L, L)
    area_p = inter.sum(1)
    area_c = inter.sum(0)
    union = area_p[:, None] + area_c[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)
    iou = iou.at[0, :].set(0.0).at[:, 0].set(0.0)
    best_prev = jnp.argmax(iou, axis=0)  # per cur compact label
    best_iou = jnp.max(iou, axis=0)
    matched = best_iou > iou_threshold
    # fresh labels for unmatched current objects, ranked consecutively
    exists = area_c > 0
    exists = exists.at[0].set(False)
    is_new = exists & ~matched
    new_rank = jnp.cumsum(is_new)  # 1-based among new
    assigned = jnp.where(
        matched, forward[jnp.clip(best_prev, 0, max_labels)], max_label + new_rank
    )
    assigned = jnp.where(exists, assigned, 0).astype(jnp.int32)
    lut = assigned  # index: cur compact label
    cur_global = lut[jnp.clip(cur, 0, max_labels)]
    new_max = jnp.maximum(max_label, assigned.max())
    return cur_global, new_max


def stitch_rois(masks, state: dict | None = None, iou_threshold: float = 0.25, max_labels: int = 256) -> dict:
    """Track all tiles one step forward.

    ``masks``: per-tile list of the last <=2 timepoints' label maps
    (tile-major, as the engine reshapes them — ``pipe_core.py:195-200``).
    ``state``: ``{"labels": [per-tile global maps], "max_label": [ints]}``.
    """
    if state is None:
        state = {"labels": [None] * len(masks), "max_label": [0] * len(masks)}
    out_labels, out_max = [], []
    for tile_i, tile_masks in enumerate(masks):
        cur = np.asarray(tile_masks[-1])
        prev_state = state["labels"][tile_i]
        max_label = int(state["max_label"][tile_i])
        if prev_state is None or len(tile_masks) < 2:
            # first frame: objects keep their (sequential) ids as globals
            cur_global = cur.astype(np.int32)
            new_max = int(cur_global.max())
        else:
            cur_global, new_max = stitch_pair(
                jnp.asarray(prev_state),
                jnp.asarray(cur),
                jnp.int32(max_label),
                max_labels=max_labels,
                iou_threshold=iou_threshold,
            )
            cur_global = np.asarray(cur_global)
            new_max = int(new_max)
        out_labels.append(cur_global)
        out_max.append(max(new_max, max_label))
    return {"labels": out_labels, "max_label": out_max}


@functools.partial(jax.jit, static_argnames=("max_labels",))
def stitch_sequence(masks_t: jnp.ndarray, max_labels: int = 256, iou_threshold: float = 0.25):
    """Whole-sequence tracking as one lax.scan over T (SURVEY §5.7).

    ``masks_t``: (T, Y, X) per-frame label maps -> (T, Y, X) global maps.
    """
    def step(carry, cur):
        prev_global, max_label = carry
        cur_global, new_max = stitch_pair(
            prev_global, cur, max_label, max_labels=max_labels,
            iou_threshold=iou_threshold,
        )
        return (cur_global, new_max), cur_global

    first = masks_t[0].astype(jnp.int32)
    init = (first, first.max())
    (_, _), rest = jax.lax.scan(step, init, masks_t[1:])
    return jnp.concatenate([first[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def stitch_movie(
    masks_tf: jnp.ndarray,
    init_labels: jnp.ndarray,
    init_max: jnp.ndarray,
    has_init: jnp.ndarray,
    max_labels: int = 256,
    iou_threshold: float = 0.25,
):
    """Whole-movie tracking for a tile GRID: scan over T, vmap over F.

    ``masks_tf``: (T, F, Y, X) per-frame label maps.
    ``init_labels``/``init_max``: (F, Y, X) / (F,) carried tracker state
    from a previous chunk; ``has_init`` (bool scalar) selects between
    continuing from that state and the first-frame rule (objects keep
    their sequential ids as globals — ``stitch_rois`` semantics).

    Returns (globals_tf, max_t): (T, F, Y, X) global label maps and the
    (T, F) running max-label after each frame — exactly the per-tp
    ``{"labels", "max_label"}`` states the per-tp path produces, computed
    in ONE dispatch per chunk instead of one per timepoint.
    """

    def per_tile(tiles_t, init_lab, init_m):
        first = tiles_t[0].astype(jnp.int32)
        first_as_init = jnp.where(has_init, init_lab, first)
        max_as_init = jnp.where(has_init, init_m, 0)

        def step(carry, cur):
            prev_global, max_label = carry
            cur_global, new_max = stitch_pair(
                prev_global, cur, max_label, max_labels=max_labels,
                iou_threshold=iou_threshold,
            )
            return (cur_global, new_max), (cur_global, new_max)

        # with carried state the FIRST frame also stitches; without it the
        # first frame keeps its own ids (max = its own max)
        g0, m0 = jax.lax.cond(
            has_init,
            lambda: step((first_as_init, max_as_init), first)[0],
            lambda: (first, first.max()),
        )
        (_, _), (rest_g, rest_m) = jax.lax.scan(
            step, (g0, m0), tiles_t[1:].astype(jnp.int32)
        )
        globals_t = jnp.concatenate([g0[None], rest_g], axis=0)
        max_t = jnp.concatenate([m0[None], rest_m], axis=0)
        return globals_t, max_t

    globals_ft, max_ft = jax.vmap(per_tile, in_axes=(1, 0, 0))(
        masks_tf, init_labels.astype(jnp.int32), init_max.astype(jnp.int32)
    )
    return jnp.swapaxes(globals_ft, 0, 1), jnp.swapaxes(max_ft, 0, 1)
