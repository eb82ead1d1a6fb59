"""Label-map primitives on TPU: connected components, relabeling, one-hot.

The reference leans on scipy/scikit-image (``skimage.measure.label``,
``relabel_sequential`` — e.g. ``extraction/extract.py:485-517``,
``segment/dispatch.py:236-247``). Here the same primitives are expressed as
fixed-iteration, statically-shaped JAX so they fuse into the segmentation and
extraction pipelines under ``jit``:

- connected components = iterative neighbor-min propagation + pointer
  doubling (log-depth label flattening), the classic TPU-friendly union-find
  substitute;
- relabel-sequential = sort-based compaction to a fixed ``max_labels`` pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def _neighbor_min(lbl: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    """Min over the 4- or 8-neighborhood (padding with +inf sentinel)."""
    out = lbl
    pad = lambda a, y0, y1, x0, x1: jnp.pad(
        a, ((y0, y1), (x0, x1)), constant_values=_BIG
    )
    up = pad(lbl, 1, 0, 0, 0)[:-1, :]
    down = pad(lbl, 0, 1, 0, 0)[1:, :]
    left = pad(lbl, 0, 0, 1, 0)[:, :-1]
    right = pad(lbl, 0, 0, 0, 1)[:, 1:]
    out = jnp.minimum(jnp.minimum(out, jnp.minimum(up, down)), jnp.minimum(left, right))
    if connectivity == 2:
        ul = pad(lbl, 1, 0, 1, 0)[:-1, :-1]
        ur = pad(lbl, 1, 0, 0, 1)[:-1, 1:]
        dl = pad(lbl, 0, 1, 1, 0)[1:, :-1]
        dr = pad(lbl, 0, 1, 0, 1)[1:, 1:]
        out = jnp.minimum(out, jnp.minimum(jnp.minimum(ul, ur), jnp.minimum(dl, dr)))
    return out


@functools.partial(jax.jit, static_argnames=("connectivity", "n_iter"))
def connected_components(mask: jnp.ndarray, connectivity: int = 1, n_iter: int = 24) -> jnp.ndarray:
    """Label the connected foreground regions of a boolean (Y, X) mask.

    Returns int32 labels where every component carries the *linear index of
    its smallest pixel* + 1 (background = 0) — stable but non-sequential;
    compose with :func:`relabel_sequential` for 1..n labels.

    Shiloach–Vishkin style: each iteration (1) takes the neighborhood min,
    (2) *hooks* — scatter-mins each pixel's best neighbor label into its
    current root slot, so merges reach the representative in one step
    instead of crawling the component geodesic, and (3) pointer-jumps twice
    to compress paths. Converges in O(log diameter) iterations; the default
    budget covers any realistic field of view.
    """
    h, w = mask.shape
    hw = h * w
    flat_iota = jnp.arange(hw, dtype=jnp.int32).reshape(h, w)
    lbl = jnp.where(mask, flat_iota, _BIG)

    def jump(flat):
        # Pointer doubling: labels are pixel indices; re-chasing the UPDATED
        # array doubles the compressed path length every application.
        safe = jnp.clip(flat, 0, hw - 1)
        return jnp.where(flat < _BIG, jnp.minimum(flat, flat[safe]), _BIG)

    def body(_, lbl):
        nmin = jnp.where(mask, _neighbor_min(lbl, connectivity), _BIG)
        flat = lbl.reshape(-1)
        nflat = nmin.reshape(-1)
        valid = flat < _BIG
        roots = jnp.where(valid, jnp.clip(flat, 0, hw - 1), hw - 1)
        # Hook: the root of p learns the best label any member has seen.
        flat = flat.at[roots].min(jnp.where(valid, nflat, _BIG))
        flat = jnp.minimum(flat, nflat)  # local adoption for fast spread
        flat = jump(flat)
        flat = jump(flat)
        return flat.reshape(h, w)

    lbl = jax.lax.fori_loop(0, n_iter, body, lbl)
    return jnp.where(mask, lbl + 1, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def relabel_sequential(labels: jnp.ndarray, max_labels: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compact arbitrary positive labels into 1..n (n <= max_labels).

    Returns ``(relabeled, forward)`` where ``forward[k]`` is the original
    label mapped to sequential id ``k`` (0 entries unused). Ordering follows
    ascending original label, matching ``skimage.segmentation
    .relabel_sequential``.
    """
    flat = labels.reshape(-1)
    # Fill with a sentinel ABOVE all labels so `uniq` stays ascending
    # (jnp.unique pads at the end with fill_value).
    uniq = jnp.unique(flat, size=max_labels + 1, fill_value=_BIG)
    is_fg = (uniq > 0) & (uniq < _BIG)
    seq_of_rank = jnp.cumsum(is_fg)  # rank -> sequential id (1-based)
    ranks = jnp.searchsorted(uniq, flat)
    new_flat = jnp.where(flat > 0, seq_of_rank[jnp.clip(ranks, 0, max_labels)], 0)
    forward = jnp.zeros(max_labels + 1, dtype=labels.dtype)
    forward = forward.at[jnp.where(is_fg, seq_of_rank, 0)].set(
        jnp.where(is_fg, uniq, 0)
    )
    forward = forward.at[0].set(0)
    return new_flat.reshape(labels.shape).astype(jnp.int32), forward


@functools.partial(
    jax.jit, static_argnames=("connectivity", "n_local", "max_hook")
)
def connected_components_hybrid(
    mask: jnp.ndarray, connectivity: int = 2, n_local: int = 8, max_hook: int = 64
) -> jnp.ndarray:
    """CC tuned for mostly-small components: cheap local sweep, exact finish.

    Phase 1 — ``n_local`` iterations of pure neighbor-min propagation: no
    scatters, no gathers, just static shifts, so it fuses into surrounding
    programs. Alone it is only correct for components of geodesic extent
    < n_local (flow-sink seed blobs measure <= 8 px at p99 on rendered
    fixtures, but without a second channel they reach 20+ px — a fixed
    local budget silently oversegments).

    Phase 2 — hook+pointer-jump rounds (the :func:`connected_components`
    body) run UNTIL STABLE inside a ``lax.while_loop`` (each round ~4x the
    converged reach, so trip counts stay logarithmic): typical seed maps
    converge in 1-3 rounds, and a full-field serpentine component still
    labels exactly instead of silently fracturing. ``max_hook`` is a
    termination backstop far above log4 of any pixel count.

    Measured on v5e (8-FOV flow-sink batch): pure hook+jump(6) ~92 ms,
    this hybrid ~50 ms. Same label convention (min pixel index + 1).
    """
    h, w = mask.shape
    hw = h * w
    flat_iota = jnp.arange(hw, dtype=jnp.int32).reshape(h, w)
    lbl = jnp.where(mask, flat_iota, _BIG)

    def local_body(_, lbl):
        return jnp.where(mask, _neighbor_min(lbl, connectivity), _BIG)

    lbl = jax.lax.fori_loop(0, n_local, local_body, lbl)

    def jump(flat):
        safe = jnp.clip(flat, 0, hw - 1)
        return jnp.where(flat < _BIG, jnp.minimum(flat, flat[safe]), _BIG)

    def hook_round(lbl):
        nmin = jnp.where(mask, _neighbor_min(lbl, connectivity), _BIG)
        flat = lbl.reshape(-1)
        nflat = nmin.reshape(-1)
        valid = flat < _BIG
        roots = jnp.where(valid, jnp.clip(flat, 0, hw - 1), hw - 1)
        flat = flat.at[roots].min(jnp.where(valid, nflat, _BIG))
        flat = jnp.minimum(flat, nflat)
        flat = jump(jump(flat))
        return flat.reshape(h, w)

    def cond(state):
        i, changed, _ = state
        return changed & (i < max_hook)

    def body(state):
        i, _, lbl = state
        new = hook_round(lbl)
        return i + 1, jnp.any(new != lbl), new

    # one unconditional round, then iterate while anything still changes
    first = hook_round(lbl)
    _, _, lbl = jax.lax.while_loop(
        cond, body, (jnp.int32(1), jnp.any(first != lbl), first)
    )
    return jnp.where(mask, lbl + 1, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("upper", "max_labels"))
def relabel_dense(labels: jnp.ndarray, upper: int, max_labels: int) -> jnp.ndarray:
    """Compact positive labels KNOWN to lie in [0, upper) into 1..n.

    Sort-free twin of :func:`relabel_sequential` for bounded label spaces
    (e.g. connected-component ids, which are pixel indices): presence
    scatter + prefix-sum + one gather, instead of a 64k ``jnp.unique`` sort
    (~78 ms per 8-FOV batch on v5e — this runs in ~15 ms). Ordering matches
    (ascending original label). Labels whose sequential id would exceed
    ``max_labels`` map to 0 (dropped) rather than aliased.
    """
    flat = labels.reshape(-1)
    present = jnp.zeros(upper, jnp.int32).at[jnp.clip(flat, 0, upper - 1)].max(
        (flat > 0).astype(jnp.int32)
    )
    seq = jnp.cumsum(present)  # seq[l] = sequential id of label l (if present)
    new = seq[jnp.clip(flat, 0, upper - 1)]
    new = jnp.where((flat > 0) & (new <= max_labels), new, 0)
    return new.reshape(labels.shape).astype(jnp.int32)


def num_labels(labels: jnp.ndarray) -> jnp.ndarray:
    return labels.max()


@functools.partial(jax.jit, static_argnames=("max_labels",))
def label_onehot(labels: jnp.ndarray, max_labels: int) -> jnp.ndarray:
    """(Y, X) int labels -> (max_labels, Y, X) bool one-hot (label k -> row k-1).

    Equivalent of the reference's ``transform_2d_to_3d``
    (``agora/utils/masks.py:5-37``) with a static pad.
    """
    ids = jnp.arange(1, max_labels + 1, dtype=labels.dtype)
    return labels[None, :, :] == ids[:, None, None]


def segment_sum(values: jnp.ndarray, labels: jnp.ndarray, max_labels: int) -> jnp.ndarray:
    """Sum ``values`` per label id (1..max_labels) -> (max_labels,).

    Scatter-add over the flattened image; the workhorse of vectorized
    feature extraction (replaces the reference's per-object Python loop,
    ``extraction/extract.py:345-374``).
    """
    flat_v = values.reshape(-1)
    flat_l = labels.reshape(-1)
    out = jnp.zeros(max_labels + 1, dtype=values.dtype)
    out = out.at[flat_l].add(flat_v)
    return out[1:]


def to_uint16_labels(arr) -> "jnp.ndarray":
    """Overflow-guarded cast (reference ``segment/dispatch.py:14-19``)."""
    import numpy as np

    a = jnp.asarray(arr)
    if int(a.max()) > np.iinfo(np.uint16).max:
        raise ValueError("Label overflow: more than 65535 objects in a tile.")
    return a.astype(jnp.uint16)
