"""Feature-tree compiler and vectorized executor.

Public surface mirrors the reference (``extraction/extract.py``):
``process_tree_masks(tree, masks, pixels, ...) -> (instructions, results)``
and ``format_extraction`` producing the identical wide pyarrow table
(metric full-names ``ch/red/metric`` + cp key, scalar duplication quirk,
embedder ``X_<c>`` columns — ``extract.py:520-599``).

Execution is redesigned: instead of looping ``product(objects,
instructions)`` through per-object Python calls (``extract.py:345-374``),
instructions are grouped by (channel, z-reduction); each group z-reduces
once and every metric family runs as a single jitted label-indexed reduction
over all tiles and labels (``aliby_tpu.extract.features`` /
``cellfuns``). The returned ``results`` list is bit-identical in structure
to the reference's (scalar | dict-of-arrays per (object, instruction)).
"""

from __future__ import annotations

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from aliby_tpu.extract import cellfuns, features

# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------


def _reduce_z(pixels: np.ndarray, method) -> np.ndarray:
    """Reduce the leading (Z) axis. Unlike the reference's ufunc-only
    ``reduce_z`` (``distributors.py:6-24``, where mean/median are registered
    but unusable), all named reductions work."""
    if method is None or method == "None":
        return pixels
    m = str(method)
    if m == "max":
        return pixels.max(axis=0)
    if m == "min":
        return pixels.min(axis=0)
    if m == "mean":
        return pixels.mean(axis=0)
    if m == "median":
        return np.median(pixels, axis=0)
    if m in ("add", "sum"):
        return pixels.sum(axis=0)
    raise KeyError(f"Unknown z-reduction {method!r}")


def _combine_channels(p0: np.ndarray, p1: np.ndarray, method) -> np.ndarray:
    if method == "div":
        with np.errstate(divide="ignore", invalid="ignore"):
            return p0 / p1
    if method == "add":
        return p0 + p1
    raise KeyError(f"Unknown channel combination {method!r}")


REDUCTION_FUNS = {"max", "min", "mean", "median", "add", "div", "None", None}


# ---------------------------------------------------------------------------
# Tree flattening (reference extract.py:33-74 semantics)
# ---------------------------------------------------------------------------


def flatten(tree: dict, prefix: tuple = ()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, (*prefix, k)))
        else:
            out[(*prefix, k)] = v
    return out


def kv(flat: dict) -> list[tuple]:
    return [(*path, metric) for path, metrics in flat.items() for metric in metrics]


# ---------------------------------------------------------------------------
# Family registry
# ---------------------------------------------------------------------------

# cp_measure core families by name -> (kind, callable). Kind controls inputs:
# "mask" -> (labels), "image" -> (labels, img)
_CP_FAMILY_KIND = {
    "sizeshape": "mask",
    "intensity": "image",
    "texture": "image",
    "granularity": "image",
    "zernike": "mask",
    "feret": "mask",
    "radial_distribution": "image",
    "radial_zernikes": "image",
}


def _cp_family_fn(name: str):
    if name == "sizeshape":
        return lambda labels, max_labels, **kw: features.sizeshape(labels, max_labels)
    if name == "intensity":
        return lambda labels, img, max_labels, **kw: features.intensity(
            labels, img, max_labels, edge_measurements=kw.get("edge_measurements", True)
        )
    if name == "feret":
        def feret(labels, max_labels, **kw):
            from aliby_tpu.extract.reductions import directional_extents, feret_diameters

            pmax, pmin = directional_extents(labels, max_labels)
            mx, mn = feret_diameters(pmax, pmin)
            return {"MaxFeretDiameter": mx, "MinFeretDiameter": mn}

        return jax.jit(feret, static_argnames=("max_labels",))
    from aliby_tpu.extract import texture as _texture  # stage-4 families

    if name == "texture":
        return lambda labels, img, max_labels, **kw: _texture.texture(
            labels, img, max_labels
        )
    if name == "granularity":
        return lambda labels, img, max_labels, **kw: _texture.granularity(
            labels, img, max_labels
        )
    if name == "zernike":
        return lambda labels, max_labels, **kw: _texture.zernike(labels, max_labels)
    if name == "radial_distribution":
        return lambda labels, img, max_labels, **kw: _texture.radial_distribution(
            labels, img, max_labels
        )
    if name == "radial_zernikes":
        return lambda labels, img, max_labels, **kw: _texture.radial_zernikes(
            labels, img, max_labels
        )
    raise KeyError(name)


_JITTED_FAMILIES: dict = {}


def _jitted_family(kind: str, metric: str, max_labels: int, kw_items: tuple):
    """One jitted, vmapped graph per (family, max_labels, kwargs).

    vmap of an (internally jitted) family function executes EAGERLY op by
    op — hundreds of dispatches and per-op compiles on remote-compile
    backends. A cached outer jit turns each family into a single
    executable, compiled once and persisted by the compilation cache.
    """
    key = (kind, metric, max_labels, kw_items)
    if key in _JITTED_FAMILIES:
        return _JITTED_FAMILIES[key]
    kw = dict(kw_items)
    if kind == "mask":
        fn = _cp_family_fn(metric)
        jitted = jax.jit(
            lambda lbls: jax.vmap(
                lambda l: fn(l, max_labels=max_labels, **kw)
            )(lbls)
        )
    elif kind == "image":
        fn = _cp_family_fn(metric)
        jitted = jax.jit(
            lambda lbls, imgs: jax.vmap(
                lambda l, im: fn(l, im, max_labels=max_labels, **kw)
            )(lbls, imgs)
        )
    elif kind == "mask_scalar":
        jitted = jax.jit(
            lambda lbls: jax.vmap(
                lambda l: cellfuns.mask_metrics(l, max_labels)
            )(lbls)
        )
    elif kind == "pixel_scalar":
        jitted = jax.jit(
            lambda lbls, imgs: jax.vmap(
                lambda l, im: cellfuns.pixel_metrics(l, im, max_labels)
            )(lbls, imgs)
        )
    elif kind == "trap":
        jitted = jax.jit(
            lambda lbls, imgs: jax.vmap(cellfuns.background_metrics)(lbls, imgs)
        )
    elif kind == "localisation":
        from aliby_tpu.extract import localisation

        jitted = jax.jit(
            lambda lbls, imgs: jax.vmap(
                lambda l, im: localisation.compute(metric, l, im, max_labels)
            )(lbls, imgs)
        )
    elif kind == "corr":
        fn = features.CORRELATION_FEATURES[metric]
        jitted = jax.jit(
            lambda lbls, a, b: jax.vmap(
                lambda l, x, y: fn(l, x, y, max_labels)
            )(lbls, a, b)
        )
    else:
        raise KeyError(kind)
    _JITTED_FAMILIES[key] = jitted
    return jitted


def _max_labels_bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def _as_labeled_stack(masks) -> np.ndarray:
    """list of (Y,X) label maps (or (F,Y,X)) -> (F, Y, X) int32."""
    if isinstance(masks, np.ndarray) and masks.ndim == 3:
        return masks.astype(np.int32)
    return np.stack([np.asarray(m) for m in masks]).astype(np.int32)


def process_tree_masks(
    tree: dict,
    masks,
    pixels,
    ncores=None,
    cp_measure_kwargs: dict | None = None,
    progress_bar: bool = False,
    **kwargs,
):
    """Compute every (object x instruction) value for one timepoint.

    Parameters mirror the reference (``extract.py:240-301``): ``masks`` is a
    per-tile list of 2-D label maps, ``pixels`` the tile stack
    ``(F, C, Z, Y, X)``. ``ncores`` is accepted for API compatibility and
    ignored — parallelism is the vectorization itself.
    """
    del ncores, progress_bar
    labels = _as_labeled_stack(masks)
    pixels = np.asarray(pixels)
    if pixels.ndim == 6:  # leading T of size 1
        pixels = pixels[0]
    F = labels.shape[0]

    instructions = kv(flatten(tree))
    # (tile, label) index space — dense labels assumption as in the
    # reference (extract.py:276-281)
    n_per_tile = [int(labels[f].max()) for f in range(F)]
    ind_masks = [(f, l) for f in range(F) for l in range(1, n_per_tile[f] + 1)]
    tileid_instructions = tuple(product(ind_masks, instructions))

    max_labels = _max_labels_bucket(max(n_per_tile + [1]))
    cpkw = cp_measure_kwargs or {}

    # Group once per unique (ch, red_z) / (pair, red_ch, red_z)
    value_cache: dict = {}

    def _fetch_dict(vals: dict) -> dict:
        """One device->host transfer for a whole family dict.

        Per-array np.asarray costs a full tunnel round-trip (~30 ms on the
        axon relay) x ~100 feature arrays; stacking on device first makes
        it a single readback."""
        names = list(vals)
        stacked = np.asarray(jnp.stack([vals[k] for k in names]))
        return {k: stacked[i] for i, k in enumerate(names)}

    def reduced_image(ch, red_z):
        key = ("img", ch, red_z)
        if key not in value_cache:
            value_cache[key] = np.stack(
                [
                    _reduce_z(np.asarray(pixels[f, ch], np.float32), red_z)
                    for f in range(F)
                ]
            )
        return value_cache[key]

    def family_values(inst):
        """Returns {name: (F, max_labels) ndarray} or ("scalar", (F, max_labels))."""
        if inst in value_cache:
            return value_cache[inst]
        if len(inst) == 3:
            ch, red_z, metric = inst
            if metric in _CP_FAMILY_KIND:
                kind = _CP_FAMILY_KIND[metric]
                kw_items = tuple(sorted(cpkw.get(metric, {}).items()))
                jitted = _jitted_family(kind, metric, max_labels, kw_items)
                if kind == "mask":
                    vals = jitted(jnp.asarray(labels))
                else:
                    img = reduced_image(ch, red_z)
                    vals = jitted(jnp.asarray(labels), jnp.asarray(img))
                out = _fetch_dict(vals)
            elif metric in cellfuns.MASK_METRICS:
                cached = value_cache.get(("maskfam",))
                if cached is None:
                    jitted = _jitted_family("mask_scalar", "", max_labels, ())
                    cached = _fetch_dict(jitted(jnp.asarray(labels)))
                    value_cache[("maskfam",)] = cached
                out = ("scalar", cached[metric])
            elif metric in cellfuns.PIXEL_METRICS:
                cache_key = ("pixfam", ch, red_z)
                cached = value_cache.get(cache_key)
                if cached is None:
                    img = reduced_image(ch, red_z)
                    jitted = _jitted_family("pixel_scalar", "", max_labels, ())
                    cached = _fetch_dict(
                        jitted(jnp.asarray(labels), jnp.asarray(img))
                    )
                    value_cache[cache_key] = cached
                out = ("scalar", cached[metric])
            elif metric in ("nuc_est_conv", "small_peaks_conv"):
                img = reduced_image(ch, red_z)
                jitted = _jitted_family("localisation", metric, max_labels, ())
                out = (
                    "scalar",
                    np.asarray(jitted(jnp.asarray(labels), jnp.asarray(img))),
                )
            elif metric in cellfuns.TRAP_METRICS:
                img = reduced_image(ch, red_z)
                jitted = _jitted_family("trap", "", max_labels, ())
                vals = jitted(jnp.asarray(labels), jnp.asarray(img))
                per_tile = np.asarray(vals[metric])  # (F,)
                out = ("scalar", np.repeat(per_tile[:, None], max_labels, axis=1))
            else:
                raise KeyError(f"Unknown metric {metric!r}")
        else:  # multi-channel: (pair, red_ch, red_z, metric)
            pair, red_ch, red_z, metric = inst
            c0, c1 = pair
            p0 = reduced_image(c0, red_z)
            p1 = reduced_image(c1, red_z)
            if red_ch in ("None", None):
                jitted = _jitted_family("corr", metric, max_labels, ())
                vals = jitted(
                    jnp.asarray(labels), jnp.asarray(p0), jnp.asarray(p1)
                )
                out = _fetch_dict(vals)
            else:
                combined = _combine_channels(p0, p1, red_ch)
                jitted = _jitted_family("pixel_scalar", "", max_labels, ())
                vals = jitted(
                    jnp.asarray(labels), jnp.asarray(np.nan_to_num(combined))
                )
                out = ("scalar", np.asarray(vals[metric]))
        value_cache[inst] = out
        return out

    results = []
    for (tile_i, label), inst in tileid_instructions:
        vals = family_values(inst)
        if isinstance(vals, tuple) and vals[0] == "scalar":
            results.append(float(vals[1][tile_i, label - 1]))
        else:
            results.append(
                {k: np.asarray([v[tile_i, label - 1]]) for k, v in vals.items()}
            )
    return tileid_instructions, results


def process_tree_masks_overlap(
    tree: dict,
    masks,
    pixels,
    ncores=None,
    cp_measure_kwargs: dict | None = None,
    progress_bar: bool = False,
    **kwargs,
):
    """BABY-style extraction over stacked, possibly-overlapping masks.

    ``masks`` is a per-tile list of (n_layers, Y, X) label stacks (BABY's
    layered output). Each (tile, layer) slice is relabeled sequentially and
    treated as a *virtual tile* by the same vectorized core as the mono
    path; the inverse label mappings ride along so formatting can restore
    BABY's original cell labels (reference ``extract.py:456-517``).

    Returns ``(tileid_instructions, results, inverse_mappings)`` with
    instruction ids ``((tile, stack, label), instruction)``.
    """
    del ncores, progress_bar
    from aliby_tpu.ops.labels import relabel_sequential as _relab

    pixels = np.asarray(pixels)
    if pixels.ndim == 6:
        pixels = pixels[0]

    virtual_ids: list[tuple[int, int]] = []
    v_labels: list[np.ndarray] = []
    inverse_mappings: dict[tuple[int, int], np.ndarray] = {}
    max_orig = 1
    for t, layered in enumerate(masks):
        layered = np.asarray(layered)
        if layered.ndim == 2:
            layered = layered[None]
        for s in range(layered.shape[0]):
            max_orig = max(max_orig, int(layered[s].max()))
    bucket = _max_labels_bucket(max_orig)
    for t, layered in enumerate(masks):
        layered = np.asarray(layered)
        if layered.ndim == 2:
            layered = layered[None]
        for s in range(layered.shape[0]):
            relab, fwd = _relab(
                jnp.asarray(layered[s].astype(np.int32)), bucket
            )
            virtual_ids.append((t, s))
            v_labels.append(np.asarray(relab))
            inverse_mappings[(t, s)] = np.asarray(fwd)

    v_pixels = np.stack([pixels[t] for t, _ in virtual_ids])
    instructions = kv(flatten(tree))
    v_instr, results = process_tree_masks(
        tree,
        v_labels,
        v_pixels,
        cp_measure_kwargs=cp_measure_kwargs,
    )
    # re-key (virtual_tile, label) -> (tile, stack, label)
    tileid_instructions = tuple(
        ((virtual_ids[v][0], virtual_ids[v][1], label), inst)
        for (v, label), inst in v_instr
    )
    del instructions
    return tileid_instructions, results, inverse_mappings


# ---------------------------------------------------------------------------
# Formatting (column contract of extract.py:520-599)
# ---------------------------------------------------------------------------


def format_extraction(instructions_result) -> pa.Table:
    if isinstance(instructions_result, np.ndarray):
        instructions_result = (
            ((("__", "__"),),),
            (instructions_result,),
        )
    rows: dict = {}
    metric_names: set = set()
    for inst, metrics in zip(*instructions_result, strict=True):
        tileid = inst[0][0]
        label = inst[0][-1]
        branch = "/".join(str(x) for x in inst[1])
        if isinstance(metrics, (int, float, np.integer, np.floating)):
            name = f"{branch}/{inst[1][-1]}"
            rows.setdefault((tileid, label), {})[name] = float(metrics)
            metric_names.add(name)
        elif isinstance(metrics, dict):
            for k, values in metrics.items():
                # When the family key repeats the metric name (coloc
                # families), collapse it: the documented column is
                # "(0, 3)/None/max/pearson" (examples/01:160-162), not
                # ".../pearson/pearson".
                name = branch if k == str(inst[1][-1]) else f"{branch}/{k}"
                for value in np.asarray(values).reshape(-1):
                    rows.setdefault((tileid, label), {})[name] = float(value)
                    metric_names.add(name)
        elif isinstance(metrics, np.ndarray):
            for (r, c), value in np.ndenumerate(metrics):
                name = f"X_{c}"
                rows.setdefault((r, 0), {})[name] = float(value)
                metric_names.add(name)
        else:
            raise Exception(
                f"the metrics are in an invalid value: {type(metrics)}. "
                "Valid values are int/float, dict or numpy array."
            )
    cols: dict = {"tile": [], "label": []}
    names = sorted(metric_names)
    for n in names:
        cols[n] = []
    for (tile, label), vals in rows.items():
        cols["tile"].append(tile)
        cols["label"].append(label)
        for n in names:
            cols[n].append(vals.get(n))
    return pa.Table.from_pydict(cols)


def format_extraction_overlap(instructions_result) -> pa.Table:
    """Wide table for overlap extraction; labels restored through the
    inverse mappings, metadata columns pre-renamed
    (reference ``extract.py:602-683``)."""
    instructions, results, inverse_mappings = instructions_result
    rows: dict = {}
    metric_names: set = set()
    for inst, metrics in zip(instructions, results, strict=True):
        tile, stack, label = inst[0]
        original = int(inverse_mappings[(tile, stack)][label])
        branch = "/".join(str(x) for x in inst[1])
        key = (tile, original)
        if isinstance(metrics, (int, float, np.integer, np.floating)):
            name = f"{branch}/{inst[1][-1]}"
            rows.setdefault(key, {})[name] = float(metrics)
            metric_names.add(name)
        elif isinstance(metrics, dict):
            for k, values in metrics.items():
                name = branch if k == str(inst[1][-1]) else f"{branch}/{k}"
                for value in np.asarray(values).reshape(-1):
                    rows.setdefault(key, {})[name] = float(value)
                    metric_names.add(name)
        elif isinstance(metrics, (list, np.ndarray)):
            name = f"{branch}/{inst[1][-1]}"
            for value in np.asarray(metrics).reshape(-1):
                rows.setdefault(key, {})[name] = float(value)
                metric_names.add(name)
    cols: dict = {"metadata_tile": [], "metadata_label": []}
    names = sorted(metric_names)
    for n in names:
        cols[n] = []
    for (tile, label), vals in rows.items():
        cols["metadata_tile"].append(tile)
        cols["metadata_label"].append(label)
        for n in names:
            cols[n].append(vals.get(n))
    return pa.Table.from_pydict(cols)
