"""Fused whole-step programs: segmentation + every feature tree in ONE
executable.

The dict-programmed engine runs each step as its own device call — fine on
local hardware, but every dispatch/readback costs a tunnel round-trip on
remote-attached chips. This module compiles the entire per-timepoint
compute — N segmenters and all their extraction trees, batched over the
tile axis F (monotile Cell Painting and F>1 trap grids alike) — into a
single jitted program: one upload of the pixel block, one readback of
(labels + every feature value).

Usage:
    step = compile_fused_step([
        FusedObject(engine, main_ch, second_ch, [(mono_tree, cpkw), ...]),
        ...
    ])
    out = step(pixels)   # {"labels": [(F,Y,X) per object],
                         #  "features": [[(names, (n,F,L) array), ...] per object]}

The per-object results convert back into the reference's
``(instructions, results)`` structure with :func:`results_from_fused`, so
``format_extraction`` / ``get_profiles_from_state`` work unchanged.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aliby_tpu.extract.extract import (
    compile_plan,
    flatten,
    kv,
    reduce_z_traced,
    tree_collect,
)


@dataclass
class FusedObject:
    engine: object  # CellposeTPU (or anything with ._segment_all + .params)
    channel: int
    second_channel: int | None
    trees: Sequence[tuple[dict, dict | None]]  # [(tree, cp_measure_kwargs)]


def compile_fused_step(
    objects: Sequence[FusedObject],
    max_labels: int = 256,
    out_labels_cap: int = 64,
):
    """``out_labels_cap`` bounds the label axis of the feature TREES —
    both their compute width and the readback: the one-hot tables / wide
    segment reductions are linear in the label axis and the full-bank
    readback block is ~(1000 names, F, 256) f32 ≈ 8 MB (~100 ms at the
    tunnel's ~80 MB/s D2H), yet typical fields carry a few dozen objects.
    Segmentation itself always labels at ``max_labels`` (so the realized
    object count is faithful); the runner checks the realized max label
    on the (always full) labels readback and, on overflow, rebuilds the
    step at full width, reruns, and stays wide (one extra compile on
    pathological plates, never a wrong result — a narrow pass is only
    ever used when every label fits, where it is exact)."""
    if not (0 < max_labels <= 65535):
        # the widest readback dtype is uint16; labels above 65535 would wrap
        raise ValueError(f"max_labels must be in [1, 65535], got {max_labels}")
    plans = []
    for obj in objects:
        obj_plans = []
        for tree, cpkw in obj.trees:
            instructions = kv(flatten(tree))
            entries, slot_of, inst_lookup = compile_plan(instructions, cpkw or {})
            obj_plans.append((instructions, entries, slot_of, inst_lookup))
        plans.append(obj_plans)

    # Objects sharing ONE engine instance (dispatch_segmenter memoizes
    # engines by configuration) segment as a single concatenated batch: the
    # dynamics stages (diffusion / pointer doubling / corridor expansion /
    # QC) are long chains of small sequential kernels, so k objects through
    # one (k*F, ...) call cost ~1/k of k separate calls.
    seg_groups: list[list[int]] = []
    _group_of: dict[int, int] = {}
    for oi, obj in enumerate(objects):
        key = id(obj.engine)
        if key in _group_of:
            seg_groups[_group_of[key]].append(oi)
        else:
            _group_of[key] = len(seg_groups)
            seg_groups.append([oi])

    # Trees with identical compiled plans (same entries + image slots) are
    # likewise evaluated once over the objects' concatenated label stacks —
    # the per-family scatters/sorts run on (k*F, ...) instead of k times.
    tree_groups: dict[tuple, list[tuple[int, int]]] = {}
    for oi, obj_plans in enumerate(plans):
        for ti, (_insts, entries, slot_of, _lookup) in enumerate(obj_plans):
            key = (
                tuple(entries),
                tuple(sorted(slot_of.items(), key=lambda item: item[1])),
            )
            tree_groups.setdefault(key, []).append((oi, ti))

    names_box: list = []

    def _make_step(cap: int, u8: bool):
        return jax.jit(functools.partial(_step_impl, cap, u8))

    def _step_impl(cap, u8, params_list, pixels):
        """pixels: (F, C, Z, Y, X) float32."""
        F = pixels.shape[0]

        def obj_images(obj):
            main = pixels[:, obj.channel].max(axis=1)
            if obj.second_channel is not None:
                sec = pixels[:, obj.second_channel].max(axis=1)
            else:
                sec = jnp.zeros_like(main)
            return jnp.stack([main, sec], axis=1)  # (F, 2, Y, X)

        all_labels: list = [None] * len(objects)
        for group in seg_groups:
            engine = objects[group[0]].engine
            images = jnp.concatenate([obj_images(objects[oi]) for oi in group])
            # U-Net needs H/W divisible by 8 (3 pooling levels); pad + crop
            H, W = images.shape[-2:]
            ph, pw = (-H) % 8, (-W) % 8
            if ph or pw:
                images = jnp.pad(
                    images, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect"
                )
            labels = engine._segment_all(params_list[group[0]], images)
            labels = labels[:, :H, :W]
            for k, oi in enumerate(group):
                all_labels[oi] = labels[k * F : (k + 1) * F]

        slot_cache: dict = {}

        def slot_img(ch, red_z):
            if (ch, red_z) not in slot_cache:
                slot_cache[(ch, red_z)] = jax.vmap(
                    lambda zyx: reduce_z_traced(zyx, red_z)
                )(pixels[:, ch].astype(jnp.float32))
            return slot_cache[(ch, red_z)]

        all_feats: list = [
            [None] * len(obj.trees) for obj in objects
        ]
        names_acc: list = [[None] * len(obj.trees) for obj in objects]
        for members in tree_groups.values():
            oi0, ti0 = members[0]
            _insts, entries, slot_of, _lookup = plans[oi0][ti0]
            imgs = [None] * len(slot_of)
            for (ch, red_z), si in slot_of.items():
                imgs[si] = slot_img(ch, red_z)
            k = len(members)
            labels_cat = jnp.concatenate([all_labels[oi] for oi, _ in members])
            imgs_cat = [
                (jnp.concatenate([im] * k) if k > 1 else im) for im in imgs
            ]
            # feature trees run at the STICKY width ``cap``, not the full
            # max_labels: the one-hot tables / wide segment reductions are
            # linear in the label axis, and typical fields carry a few
            # dozen objects against a 256-slot bound. When the realized
            # lmax exceeds cap, collect() discards this pass and reruns at
            # full width (the same rebuild that already guards the
            # readback crop), so a narrow result is only ever USED when
            # every label fits — where it is exact.
            names, arr = tree_collect(entries, labels_cat, imgs_cat, cap)
            for j, (oi, ti) in enumerate(members):
                all_feats[oi][ti] = arr[:, j * F : (j + 1) * F]
                names_acc[oi][ti] = names
        if not names_box:
            names_box.append(names_acc)
        # Pack the outputs INSIDE the program: the tunnel-attached chip
        # pays a ~28 ms dispatch floor per jit call after any D2H, so a
        # host-side jnp.stack / jnp.concatenate would each cost a full
        # extra dispatch. Labels read back uint8 (typical fields carry a
        # few dozen objects — half uint16's bytes at ~80 MB/s tunnel D2H)
        # guarded by an in-program max: the runner checks it and rebuilds
        # uint16 (sticky) on >255-object tiles, never a wrong result.
        labels_pack = jnp.stack(all_labels)
        lmax = jnp.max(labels_pack).astype(jnp.int32)
        labels_pack = labels_pack.astype(jnp.uint8 if u8 else jnp.uint16)
        feats_pack = jnp.concatenate(
            [a for per_obj in all_feats for a in per_obj], axis=0
        )  # already cap-wide: trees compute at the sticky width
        return labels_pack, feats_pack, lmax

    cap0 = min(max(1, out_labels_cap), max_labels)
    state = {"cap": cap0, "u8": True, "step": _make_step(cap0, True)}

    def dispatch(pixels):
        """Phase 1: enqueue the fused program; returns an async handle.

        JAX dispatch is asynchronous — the device computes while the host
        does other work (the mesh runner books tp-1's results during tp's
        device time). ``collect`` blocks on the handle's buffers only."""
        if not isinstance(pixels, jax.Array):
            # keep device arrays as-is: the mesh runner device_puts the
            # stacked batch with a dp-sharded layout before calling
            pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 6:
            pixels = pixels[0]
        params_list = [obj.engine.params for obj in objects]
        pixels = jnp.asarray(pixels)
        labels_pack, feats_pack, lmax = state["step"](params_list, pixels)
        return pixels, labels_pack, feats_pack, lmax

    def collect(handle):
        """Phase 2: read back + unpack one dispatch's results."""
        pixels, labels_pack, feats_pack, lmax = handle
        params_list = [obj.engine.params for obj in objects]
        # one readback batch (stack/concat happen in-program — no extra
        # host-side dispatches): labels (uint8) + feature block + max
        labels_pack, big, lmax = jax.device_get(
            (labels_pack, feats_pack, lmax)
        )
        if int(lmax) > state["cap"] or (state["u8"] and int(lmax) > 255):
            # realized objects exceed the readback cap (or the uint8 label
            # range): rebuild at full width/uint16 and STAY there (sticky;
            # one recompile per fused step, never a wrong result)
            state["cap"] = max_labels if int(lmax) > state["cap"] else state["cap"]
            state["u8"] = state["u8"] and int(lmax) <= 255
            state["step"] = _make_step(state["cap"], state["u8"])
            labels_pack, feats_pack, lmax = state["step"](params_list, pixels)
            labels_pack, big, lmax = jax.device_get(
                (labels_pack, feats_pack, lmax)
            )
        labels = labels_pack.astype(np.int32)
        sizes = [
            len(names_box[0][oi][ti])
            for oi, obj in enumerate(objects)
            for ti in range(len(obj.trees))
        ]
        feats = []
        off = 0
        for n in sizes:
            feats.append(big[off : off + n])
            off += n
        # regroup per object
        out_feats = []
        i = 0
        for oi, obj in enumerate(objects):
            per_obj = []
            for ti in range(len(obj.trees)):
                per_obj.append((names_box[0][oi][ti], feats[i]))
                i += 1
            out_feats.append(per_obj)
        return {"labels": list(labels), "features": out_feats}

    def run(pixels):
        return collect(dispatch(pixels))

    run.plans = plans
    run.dispatch = dispatch
    run.collect = collect
    return run


def results_from_fused(
    plan, names: list[str], arr: np.ndarray, labels: np.ndarray
):
    """Convert one tree's fused output back to the reference structure
    ``(tileid_instructions, results)`` (see ``process_tree_masks``).

    Returns a lazy :class:`~aliby_tpu.extract.extract.FusedTreeResult`:
    unpacking materializes the per-object rows; ``format_extraction``
    builds the wide table directly from the array (no per-row Python)."""
    from aliby_tpu.extract.extract import FusedTreeResult

    instructions, _entries, _slot_of, inst_lookup = plan
    labels = np.asarray(labels)
    F = labels.shape[0]
    n_per_tile = [int(labels[f].max()) for f in range(F)]
    return FusedTreeResult(
        instructions, inst_lookup, names, np.asarray(arr), n_per_tile
    )
