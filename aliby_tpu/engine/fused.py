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


def compile_fused_step(objects: Sequence[FusedObject], max_labels: int = 256):
    plans = []
    for obj in objects:
        obj_plans = []
        for tree, cpkw in obj.trees:
            instructions = kv(flatten(tree))
            entries, slot_of, inst_lookup = compile_plan(instructions, cpkw or {})
            obj_plans.append((instructions, entries, slot_of, inst_lookup))
        plans.append(obj_plans)

    names_box: list = []

    @jax.jit
    def step(params_list, pixels):
        """pixels: (F, C, Z, Y, X) float32."""
        all_labels = []
        all_feats = []
        names_acc = []
        for oi, obj in enumerate(objects):
            main = pixels[:, obj.channel]
            main = main.max(axis=1)
            if obj.second_channel is not None:
                sec = pixels[:, obj.second_channel].max(axis=1)
            else:
                sec = jnp.zeros_like(main)
            images = jnp.stack([main, sec], axis=1)  # (F, 2, Y, X)
            # U-Net needs H/W divisible by 8 (3 pooling levels); pad + crop
            H, W = images.shape[-2:]
            ph, pw = (-H) % 8, (-W) % 8
            if ph or pw:
                images = jnp.pad(
                    images, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect"
                )
            labels = obj.engine._segment_all(params_list[oi], images)
            labels = labels[:, :H, :W]
            all_labels.append(labels)
            obj_feats = []
            obj_names = []
            for _insts, entries, slot_of, _lookup in plans[oi]:
                imgs = [None] * len(slot_of)
                for (ch, red_z), si in slot_of.items():
                    imgs[si] = jax.vmap(
                        lambda zyx: reduce_z_traced(zyx, red_z)
                    )(pixels[:, ch].astype(jnp.float32))
                names, arr = tree_collect(entries, labels, imgs, max_labels)
                obj_feats.append(arr)
                obj_names.append(names)
            all_feats.append(obj_feats)
            names_acc.append(obj_names)
        if not names_box:
            names_box.append(names_acc)
        return all_labels, all_feats

    def run(pixels):
        if not isinstance(pixels, jax.Array):
            # keep device arrays as-is: the mesh runner device_puts the
            # stacked batch with a dp-sharded layout before calling
            pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 6:
            pixels = pixels[0]
        params_list = [obj.engine.params for obj in objects]
        labels_dev, feats_dev = step(params_list, jnp.asarray(pixels))
        # two readbacks total: labels stack + one concatenated feature block
        labels = np.asarray(jnp.stack(labels_dev))
        flat_feats = [a for per_obj in feats_dev for a in per_obj]
        sizes = [a.shape[0] for a in flat_feats]
        big = np.asarray(jnp.concatenate(flat_feats, axis=0))
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

    run.plans = plans
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
