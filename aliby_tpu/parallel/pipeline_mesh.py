"""Mesh-parallel pipeline execution: many positions, ONE sharded dispatch.

``parallel/positions.py`` scales by threads + per-device round-robin (the
reference's process fan-out, SURVEY §2.9). This module is the SPMD path
(VERDICT r1 item 6): per timepoint, every position's pixel block is stacked
into one flat tile batch, device_put with the batch axis sharded over the
mesh's ``dp`` axis, and the whole fused per-tp program (segmentation +
every extraction tree, ``engine/fused.py``) runs as ONE jitted dispatch —
XLA partitions it across chips; no NCCL/MPI analogue, no per-position
processes. Host-side tiling/IO overlaps in threads; results are split back
per position and flow through the identical CompiledStep bookkeeping, so
profiles are bit-identical to the single-device path.

Positions must share the fused-eligible pipeline shape (same tile grid
size across positions — true for plate screens and fixed trap layouts);
ineligible configurations fall back to ``run_positions``.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aliby_tpu.engine.compiled import try_compile
from aliby_tpu.engine.core import finalize_position, validate_pipeline
from aliby_tpu.parallel.positions import run_positions, stamp_image_kwargs
from aliby_tpu.utils.timer import StepTimer

logger = logging.getLogger("aliby_tpu")


def run_positions_mesh(
    base_pipeline: dict,
    positions: Sequence[dict],
    output_path: str | Path,
    regex: str | None = None,
    capture_order: str | None = None,
    mesh: Mesh | None = None,
    overwrite: bool = False,
) -> dict[str, tuple]:
    """Run every position through the mesh-sharded fused program.

    Returns {position_key: (profiles, post_results)} like run_positions.
    """
    from aliby_tpu.pipe import init_step

    if mesh is None:
        from aliby_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    dp = mesh.shape["dp"]
    output_path = Path(output_path)

    # per-position setup (host): stamp, validate, skip-if-done, tiler init
    entries = []
    for pos in positions:
        pipeline = stamp_image_kwargs(
            base_pipeline, pos, regex=regex, capture_order=capture_order
        )
        validate_pipeline(pipeline)
        profiles_file = output_path / "profiles" / f"{pos['key']}.parquet"
        if profiles_file.exists() and not overwrite:
            logger.info("Skipping %s", pos["key"])
            continue
        tiler = init_step("tile", pipeline["steps"]["tile"], {})
        entries.append({"pos": pos, "pipeline": pipeline, "tiler": tiler})
    if not entries:
        return {}

    compiled = try_compile(entries[0]["pipeline"], entries[0]["tiler"], init_step)
    if compiled is None:
        logger.warning(
            "pipeline not fused-eligible; falling back to threaded positions"
        )
        return run_positions(
            base_pipeline, positions, output_path, regex=regex,
            capture_order=capture_order, overwrite=overwrite,
        )

    for e in entries:
        e["state"] = {
            "tps": {n: 0 for n in e["pipeline"]["steps"]},
            "data": {},
            "fn": {"tile": e["tiler"]},
            "timer": StepTimer(),
        }

    sharding = NamedSharding(mesh, P("dp"))
    ntps = base_pipeline.get("ntps", 1)
    pool = ThreadPoolExecutor(max_workers=min(8, max(2, len(entries))))

    def submit_io(tp):
        # one future per position, NOT pool.map inside pool.submit (a
        # nested map can deadlock a bounded pool)
        return [pool.submit(lambda e=e: e["tiler"].run_tp(tp)) for e in entries]

    def bookkeep_tp(tp, tile_results, out, F):
        # split results back per position; bookkeeping is independent
        # per position (own state dict, own steps_dir)
        def bookkeep(i, e):
            sl = slice(i * F, (i + 1) * F)
            per_pos = {
                "labels": [lbl[sl] for lbl in out["labels"]],
                "features": [
                    [(names, arr[:, sl]) for names, arr in per_obj]
                    for per_obj in out["features"]
                ],
            }
            steps_dir = output_path / "steps" / e["pos"]["key"]
            compiled.run_tp(
                tp, e["tiler"], e["state"], e["pipeline"], steps_dir,
                tile_result=tile_results[i], out=per_pos,
            )

        list(pool.map(lambda ie: bookkeep(*ie), enumerate(entries)))

    try:
        io_futs = submit_io(0)
        pending = None  # (tp, tile_results, handle, F) awaiting readback
        for tp in range(ntps):
            tile_results = [f.result() for f in io_futs]
            pixel_blocks = [tr.pop("pixels") for tr in tile_results]
            pixel_blocks = [
                np.asarray(pb, np.float32)[0] if np.asarray(pb).ndim == 6
                else np.asarray(pb, np.float32)
                for pb in pixel_blocks
            ]
            n_tiles = [pb.shape[0] for pb in pixel_blocks]
            if len(set(n_tiles)) != 1:
                raise ValueError(
                    f"mesh batching needs equal tile counts; got {n_tiles}"
                )
            flat = np.concatenate(pixel_blocks, axis=0)  # (P*F, C, Z, Y, X)
            pad = (-flat.shape[0]) % dp
            if pad:
                flat = np.concatenate(
                    [flat, np.repeat(flat[:1], pad, axis=0)], axis=0
                )
            flat = jax.device_put(flat, sharding)
            # ONE sharded async dispatch for all positions; tp-1's
            # bookkeeping (and tp+1's IO) then overlap tp's device time —
            # the host only blocks on tp's buffers at the NEXT iteration's
            # collect (engine/fused.py dispatch/collect split)
            handle = compiled.fused.dispatch(flat)
            if tp + 1 < ntps:
                io_futs = submit_io(tp + 1)
            if pending is not None:
                p_tp, p_tiles, p_handle, p_F = pending
                bookkeep_tp(p_tp, p_tiles, compiled.fused.collect(p_handle), p_F)
            pending = (tp, tile_results, handle, n_tiles[0])
        if pending is not None:
            p_tp, p_tiles, p_handle, p_F = pending
            bookkeep_tp(p_tp, p_tiles, compiled.fused.collect(p_handle), p_F)

        results = {}
        for e, prof in zip(
            entries,
            pool.map(
                lambda e: finalize_position(
                    e["state"], e["pipeline"], e["pos"]["key"], output_path,
                    init_step, post_state_hook=None,
                ),
                entries,
            ),
        ):
            results[e["pos"]["key"]] = prof
    finally:
        pool.shutdown(wait=False)
    return results
