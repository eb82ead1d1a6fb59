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
import os
import time
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
    chunk: int | None = None,
) -> dict[str, tuple]:
    """Run every position through the mesh-sharded fused program.

    ``chunk`` batches that many TIMEPOINTS into each sharded dispatch
    (the mesh analogue of ``CompiledStep.run_movie``): a chunk's
    ``chunk x positions x tiles`` pixel block runs as ONE fused program,
    amortizing the per-dispatch floor + fixed stage costs over C x P
    fov-timepoints — the decisive batching for the reference's classic
    workload (a handful of positions x hundreds of timepoints). Stitch
    trackers run as one ``stitch_movie`` scan per (position, chunk) with
    state carried across chunks, bit-identical to the per-tp chain
    (tests/test_parallel.py pins mesh-chunked == single-device).
    ``chunk=None`` auto-sizes: 1 when the pipeline's trackers have no
    whole-movie form, else bounded by a ~32-tile dispatch and by
    pipelining granularity (at least two chunks in flight when ntps
    allows, so IO/bookkeeping still overlap device time).

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
    # ALIBY_MESH_TIMING=1: per-phase host wall-clock accounting (what the
    # single dispatch thread BLOCKS on — io waits, device_put, dispatch,
    # collect, bookkeeping, finalize), printed once per run. Threaded work
    # that overlaps device time does not show up here by design.
    timing = (
        {k: 0.0 for k in (
            "io_wait", "stack", "device_put", "dispatch", "collect",
            "bookkeep", "finalize",
        )}
        if os.environ.get("ALIBY_MESH_TIMING")
        else None
    )

    def _timed(key, fn, *a, **kw):
        if timing is None:
            return fn(*a, **kw)
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            timing[key] += time.perf_counter() - t0

    def submit_io(tp):
        # one future per position, NOT pool.map inside pool.submit (a
        # nested map can deadlock a bounded pool)
        return [pool.submit(lambda e=e: e["tiler"].run_tp(tp)) for e in entries]

    def fetch_tp(futs):
        """Block on one tp's IO; return (per-pos tile_results, (P*F,...)
        stacked pixel block, F)."""
        tile_results = [f.result() for f in futs]
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
        return tile_results, np.concatenate(pixel_blocks, axis=0), n_tiles[0]

    n_pos = len(entries)

    def bookkeep_chunk(ch, per_tp_tiles, out, F, use_scan_tracker):
        """Split one chunk's results back per (tp, position) and run the
        identical CompiledStep bookkeeping; stitch trackers run as one
        ``stitch_movie`` scan per (tracker, position) with state carried
        across chunks (exactly ``CompiledStep.run_movie``'s scheme)."""
        tc = len(ch)
        PF = n_pos * F
        out = {
            "labels": [np.asarray(lbl) for lbl in out["labels"]],
            "features": [
                [(names, np.asarray(arr)) for names, arr in per_obj]
                for per_obj in out["features"]
            ],
        }
        overrides = [[None] * n_pos for _ in range(tc)]
        if compiled.tracker_specs and use_scan_tracker:
            import functools

            import jax
            import jax.numpy as jnp

            from aliby_tpu.track.trackers import stitch_movie

            for tr_name, (src, _kind, kw) in compiled.tracker_specs.items():
                oi = compiled.seg_names.index(src)
                lab = out["labels"][oi]
                lab_tpf = lab[: tc * PF].reshape(
                    (tc, n_pos, F) + lab.shape[1:]
                )
                init_lab = np.zeros((n_pos, F) + lab.shape[1:], np.int32)
                init_max = np.zeros((n_pos, F), np.int32)
                has_init = np.zeros((n_pos,), bool)
                for i, e in enumerate(entries):
                    prev = e["state"]["data"].get(tr_name, [])
                    if prev:
                        init_lab[i] = np.stack(
                            [np.asarray(m, np.int32) for m in prev[-1]["labels"]]
                        )
                        init_max[i] = np.asarray(prev[-1]["max_label"], np.int32)
                        has_init[i] = True
                # ONE dispatch: every position's whole-chunk scan, vmapped
                # over the position axis (P separate stitch_movie calls
                # would each pay the tunnel's per-dispatch floor)
                g_ptf, m_ptf = jax.vmap(
                    functools.partial(stitch_movie, **kw)
                )(
                    jnp.asarray(
                        np.moveaxis(lab_tpf, 0, 1).astype(np.int32)
                    ),  # (P, tc, F, Y, X)
                    jnp.asarray(init_lab),
                    jnp.asarray(init_max),
                    jnp.asarray(has_init),
                )
                g_ptf = np.asarray(g_ptf)
                m_ptf = np.asarray(m_ptf)
                for i in range(n_pos):
                    for k in range(tc):
                        ov = overrides[k][i] = overrides[k][i] or {}
                        ov[tr_name] = {
                            "labels": [g_ptf[i, k, f] for f in range(F)],
                            "max_label": [
                                int(m_ptf[i, k, f]) for f in range(F)
                            ],
                        }

        def ingest(ie):
            i, e = ie
            steps_dir = output_path / "steps" / e["pos"]["key"]
            for k, tp in enumerate(ch):  # tps in order per position
                sl = slice(k * PF + i * F, k * PF + (i + 1) * F)
                per_pos = {
                    "labels": [lbl[sl] for lbl in out["labels"]],
                    "features": [
                        [(names, arr[:, sl]) for names, arr in per_obj]
                        for per_obj in out["features"]
                    ],
                }
                compiled.run_tp(
                    tp, e["tiler"], e["state"], e["pipeline"], steps_dir,
                    tile_result=per_tp_tiles[k][i], out=per_pos,
                    tracker_override=overrides[k][i],
                )

        list(pool.map(ingest, enumerate(entries)))

    try:
        io_futs = {0: submit_io(0)}
        fetched = {0: _timed("io_wait", fetch_tp, io_futs.pop(0))}
        F = fetched[0][2]
        if chunk is None:
            if ntps <= 1 or not compiled.movie_capable():
                C = 1
            else:
                # bound the dispatch at ~32 tiles (VMEM/HBM headroom;
                # past that the per-dispatch floor is already <15% of the
                # step), keep >= 2 chunks in flight so IO/bookkeeping still
                # pipeline against device time, and balance the chunks (a
                # [5, 1] split compiles two batch shapes and starves the
                # pipeline's tail)
                c0 = max(1, min(8, ntps, 32 // max(1, n_pos * F)))
                nchunks = max(2, -(-ntps // c0))
                C = -(-ntps // nchunks)
        else:
            C = max(1, int(chunk))
            if C > 1 and not compiled.movie_capable():
                logger.warning(
                    "chunk=%d requested but a tracker lacks a whole-movie "
                    "form; running chunk=1",
                    C,
                )
                C = 1
        use_scan_tracker = C > 1
        chunks = [
            list(range(i, min(i + C, ntps))) for i in range(0, ntps, C)
        ]
        pending = None  # (chunk_tps, per_tp_tiles, handle) awaiting readback
        for ci, ch in enumerate(chunks):
            for tp in ch:
                if tp not in fetched and tp not in io_futs:
                    io_futs[tp] = submit_io(tp)
            per_tp_tiles, blocks = [], []
            for tp in ch:
                if tp not in fetched:
                    fetched[tp] = _timed("io_wait", fetch_tp, io_futs.pop(tp))
                tr, blk, f_tp = fetched.pop(tp)
                if f_tp != F:
                    raise ValueError(
                        f"tile count changed across tps: {f_tp} != {F}"
                    )
                per_tp_tiles.append(tr)
                blocks.append(blk)
            if len(ch) < C and ci > 0:
                # ragged tail: pad to the compiled chunk shape by repeating
                # the last block; padded rows are never ingested
                blocks += [blocks[-1]] * (C - len(ch))
            flat = _timed(
                "stack", np.concatenate, blocks, axis=0
            )  # (C*P*F, Ch, Z, Y, X)
            pad = (-flat.shape[0]) % dp
            if pad:
                flat = np.concatenate(
                    [flat, np.repeat(flat[:1], pad, axis=0)], axis=0
                )
            flat = _timed("device_put", jax.device_put, flat, sharding)
            # ONE sharded async dispatch for the whole chunk; the previous
            # chunk's bookkeeping (and the next chunk's IO) overlap this
            # chunk's device time — the host only blocks on the buffers at
            # the NEXT iteration's collect (engine/fused.py dispatch/collect
            # split)
            handle = _timed("dispatch", compiled.fused.dispatch, flat)
            if ci + 1 < len(chunks):
                for tp in chunks[ci + 1]:
                    io_futs[tp] = submit_io(tp)
            if pending is not None:
                p_ch, p_tiles, p_handle = pending
                out = _timed("collect", compiled.fused.collect, p_handle)
                _timed(
                    "bookkeep", bookkeep_chunk, p_ch, p_tiles, out, F,
                    use_scan_tracker,
                )
            pending = (ch, per_tp_tiles, handle)
        if pending is not None:
            p_ch, p_tiles, p_handle = pending
            out = _timed("collect", compiled.fused.collect, p_handle)
            _timed(
                "bookkeep", bookkeep_chunk, p_ch, p_tiles, out, F,
                use_scan_tracker,
            )

        results = {}
        t_fin = time.perf_counter()
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
        if timing is not None:
            timing["finalize"] = time.perf_counter() - t_fin
            total = sum(timing.values())
            logger.warning(
                "mesh timing (dispatch-thread blocking, %d tps x %d pos): "
                "%s; accounted %.3fs",
                ntps, len(entries),
                " ".join(f"{k}={v:.3f}s" for k, v in timing.items()),
                total,
            )
    finally:
        pool.shutdown(wait=False)
    return results
