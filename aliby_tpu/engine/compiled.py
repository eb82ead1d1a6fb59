"""Opt-in compiled execution of standard pipelines.

``pipeline["compiled"] = True`` asks the engine to run the per-timepoint
compute through ONE fused device program (``engine.fused``) instead of
step-by-step dispatch. Eligible pipelines: a ``tile`` step (monotile or
F>1 trap grid — the fused program batches over tiles), local ``cellpose``
segment steps fed by ``passed_methods`` pixels, and ``extract*`` steps fed
masks from those segmenters — i.e. exactly what
``pipe_builder.build_pipeline_steps`` emits. Ineligible pipelines fall back
to the interpreted step loop transparently.

State layout, saves, profiles and post-processing are identical to the
interpreted path — only the dispatch granularity changes.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("aliby_tpu")


_COMPILED_CACHE: dict = {}


def _pipeline_signature(pipeline: dict) -> str:
    """Position-independent signature: everything try_compile consumes
    except the tile step's ``image_kwargs`` (the only per-position stamp).
    Positions of one plate share the fused program instead of re-tracing
    it (tracing the full default bank costs ~10-30 s host time each)."""
    steps = {
        name: {k: v for k, v in params.items() if k != "image_kwargs"}
        for name, params in pipeline["steps"].items()
    }
    return repr(
        (
            sorted((n, repr(p)) for n, p in steps.items()),
            repr(pipeline.get("passed_methods", {})),
            repr(pipeline.get("passed_data", {})),
        )
    )


def try_compile(pipeline: dict, tiler, init_step_fn) -> "CompiledStep | None":
    sig = _pipeline_signature(pipeline)
    if sig in _COMPILED_CACHE:
        return _COMPILED_CACHE[sig]
    compiled = _try_compile_uncached(pipeline, tiler, init_step_fn)
    if len(_COMPILED_CACHE) < 16:  # bounded; plates reuse one entry
        _COMPILED_CACHE[sig] = compiled
    return compiled


def _try_compile_uncached(
    pipeline: dict, tiler, init_step_fn
) -> "CompiledStep | None":
    steps = pipeline["steps"]
    seg_names = [n for n in steps if n.startswith("segment")]
    ext_names = [n for n in steps if n.startswith("extract")]
    track_names = [
        n for n in steps if n.startswith("track") and not n.startswith("track_global")
    ]
    if not seg_names or not ext_names:
        return None
    # CompiledStep.run_tp executes ONLY these step families; any other
    # per-tp step (embed*, nahual_*, ...) would be silently skipped and its
    # state/profile columns lost — refuse, fall back to interpretation.
    covered = {"tile", *seg_names, *ext_names, *track_names}
    uncovered = [n for n in steps if n not in covered]
    if uncovered:
        logger.warning(
            "compiled mode unavailable (steps not coverable: %s); interpreting",
            uncovered,
        )
        return None
    passed_methods = pipeline.get("passed_methods", {})
    passed_data = pipeline.get("passed_data", {})
    from aliby_tpu.engine.fused import FusedObject, compile_fused_step
    from aliby_tpu.models.segment import dispatch_segmenter

    objects = []
    ext_of_seg: dict[str, list[str]] = {n: [] for n in seg_names}
    try:
        for seg_name in seg_names:
            params = steps[seg_name]
            kind = params.get("segmenter_kwargs", {}).get("kind", "cellpose")
            if kind not in ("cellpose", "cellpose_tpu"):
                return None
            if passed_methods.get(seg_name, (None,))[0] != "tile":
                return None
        for ext_name in ext_names:
            deps = dict(
                (kwd, src) for kwd, src, *_ in passed_data.get(ext_name, ())
            )
            if deps.get("pixels") != "tile" or deps.get("masks") not in seg_names:
                return None
            ext_of_seg[deps["masks"]].append(ext_name)
        # per-tp trackers: host-orchestrated around the fused program
        # (their IoU core is itself jitted)
        trackers = {}
        tracker_specs = {}
        for tr_name in track_names:
            deps = dict(
                (kwd, src) for kwd, src, *_ in passed_data.get(tr_name, ())
            )
            src = deps.get("masks")
            if src not in seg_names:
                return None
            from aliby_tpu.track.dispatch import dispatch_tracker

            trackers[tr_name] = (src, dispatch_tracker(**steps[tr_name]))
            spec = dict(steps[tr_name])
            tracker_specs[tr_name] = (
                src,
                spec.get("kind", "stitch"),
                {
                    k: spec[k]
                    for k in ("iou_threshold", "max_labels")
                    if k in spec
                },
            )
        for seg_name in seg_names:
            params = steps[seg_name]
            seg_kwargs = dict(params.get("segmenter_kwargs", {}))
            seg_kwargs.pop("kind", None)
            seg = dispatch_segmenter(
                "cellpose",
                channel_to_segment=params["channel_to_segment"],
                **seg_kwargs,
            )
            trees = []
            for ext_name in ext_of_seg[seg_name]:
                spec = steps[ext_name]
                cpkw = spec.get("kwargs", {}).get("cp_measure_kwargs")
                trees.append((spec["tree"], cpkw))
            objects.append(
                FusedObject(
                    seg.engine,
                    params["channel_to_segment"],
                    seg_kwargs.get("second_channel"),
                    trees,
                )
            )
        fused = compile_fused_step(objects)
    except Exception as e:
        logger.warning("compiled mode unavailable (%s); interpreting", e)
        return None
    return CompiledStep(fused, seg_names, ext_of_seg, trackers, tracker_specs)


class CompiledStep:
    """Drop-in per-timepoint runner producing interpreted-identical state."""

    def __init__(self, fused, seg_names, ext_of_seg, trackers=None,
                 tracker_specs=None):
        self.fused = fused
        self.seg_names = seg_names
        self.ext_of_seg = ext_of_seg
        self.trackers = trackers or {}
        self.tracker_specs = tracker_specs or {}

    def run_tp(
        self, tp: int, tiler, state: dict, pipeline: dict, steps_dir,
        tile_result: dict | None = None, out: dict | None = None,
        tracker_override: dict | None = None,
    ) -> None:
        """One timepoint. ``tile_result``/``out`` may be precomputed by a
        batching caller (the mesh runner stacks many positions into one
        sharded fused dispatch and splits the results back per position)."""
        from aliby_tpu.engine.fused import results_from_fused
        from aliby_tpu.io.write import dispatch_write_fn

        if tile_result is None:
            tile_result = tiler.run_tp(tp)
        pixels = tile_result.pop("pixels", None)
        if out is None:
            out = self.fused(pixels)
        save_list = pipeline.get("save") or []
        save_interval = pipeline.get("save_interval", 1)

        def maybe_save(name, result):
            if save_list and (tp % save_interval) == 0 and name in save_list:
                dispatch_write_fn(name)(
                    result, steps_dir=steps_dir, subpath=name, tp=tp
                )

        maybe_save("tile", tile_result)
        state["data"].setdefault("tile", []).append(tile_result)
        state["tps"]["tile"] = tp + 1
        for oi, seg_name in enumerate(self.seg_names):
            labels = out["labels"][oi]
            masks = [m.astype(np.uint16) for m in labels]
            maybe_save(seg_name, masks)
            state["data"].setdefault(seg_name, []).append(masks)
            state["tps"][seg_name] = tp + 1
            for ti, ext_name in enumerate(self.ext_of_seg[seg_name]):
                res = results_from_fused(
                    self.fused.plans[oi][ti],
                    *out["features"][oi][ti],
                    labels,
                )
                state["data"].setdefault(ext_name, []).append(res)
                state["tps"][ext_name] = tp + 1
                # pre-format this tp's wide profile table now (bookkeeping
                # overlaps device time) instead of in the finalize tail
                from aliby_tpu.engine.core import cache_profile_table

                cache_profile_table(state, pipeline, ext_name)
        for tr_name, (src, tracker) in self.trackers.items():
            if tracker_override is not None and tr_name in tracker_override:
                result = tracker_override[tr_name]
            else:
                history = state["data"].get(src, [])
                recent = history[-2:]
                n_tiles = len(recent[-1])
                tile_major = [
                    [tp_tiles[t] for tp_tiles in recent] for t in range(n_tiles)
                ]
                prev = state["data"].get(tr_name, [])
                result = tracker(tile_major, state=prev[-1] if prev else None)
            maybe_save(tr_name, result)
            state["data"].setdefault(tr_name, []).append(result)
            state["tps"][tr_name] = tp + 1
        # retain trimming (same semantics as the interpreted loop)
        for step_name, history in state["data"].items():
            keep = pipeline.get("retain", {}).get(step_name, "all")
            if isinstance(keep, int) and keep >= 0 and len(history) > keep:
                del history[: len(history) - keep]

    def movie_capable(self) -> bool:
        """Movie batching needs every tracker to be the stitch kind (its
        scan is the only one with a compiled whole-movie form)."""
        return all(
            kind == "stitch" for _, kind, _ in self.tracker_specs.values()
        )

    def run_movie(
        self, tps, tiler, state: dict, pipeline: dict, steps_dir,
        monitor=None, chunk: int | None = None,
        chunk_budget_bytes: int = 512 << 20,
    ) -> bool:
        """Run many timepoints through CHUNKED whole-movie dispatches
        (SURVEY §5.7): T timepoints' tiles are batched into one fused
        segmentation+extraction call per chunk, and stitch tracking runs
        as one lax.scan-over-T dispatch per chunk carrying
        {labels, max_label} across chunks — instead of one dispatch (and
        one tracker round-trip) per timepoint. Host IO (tiler.run_tp,
        drift bookkeeping) stays sequential; state, saves, retain and
        profiles are bit-identical to the per-tp path (pinned by
        tests/test_movie_mode.py). Short chunks are padded by repeating
        the last frame (one trace per chunk size, discarded on ingest).

        Returns True if the early-stop monitor fired.
        """
        import jax.numpy as jnp

        from aliby_tpu.track.trackers import stitch_movie

        tps = list(tps)
        i = 0
        while i < len(tps):
            if chunk is None:
                # first tile fetch sizes the chunk to a device-RAM budget
                probe = tiler.run_tp(tps[i])
                probe_px = np.asarray(probe.pop("pixels"), np.float32)
                if probe_px.ndim == 6:
                    probe_px = probe_px[0]
                chunk = max(
                    1,
                    min(16, chunk_budget_bytes // probe_px.nbytes, len(tps)),
                )
                pending = [(tps[i], probe, probe_px)]
                i += 1
            else:
                pending = []
            while len(pending) < chunk and i < len(tps):
                tr = tiler.run_tp(tps[i])
                px = np.asarray(tr.pop("pixels"), np.float32)
                if px.ndim == 6:
                    px = px[0]
                pending.append((tps[i], tr, px))
                i += 1
            tc = len(pending)
            pad = chunk - tc
            stacked = np.stack(
                [px for _, _, px in pending] + [pending[-1][2]] * pad
            )  # (chunk, F, C, Z, Y, X)
            F = stacked.shape[1]
            big = stacked.reshape((chunk * F,) + stacked.shape[2:])
            out = self.fused(big)
            # chunked tracking: one scan dispatch per tracker
            overrides = [dict() for _ in range(tc)]
            for tr_name, (src, _kind, kw) in self.tracker_specs.items():
                oi = self.seg_names.index(src)
                labels_tf = np.asarray(out["labels"][oi]).reshape(
                    (chunk, F) + np.asarray(out["labels"][oi]).shape[1:]
                )
                prev = state["data"].get(tr_name, [])
                if prev:
                    init_lab = np.stack(
                        [np.asarray(m, np.int32) for m in prev[-1]["labels"]]
                    )
                    init_max = np.asarray(prev[-1]["max_label"], np.int32)
                    has_init = True
                else:
                    init_lab = np.zeros(
                        (F,) + labels_tf.shape[2:], np.int32
                    )
                    init_max = np.zeros((F,), np.int32)
                    has_init = False
                g_tf, m_tf = stitch_movie(
                    jnp.asarray(labels_tf.astype(np.int32)),
                    jnp.asarray(init_lab),
                    jnp.asarray(init_max),
                    jnp.asarray(has_init),
                    **kw,
                )
                g_tf = np.asarray(g_tf)
                m_tf = np.asarray(m_tf)
                for k in range(tc):
                    overrides[k][tr_name] = {
                        "labels": [g_tf[k, f] for f in range(F)],
                        "max_label": [int(m_tf[k, f]) for f in range(F)],
                    }
            # ingest per tp (identical bookkeeping to the per-tp path)
            stopped = False
            for k, (tp, tile_result, _px) in enumerate(pending):
                out_k = {
                    "labels": [
                        np.asarray(lab)[k * F : (k + 1) * F]
                        for lab in out["labels"]
                    ],
                    "features": [
                        [
                            (names, np.asarray(arr)[:, k * F : (k + 1) * F])
                            for names, arr in per_obj
                        ]
                        for per_obj in out["features"]
                    ],
                }
                self.run_tp(
                    tp, tiler, state, pipeline, steps_dir,
                    tile_result=tile_result, out=out_k,
                    tracker_override=overrides[k],
                )
                if monitor is not None and monitor.enabled:
                    seg_results = [
                        hist[-1]
                        for name, hist in state["data"].items()
                        if name.startswith("segment") and hist
                    ]
                    if monitor.should_stop(tp, seg_results):
                        stopped = True
                        break
            if stopped:
                return True
        return False
