"""BABY (yeast time-lapse) pipeline flavour.

Differences from the standard flavour (reference ``pipe_baby.py:30-136``):
segment steps run the BABY-class segmenter (remote ``nahual_baby`` or the
in-process ``baby`` equivalent) whose results carry layered masks +
tracking metadata; extraction is forced onto the overlap path;
``extractmulti_*`` is rejected; after profiles are written, the post-state
hook folds the per-tp metadata into ``tracking/<pos>_<step>.parquet``.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable

import pyarrow.parquet as pq

from aliby_tpu.engine.baby_parser import baby_tracking_to_table
from aliby_tpu.engine.core import (
    _init_embed,
    _init_extract,
    _init_nahual_embed,
    _init_nahual_track,
    _init_tile,
    _run_pipeline_and_post_impl,
)


def _init_segment_baby(step_name: str, parameters: dict, other_steps: dict) -> Callable:
    from aliby_tpu.models.segment import dispatch_segmenter

    seg_kwargs = dict(parameters.get("segmenter_kwargs", {}))
    kind = seg_kwargs.pop("kind", "baby")
    # BABY can pull pixels through the tiler built earlier in this tp
    # (legacy in-process path); the live path feeds pixels positionally
    # via passed_methods, so the tiler injection is best-effort.
    tiler = other_steps.get("tile")
    if tiler is not None:
        seg_kwargs.setdefault("tiler", tiler)
    return dispatch_segmenter(
        kind=kind,
        channel_to_segment=parameters.get("channel_to_segment", 0),
        **seg_kwargs,
    )


def init_step(step_name: str, parameters: dict, other_steps: dict | None = None) -> Callable:
    if other_steps is None:
        other_steps = {}
    if step_name.startswith("tile"):
        return _init_tile(step_name, parameters)
    if step_name.startswith("segment"):
        return _init_segment_baby(step_name, parameters, other_steps)
    if step_name.startswith("extractmulti_"):
        raise ValueError(
            "extractmulti_* steps are not supported in the BABY flavour"
        )
    if step_name.startswith("extract"):
        return _init_extract(step_name, parameters, overlap=True)
    if step_name.startswith("nahual_embed"):
        return _init_nahual_embed(step_name, parameters)
    if step_name.startswith("nahual_track"):
        return _init_nahual_track(step_name, parameters)
    if step_name.startswith("embed"):
        return _init_embed(step_name, parameters)
    raise ValueError(f"No initializer for step {step_name!r}")


def _save_baby_tracking_lineage(state, pipeline, pipeline_name, output_path) -> None:
    out_dir = Path(output_path) / "tracking"
    for step_name in pipeline["steps"]:
        if not step_name.startswith("segment"):
            continue
        # Full per-tp metadata is accumulated at step time (engine/core.py)
        # so retain-trimming of the segment history can't truncate lineage;
        # fall back to the (possibly trimmed) history for older states.
        per_tp_meta = state.get("meta_history", {}).get(step_name) or [
            r.get("metadata") if isinstance(r, dict) else None
            for r in state["data"].get(step_name, [])
        ]
        if not any(per_tp_meta):
            continue
        table = baby_tracking_to_table(per_tp_meta)
        out_dir.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            table,
            out_dir / f"{pipeline_name}_{step_name}.parquet",
            compression="zstd",
        )


run_pipeline_and_post = partial(
    _run_pipeline_and_post_impl,
    init_step_fn=init_step,
    post_state_hook=_save_baby_tracking_lineage,
)
