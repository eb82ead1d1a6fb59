"""Standard (cellpose + feature-bank) pipeline flavour.

Step-name-prefix dispatch (reference ``pipe.py:47-77``): ``tile*`` ->
tiler, ``segment*`` -> segmenter, ``track*`` -> tracker, ``extract_*`` ->
single-channel tree, ``extractmulti_*`` -> multi-channel tree, ``embed*`` ->
in-process embedder, ``nahual_embed*``/``nahual_track*`` -> remote clients,
``track_global`` -> in-process whole-movie linker.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

from aliby_tpu.engine.core import (
    _init_embed,
    _init_extract,
    _init_extract_multi,
    _init_nahual_embed,
    _init_nahual_track,
    _init_tile,
    _run_pipeline_and_post_impl,
)


def _init_segment(step_name: str, parameters: dict, other_steps: dict) -> Callable:
    from aliby_tpu.models.segment import dispatch_segmenter

    if "channel_to_segment" not in parameters:
        raise ValueError(
            f"Step '{step_name}' is missing required 'channel_to_segment'."
        )
    seg_kwargs = dict(parameters.get("segmenter_kwargs", {}))
    kind = seg_kwargs.pop("kind", "cellpose")
    return dispatch_segmenter(
        kind=kind,
        channel_to_segment=parameters["channel_to_segment"],
        **seg_kwargs,
    )


def _init_track(step_name: str, parameters: dict, other_steps: dict) -> Callable:
    from aliby_tpu.track.dispatch import dispatch_tracker

    return dispatch_tracker(**parameters)


def _init_track_global(step_name: str, parameters: dict) -> Callable:
    from aliby_tpu.engine.global_steps import dispatch_global_step

    return dispatch_global_step("track_global", **parameters)


def init_step(step_name: str, parameters: dict, other_steps: dict | None = None) -> Callable:
    if other_steps is None:
        other_steps = {}
    if step_name.startswith("tile"):
        return _init_tile(step_name, parameters)
    if step_name.startswith("segment"):
        return _init_segment(step_name, parameters, other_steps)
    if step_name.startswith("track_global"):
        return _init_track_global(step_name, parameters)
    if step_name.startswith("track"):
        return _init_track(step_name, parameters, other_steps)
    if step_name.startswith("extractmulti_"):
        return _init_extract_multi(step_name, parameters)
    if step_name.startswith("extract"):
        return _init_extract(step_name, parameters)
    if step_name.startswith("nahual_embed"):
        return _init_nahual_embed(step_name, parameters)
    if step_name.startswith("nahual_track"):
        return _init_nahual_track(step_name, parameters)
    if step_name.startswith("embed"):
        return _init_embed(step_name, parameters)
    raise ValueError(f"No initializer for step {step_name!r}")


run_pipeline_and_post = partial(
    _run_pipeline_and_post_impl, init_step_fn=init_step, post_state_hook=None
)
