"""Tracker dispatch (reference ``track/dispatch.py:8-28``)."""

from __future__ import annotations

from functools import partial

from aliby_tpu.track.trackers import stitch_rois


def dispatch_tracker(kind: str = "stitch", **kwargs):
    if kind == "stitch":
        allowed = {
            k: v for k, v in kwargs.items() if k in ("iou_threshold", "max_labels")
        }
        return partial(stitch_rois, **allowed)
    if kind == "baby":
        # BABY carries its own tracking server-side; the closure surfaces the
        # session's tracker state (legacy in-process path in the reference).
        def baby_tracker(masks, state=None, **_):
            return state or {}

        return baby_tracker
    raise ValueError(f"Unknown tracker kind {kind!r}")
