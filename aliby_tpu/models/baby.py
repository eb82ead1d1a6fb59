"""In-process BABY-equivalent: yeast segmentation + tracking + lineage.

The reference's BABY is a remote server (``segment/dispatch.py:26-78``)
returning per-tile layered masks plus tracking metadata (track-consistent
``cell_label`` ids and ``mother_assign`` lineage). This module provides the
same contract on-slice: any base segmenter produces instance masks, a
per-tile stitch tracker carried across calls makes labels track-consistent,
masks are distributed over layers (possibly-overlapping mask support), and
new tracks are assigned a mother by nearest-existing-centroid (budding
yeast heuristic).
"""

from __future__ import annotations

import numpy as np

from aliby_tpu.track.trackers import stitch_rois


def _layered(mask: np.ndarray, n_layers: int) -> np.ndarray:
    """Distribute labels over layers (label k -> layer k % n_layers)."""
    out = np.zeros((n_layers, *mask.shape), dtype=mask.dtype)
    for lbl in np.unique(mask):
        if lbl == 0:
            continue
        layer = int(lbl) % n_layers
        out[layer][mask == lbl] = lbl
    return out


def _centroids(mask: np.ndarray) -> dict[int, tuple[float, float]]:
    out = {}
    for lbl in np.unique(mask):
        if lbl == 0:
            continue
        ys, xs = np.nonzero(mask == lbl)
        out[int(lbl)] = (float(ys.mean()), float(xs.mean()))
    return out


def make_baby_segmenter(
    channel_to_segment: int = 0,
    base_kind: str = "threshold",
    n_layers: int = 3,
    iou_threshold: float = 0.25,
    tiler=None,
    **kwargs,
):
    """Closure with BABY's result contract.

    Returns per call: ``{"masks": [per-tile (n_layers, Y, X) uint16],
    "metadata": {"cell_label": [...], "mother_assign": [...]}}``.
    """
    from aliby_tpu.models.segment import dispatch_segmenter

    base = dispatch_segmenter(
        base_kind, channel_to_segment=channel_to_segment, **kwargs
    )
    state = {"track": None, "known": {}}  # known: track id -> centroid

    def segment(pixels=None, tp: int | None = None, **_ignored):
        if pixels is None:
            if tiler is None or tp is None:
                raise ValueError(
                    "baby segmenter needs pixels (passed_methods) or an "
                    "injected tiler + tp"
                )
            pixels = tiler.get_fczyx(tp)
        raw_masks = base(pixels)
        if isinstance(raw_masks, dict):
            raw_masks = raw_masks["masks"]
        # track-consistent relabeling via the stitch tracker
        tile_major = [[m] for m in raw_masks]
        if state["track"] is not None:
            prev = state["track"]
            tile_major = [
                [prev_m, m]
                for prev_m, m in zip(prev["prev_masks"], raw_masks)
            ]
        track_state = stitch_rois(
            tile_major,
            state=state["track"],
            iou_threshold=iou_threshold,
        )
        track_state["prev_masks"] = [np.asarray(m) for m in raw_masks]
        state["track"] = track_state

        cell_labels, mothers, layered_masks = [], [], []
        for tile_i, global_map in enumerate(track_state["labels"]):
            global_map = np.asarray(global_map)
            cents = _centroids(global_map)
            labels = sorted(cents)
            known = state["known"].setdefault(tile_i, {})
            ma = []
            for lbl in labels:
                if lbl in known:
                    ma.append(0)  # existing track: no new lineage event
                else:
                    # new track: mother = nearest pre-existing track
                    if known:
                        dists = {
                            k: np.hypot(
                                cents[lbl][0] - v[0], cents[lbl][1] - v[1]
                            )
                            for k, v in known.items()
                        }
                        mother = min(dists, key=dists.get)
                        ma.append(labels.index(mother) + 1 if mother in labels else 0)
                    else:
                        ma.append(0)
            known.update(cents)
            cell_labels.append(labels)
            mothers.append(ma)
            layered_masks.append(
                _layered(global_map.astype(np.uint16), n_layers)
            )
        return {
            "masks": layered_masks,
            "metadata": {"cell_label": cell_labels, "mother_assign": mothers},
        }

    return segment
