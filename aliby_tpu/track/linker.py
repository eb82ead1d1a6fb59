"""Global (whole-movie) track linking — the in-process trackastra stand-in.

The reference ships full per-tp masks to a remote trackastra server
(``global_steps.py:15-42``) and stores the returned tracks parquet. Here the
equivalent runs on-slice: stitch the whole (T, Y, X) mask stack with one
``lax.scan`` (IoU carry-over) and emit the same long-form tracks table
(tp, tile, original label, track id, centroid).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aliby_tpu.track.trackers import stitch_sequence


def link_tracks(
    masks_t: np.ndarray,
    images_t: np.ndarray | None = None,
    tile: int = 0,
    max_labels: int = 256,
    iou_threshold: float = 0.25,
) -> pa.Table:
    """(T, Y, X) label maps -> long tracks table."""
    import jax.numpy as jnp

    masks_t = np.asarray(masks_t)
    global_maps = np.asarray(
        stitch_sequence(
            jnp.asarray(masks_t, jnp.int32),
            max_labels=max_labels,
            iou_threshold=iou_threshold,
        )
    )
    rows = {
        "timepoint": [],
        "tile": [],
        "label": [],
        "track_id": [],
        "centroid_y": [],
        "centroid_x": [],
    }
    for tp in range(masks_t.shape[0]):
        orig = masks_t[tp]
        glob = global_maps[tp]
        for lbl in np.unique(orig):
            if lbl == 0:
                continue
            sel = orig == lbl
            ys, xs = np.nonzero(sel)
            track = int(np.bincount(glob[sel]).argmax())
            rows["timepoint"].append(int(tp))
            rows["tile"].append(int(tile))
            rows["label"].append(int(lbl))
            rows["track_id"].append(track)
            rows["centroid_y"].append(float(ys.mean()))
            rows["centroid_x"].append(float(xs.mean()))
    return pa.Table.from_pydict(rows)
