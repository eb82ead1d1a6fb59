"""Global (whole-movie) track linking — the in-process trackastra stand-in.

The reference ships full per-tp masks to a remote trackastra server
(``global_steps.py:15-42``) and stores the returned tracks parquet — under a
monotile assumption (``pipe_core.py:533-534``). Here the equivalent runs
on-slice and covers trap (multi-tile) pipelines too: all tiles' (T, Y, X)
mask stacks are stitched in ONE jitted ``vmap(lax.scan)`` program (IoU
carry-over per tile), and the long-form tracks table carries the tile id
(tp, tile, original label, track id, centroid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from aliby_tpu.track.trackers import stitch_sequence


@functools.partial(jax.jit, static_argnames=("max_labels",))
def _stitch_all_tiles(masks_ft: jnp.ndarray, max_labels: int, iou_threshold: float):
    """(F, T, Y, X) label maps -> (F, T, Y, X) per-tile global maps."""
    return jax.vmap(
        lambda m: stitch_sequence(
            m, max_labels=max_labels, iou_threshold=iou_threshold
        )
    )(masks_ft)


def _rows_for_tile(rows: dict, orig_t: np.ndarray, glob_t: np.ndarray, tile: int) -> None:
    for tp in range(orig_t.shape[0]):
        orig = orig_t[tp]
        glob = glob_t[tp]
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


def link_tracks(
    masks_t: np.ndarray,
    images_t: np.ndarray | None = None,
    tile: int = 0,
    max_labels: int = 256,
    iou_threshold: float = 0.25,
) -> pa.Table:
    """(T, Y, X) or (T, F, Y, X) label maps -> long tracks table.

    Multi-tile stacks are stitched per tile (tiles are independent fields;
    objects never cross trap boundaries) in a single device program.
    """
    masks_t = np.asarray(masks_t)
    mono = masks_t.ndim == 3
    if mono:
        masks_t = masks_t[:, None]  # (T, 1, Y, X)
    masks_ft = np.moveaxis(masks_t, 1, 0)  # (F, T, Y, X)
    global_ft = np.asarray(
        _stitch_all_tiles(
            jnp.asarray(masks_ft, jnp.int32),
            max_labels=max_labels,
            iou_threshold=float(iou_threshold),
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
    # track ids are per-tile from the scan; offset them so they are unique
    # across the whole position (tiles never share objects)
    base = 0
    for f in range(masks_ft.shape[0]):
        glob = global_ft[f]
        if base:
            glob = np.where(glob > 0, glob + base, 0)
        _rows_for_tile(rows, masks_ft[f], glob, tile if mono else f)
        base += int(global_ft[f].max())
    return pa.Table.from_pydict(rows)
