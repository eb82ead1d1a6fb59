"""Tracking: IoU stitching semantics and whole-sequence linking."""

import numpy as np

from aliby_tpu.track.dispatch import dispatch_tracker
from aliby_tpu.track.linker import link_tracks
from aliby_tpu.track.trackers import stitch_sequence


def _moving_blobs(T=4, size=64, drift=(2, 1)):
    """Two blobs translating per frame + one appearing at tp2."""
    seq = []
    for t in range(T):
        m = np.zeros((size, size), np.int32)
        dy, dx = drift[0] * t, drift[1] * t
        m[8 + dy : 18 + dy, 8 + dx : 18 + dx] = 1
        m[36 + dy : 48 + dy, 30 + dx : 42 + dx] = 2
        if t >= 2:
            m[50:58, 8:16] = 3
        seq.append(m)
    return np.stack(seq)


def test_stitch_sequence_tracks_identity():
    seq = _moving_blobs()
    out = np.asarray(stitch_sequence(seq))
    # blob 1 keeps its id across all frames
    for t in range(4):
        dy, dx = 2 * t, 1 * t
        assert out[t, 10 + dy, 10 + dx] == out[0, 10, 10]
        assert out[t, 40 + dy, 34 + dx] == out[0, 40, 34]
    # the newcomer gets a fresh id
    new_id = out[2, 54, 12]
    assert new_id not in (out[0, 10, 10], out[0, 40, 34])
    assert out[3, 54, 12] == new_id


def test_stitch_rois_state_protocol():
    seq = _moving_blobs()
    tracker = dispatch_tracker("stitch")
    state = None
    for t in range(4):
        if t == 0:
            masks = [[seq[t]]]
        else:
            masks = [[seq[t - 1], seq[t]]]
        state = tracker(masks, state=state)
    assert set(state) == {"labels", "max_label"}
    assert state["max_label"][0] == 3
    final = state["labels"][0]
    assert final[54, 12] == 3  # newcomer kept id 3 across remaining frames


def test_relabel_after_disappearance():
    """An object that vanishes frees nothing; new objects get fresh ids."""
    a = np.zeros((32, 32), np.int32)
    a[4:12, 4:12] = 1
    a[20:28, 20:28] = 2
    b = np.zeros((32, 32), np.int32)
    b[4:12, 4:12] = 1  # object 2 gone
    c = np.zeros((32, 32), np.int32)
    c[4:12, 4:12] = 1
    c[18:26, 18:26] = 2  # close to old 2 but no overlap with tp-1
    out = np.asarray(stitch_sequence(np.stack([a, b, c])))
    assert out[2, 22, 22] == 3  # fresh id, not resurrected 2


def test_link_tracks_table():
    seq = _moving_blobs()
    table = link_tracks(seq)
    cols = set(table.column_names)
    assert {"timepoint", "tile", "label", "track_id"} <= cols
    import pyarrow.compute as pc

    # track of blob at (8,8): same track_id at every tp
    tids = {}
    for batch in table.to_pylist():
        tids.setdefault(batch["track_id"], []).append(batch["timepoint"])
    lengths = sorted(len(v) for v in tids.values())
    assert lengths == [2, 4, 4]  # two full tracks + the tp2 newcomer
