"""BABY-class lineage: budding-movie ground truth, bud-neck mother inference.

VERDICT r1 item 5: replace nearest-centroid mothering with bud-neck contact
+ size ratio, measure lineage precision/recall on synthetic budding movies,
and serve real baby/spotiflow models remotely (no threshold stubs).
"""

import numpy as np
import pytest

from aliby_tpu.models.baby import make_baby_segmenter
from aliby_tpu.test_data import render_budding_movie

T = 8


def _run_movie(frames, seg):
    """Drive the segmenter across the movie; return (detected lineage
    {daughter_track: mother_track}, per-tp global label maps)."""
    detected, track_maps = {}, []
    for t in range(frames.shape[0]):
        out = seg(frames[t][None, None, None])
        track_maps.append(out["masks"][0].max(axis=0))
        labels = out["metadata"]["cell_label"][0]
        ma = out["metadata"]["mother_assign"][0]
        for j, lbl in enumerate(labels):
            if ma[j] and lbl not in detected:
                detected[lbl] = labels[ma[j] - 1]
    return detected, track_maps


def _lineage_metrics(detected, track_maps, gt_labels, gt_lineage):
    """Map tracks to GT ids by majority overlap; count correct GT pairs."""
    def t2g(track):
        votes = {}
        for t in range(len(track_maps)):
            sel = track_maps[t] == track
            if sel.any():
                g = gt_labels[t][sel]
                g = g[g > 0]
                if g.size:
                    v = int(np.bincount(g).argmax())
                    votes[v] = votes.get(v, 0) + int(sel.sum())
        return max(votes, key=votes.get) if votes else 0

    tracks = set()
    for m in track_maps:
        tracks.update(np.unique(m)[1:].tolist())
    m2g = {tr: t2g(tr) for tr in tracks}
    good, bad = set(), 0
    for d, m in detected.items():
        dg, mg = m2g.get(d, 0), m2g.get(m, 0)
        if dg in gt_lineage and gt_lineage[dg] == mg:
            good.add(dg)
        else:
            bad += 1
    precision = len(good) / max(len(good) + bad, 1)
    recall = len(good) / max(len(gt_lineage), 1)
    detected_gt_buds = {g for g in gt_lineage if g in set(m2g.values())}
    recall_detected = len(good) / max(len(detected_gt_buds), 1)
    return precision, recall, recall_detected


def test_budding_renderer_ground_truth():
    rng = np.random.default_rng(3)
    frames, labels, lineage = render_budding_movie(160, T, rng, n_mothers=4)
    assert frames.shape == labels.shape == (T, 160, 160)
    # every bud's mother exists from tp 0; buds appear strictly later
    first_seen = {}
    for t in range(T):
        for lbl in np.unique(labels[t])[1:]:
            first_seen.setdefault(int(lbl), t)
    for bud, mother in lineage.items():
        assert first_seen[mother] == 0
        assert first_seen[bud] >= 1
        # bud touches its mother when it appears (bud-neck contact)
        t0 = first_seen[bud]
        sel = labels[t0] == bud
        grown = np.zeros_like(sel)
        grown[1:] |= sel[:-1]; grown[:-1] |= sel[1:]
        grown[:, 1:] |= sel[:, :-1]; grown[:, :-1] |= sel[:, 1:]
        neigh = labels[t0][grown & ~sel]
        assert mother in neigh


@pytest.mark.parametrize("seed", [5, 11, 23])
def test_lineage_exact_with_perfect_masks(seed):
    """Given correct instance masks (ids shuffled per frame so the tracker
    does real work), bud-neck mother inference is exact."""
    rng = np.random.default_rng(seed)
    frames, gt_labels, gt_lineage = render_budding_movie(
        160, T, rng, n_mothers=5, bud_max_radius=7.0
    )
    counter = {"t": 0}

    def base(pixels, **_):
        t = counter["t"]
        counter["t"] += 1
        m = gt_labels[t]
        ids = np.unique(m)[1:]
        perm = np.zeros(m.max() + 1, np.int32)
        perm[ids] = np.random.default_rng(t + seed).permutation(len(ids)) + 1
        return [perm[m]]

    seg = make_baby_segmenter(base_fn=base)
    detected, track_maps = _run_movie(frames, seg)
    precision, recall, _ = _lineage_metrics(
        detected, track_maps, gt_labels, gt_lineage
    )
    assert precision == 1.0 and recall == 1.0


def test_lineage_end_to_end_cellpose_base():
    """Full stack: flagship segmenter -> tracker -> bud-neck lineage.
    Every bud the segmenter detects must get the right mother."""
    rng = np.random.default_rng(5)
    frames, gt_labels, gt_lineage = render_budding_movie(
        160, T, rng, n_mothers=5, bud_max_radius=7.0
    )
    seg = make_baby_segmenter(
        channel_to_segment=0, base_kind="cellpose", min_size=8
    )
    detected, track_maps = _run_movie(frames, seg)
    precision, recall, recall_detected = _lineage_metrics(
        detected, track_maps, gt_labels, gt_lineage
    )
    assert recall_detected >= 0.9  # detected buds -> correct mothers
    assert precision >= 0.5
    assert recall >= 0.4


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from aliby_tpu.net.server import ModelServer

    addr = f"ipc://{tmp_path_factory.mktemp('ipc')}/baby.ipc"
    with ModelServer(addr) as srv:
        yield srv


def test_remote_baby_serves_real_model(server):
    """The server must host the real BABY-class model (not a threshold stub
    with fabricated mother_assign=0) and carry tracking state per session."""
    from aliby_tpu.net.wire import Client

    client = Client(server.address)
    session = client.call("setup", model="baby", params={"base_kind": "threshold"})
    info = client.call("describe", session=session)
    assert info["impl"].startswith("aliby_tpu.models.baby.")

    rng = np.random.default_rng(7)
    frames, gt_labels, _ = render_budding_movie(128, 4, rng, n_mothers=3)
    labels_seen = []
    for t in range(4):
        out = client.call(
            "process", session=session, model="baby", data=gt_labels[t][None].astype(np.float32)
        )
        assert out["metadata"] is not None
        labels_seen.append(out["metadata"]["cell_label"][0])
        masks = out["masks"][0]
        assert np.asarray(masks).ndim == 3  # layered (n_layers, Y, X)
    # session state carries the tracker: mother tracks keep their ids
    persistent = set(labels_seen[0]) & set(labels_seen[-1])
    assert len(persistent) >= 3
    client.close()


def test_remote_spotiflow_serves_real_model(server):
    from aliby_tpu.net.wire import Client

    client = Client(server.address)
    session = client.call("setup", model="spotiflow", params={})
    info = client.call("describe", session=session)
    assert info["impl"].startswith("aliby_tpu.models.spots.")
    img = np.zeros((64, 64), np.float32)
    img[20, 20] = img[40, 44] = 50.0
    out = client.call("process", session=session, model="spotiflow", data=img[None])
    mask = np.asarray(out["masks"][0])
    assert mask.shape == (64, 64)
    assert len(np.unique(mask)) - 1 == 2
    client.close()
