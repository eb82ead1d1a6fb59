"""Flow-dynamics / mask-reconstruction parity gate (VERDICT r2 item #1).

Feeds the SAME flow field to (a) the independent NumPy cellpose-dynamics
oracle (``tests/oracle_dynamics.py`` — 200-step Euler, histogram seed
clustering, flow-error QC, hole filling + min-size, all from the published
Stringer et al. 2021 definitions) and (b) the production TPU path
(``aliby_tpu.models.flows.masks_from_flows`` — 2 Euler + 2^8 pointer-doubled
steps, lexicographic seed-key propagation), and gates mean best-matched
IoU >= 0.99 in BOTH directions on dense fields of touching objects.

This pins the last link of the mask-parity chain the CPnet port
(tests/test_cpnet_port.py) does not cover: the reconstruction the reference
consumes through ``model.eval`` (``segment/dispatch.py:172-248``).
"""

from __future__ import annotations

import numpy as np
import pytest


def matched_iou(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = int(a.max()), int(b.max())
    if na == 0 or nb == 0:
        return 1.0 if na == nb else 0.0
    conf = np.zeros((na + 1, nb + 1), np.int64)
    np.add.at(conf, (a.ravel(), b.ravel()), 1)
    area_a = conf.sum(axis=1)
    area_b = conf.sum(axis=0)
    ious = []
    for i in range(1, na + 1):
        j = int(np.argmax(conf[i, 1:])) + 1
        inter = conf[i, j]
        union = area_a[i] + area_b[j] - inter
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious))


CONFIGS = [
    # (name, size, n_objects, rmin, rmax, seed)
    ("small-dense", 128, 40, 3.0, 8.0, 0),
    ("mixed-touching", 192, 40, 4.0, 16.0, 1),
    ("large-objects", 256, 8, 30.0, 60.0, 2),
]


@pytest.mark.parametrize("name,size,n,rmin,rmax,seed", CONFIGS)
def test_dynamics_parity_dense(name, size, n, rmin, rmax, seed):
    from aliby_tpu.models.flows import masks_from_flows, masks_to_flows
    from aliby_tpu.test_data import render_dense_cells
    from oracle_dynamics import compute_masks_oracle

    rng = np.random.default_rng(seed)
    gt = render_dense_cells(size, n, rng, rmin, rmax)
    assert gt.max() >= max(3, n // 2), "renderer failed to pack objects"
    flows = np.asarray(masks_to_flows(gt))
    cellprob = np.where(gt > 0, 4.0, -4.0).astype(np.float32)

    oracle = np.asarray(
        compute_masks_oracle(flows, cellprob, flow_threshold=0.4), np.int32
    )
    ours = np.asarray(
        masks_from_flows(flows, cellprob, max_labels=512, flow_threshold=0.4)
    )
    iou_fwd = matched_iou(oracle, ours)
    iou_rev = matched_iou(ours, oracle)
    assert iou_fwd >= 0.99, f"{name}: oracle->ours mean IoU {iou_fwd:.4f}"
    assert iou_rev >= 0.99, f"{name}: ours->oracle mean IoU {iou_rev:.4f}"


def test_flow_synthesis_matches_published_convention():
    """Production masks_to_flows vs the independent NumPy synthesis: the
    median-center heat-diffusion targets agree to small per-label MSE
    (f32 vs f64 and snapping differences only) — far below the 0.4 QC
    threshold, so QC decisions can never diverge on convention."""
    from aliby_tpu.models.flows import masks_to_flows
    from aliby_tpu.test_data import render_dense_cells
    from oracle_dynamics import masks_to_flows_oracle

    rng = np.random.default_rng(3)
    gt = render_dense_cells(128, 30, rng, 3.0, 10.0)
    prod = np.asarray(masks_to_flows(gt))
    orac = masks_to_flows_oracle(gt)
    diff = ((prod - orac) ** 2).sum(axis=0)
    per_label = [
        float(diff[gt == i].mean()) for i in range(1, int(gt.max()) + 1)
    ]
    assert max(per_label) < 0.1, f"max per-label flow MSE {max(per_label):.3f}"


def test_qc_drops_flow_inconsistent_masks():
    """A mask whose shape cannot have produced the predicted flows must be
    removed by flow-error QC (both oracle and production)."""
    from aliby_tpu.models.flows import masks_from_flows, masks_to_flows
    from oracle_dynamics import compute_masks_oracle

    H = W = 96
    gt = np.zeros((H, W), np.int32)
    yy, xx = np.mgrid[0:H, 0:W]
    gt[(yy - 30) ** 2 + (xx - 30) ** 2 <= 144] = 1
    flows = np.array(masks_to_flows(gt))
    # second "object" in the cellprob map with NO flow support: constant
    # rightward flow inside it sweeps all pixels to its right edge, which
    # cannot match flows recomputed from any compact recovered mask
    blob = (yy - 70) ** 2 + (xx - 70) ** 2 <= 144
    cellprob = np.where((gt > 0) | blob, 4.0, -4.0).astype(np.float32)
    flows[1] = np.where(blob, 1.0, flows[1])
    flows[0] = np.where(blob, 0.0, flows[0])

    ours_qc = np.asarray(
        masks_from_flows(flows, cellprob, max_labels=64, flow_threshold=0.4)
    )
    oracle_qc = np.asarray(
        compute_masks_oracle(flows, cellprob, flow_threshold=0.4), np.int32
    )
    ours_no = np.asarray(
        masks_from_flows(flows, cellprob, max_labels=64, flow_threshold=None)
    )
    # without QC the swept blob forms a (line-shaped) mask; with QC both
    # implementations drop it and keep exactly the genuine object
    assert int(ours_no.max()) >= 2
    assert int(ours_qc.max()) == 1
    assert int(oracle_qc.max()) == 1
    inter = ((ours_qc == 1) & (gt == 1)).sum()
    union = ((ours_qc == 1) | (gt == 1)).sum()
    assert inter / union > 0.95


def test_hole_filling_matches_oracle():
    """An annulus (object with an enclosed hole) is filled by both paths."""
    from aliby_tpu.models.flows import fill_label_holes

    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W]
    r2 = (yy - 32) ** 2 + (xx - 32) ** 2
    ann = ((r2 <= 400) & (r2 >= 64)).astype(np.int32)
    filled = np.asarray(fill_label_holes(ann))
    assert filled[32, 32] == 1  # hole filled
    assert filled[0, 0] == 0  # outside untouched
    from oracle_dynamics import fill_holes_and_remove_small

    oracle = fill_holes_and_remove_small(ann.astype(np.uint32), min_size=15)
    assert (filled > 0).sum() == (oracle > 0).sum()


def _numpy_median_centers(labels: np.ndarray) -> np.ndarray:
    """Published cellpose center definition, directly in NumPy: the object
    pixel nearest the per-object coordinate median (ties -> first in raster
    order)."""
    H, W = labels.shape
    out = np.zeros((H, W), bool)
    for lab in range(1, int(labels.max()) + 1):
        ys, xs = np.nonzero(labels == lab)
        if ys.size == 0:
            continue
        my, mx = np.median(ys), np.median(xs)
        d2 = (ys - my) ** 2 + (xs - mx) ** 2
        k = int(np.argmin(d2))  # nonzero is raster-ordered -> first wins ties
        out[ys[k], xs[k]] = True
    return out


@pytest.mark.parametrize("shape", [(128, 128), (293, 300)])
def test_median_centers_both_paths(shape):
    """label_median_centers is exact on both the packed fast path
    (H*W <= 2^16) and the two-pass large-image path (H*W > 2^16 — the
    regression: pos used to be masked to 16 bits, silently corrupting
    centers on anything bigger than 256x256, e.g. the 293^2 yeast
    monotile)."""
    from aliby_tpu.models.flows import label_median_centers
    from aliby_tpu.test_data import render_dense_cells

    H, W = shape
    rng = np.random.default_rng(7)
    gt = np.zeros((H, W), np.int32)
    sq = render_dense_cells(min(H, W), 30, rng, 4.0, 12.0)
    gt[: sq.shape[0], : sq.shape[1]] = sq
    # park one object in the far corner so pos > 65535 matters
    gt[H - 6 : H - 1, W - 6 : W - 1] = gt.max() + 1

    ours = np.asarray(label_median_centers(gt, max_labels=64))
    ref = _numpy_median_centers(gt)
    assert (ours == ref).all(), (
        f"center mismatch at {np.argwhere(ours != ref)[:5]}"
    )
