"""Dynamics parity on NETWORK-PREDICTED (noisy) flows — VERDICT r3 item 4.

The existing gate (tests/test_dynamics_parity.py) feeds both paths clean
flows synthesized from GT labels; the reference consumes ``model.eval``'s
actual output (``/root/reference/src/aliby/segment/dispatch.py:172-248``),
which carries prediction noise, boundary ambiguity, and QC-marginal
objects. Here the bundled flagship CPnet runs on dense synthetic renders
and its REAL (2, H, W)/5 flow + cellprob output feeds BOTH
``masks_from_flows`` (2-Euler + composed-pointer approximation) and the
independent 200-step-Euler NumPy oracle; mean matched IoU is gated >= 0.99
in both directions. A second test drives QC-marginal objects (per-object
flow corruption graded across the 0.4 threshold) and requires exact
drop-decision agreement away from the threshold band.
"""

from __future__ import annotations

import numpy as np
import pytest

from aliby_tpu.models.segment import BUNDLED_WEIGHTS

from test_dynamics_parity import matched_iou


def _network_flows(image_main: np.ndarray, image_second: np.ndarray):
    """Run the bundled CPnet exactly as ``CellposeTPU._segment_all`` does
    (percentile normalize -> forward -> flows = (out0, out1)/5, cellprob =
    out2) and return the raw predicted (2, H, W) flows + (H, W) logits."""
    import jax
    import jax.numpy as jnp

    from aliby_tpu.models.segment import _normalize_percentile, dispatch_segmenter

    engine = dispatch_segmenter("cellpose", channel_to_segment=0).engine
    images = np.stack([image_main, image_second])[None]  # (1, 2, H, W)
    x = jnp.asarray(images).transpose(0, 2, 3, 1)
    x = jax.vmap(
        lambda im: jax.vmap(_normalize_percentile, in_axes=-1, out_axes=-1)(im)
    )(x)
    pred = engine.model.apply(engine.params, x)
    if isinstance(pred, tuple):
        pred = pred[0]
    p = np.asarray(pred[0])
    flows = np.stack([p[..., 0], p[..., 1]]) / 5.0
    return flows.astype(np.float32), p[..., 2].astype(np.float32)


@pytest.mark.skipif(not BUNDLED_WEIGHTS.exists(), reason="no bundled weights")
def test_dynamics_parity_network_flows():
    """Two gates on REAL network output:

    1. Integrator parity (strict): with QC off, both paths' masks must
       match at mean IoU >= 0.99 in both directions — follow-flows,
       sink clustering, min-size, and hole filling all on noisy flows.
    2. QC-decision parity (band-tolerant): with flow_threshold=0.4, the
       keep/drop decision must agree per object UNLESS the object is
       QC-marginal — the oracle's own measured error within 0.1 of the
       threshold. The two QC recomputations differ by design there (fixed
       96-iteration whole-image budget for static jit shapes vs upstream's
       per-object size-scaled iteration count; PARITY.md documents the
       bound), so exactly-at-threshold objects can legitimately flip —
       observed on this field: one 70 px object whose error straddles 0.4
       between the two recompute conventions (and between CPU/TPU float
       rounding of the network forward itself).
    """
    from aliby_tpu.models.flows import masks_from_flows
    from aliby_tpu.test_data import render_dense_cells
    from oracle_dynamics import compute_masks_oracle, masks_to_flows_oracle

    rng = np.random.default_rng(21)
    gt = render_dense_cells(192, 36, rng, 5.0, 12.0)
    # soft interior profile + noise: the flagship's training distribution,
    # but the FLOWS below are whatever the network actually predicts
    prof = np.zeros(gt.shape, np.float32)
    for i in range(1, int(gt.max()) + 1):
        sel = gt == i
        if not sel.any():
            continue
        ys, xs = np.nonzero(sel)
        cy, cx = ys.mean(), xs.mean()
        r = max(np.hypot(ys - cy, xs - cx).max(), 1.0)
        d = np.hypot(
            np.arange(gt.shape[0])[:, None] - cy,
            np.arange(gt.shape[1])[None, :] - cx,
        )
        prof = np.where(sel, np.clip(1.2 - (d / r) ** 2, 0.05, None), prof)
    img = prof + rng.normal(0, 0.03, gt.shape).astype(np.float32)
    flows, cellprob = _network_flows(img, np.zeros_like(img))

    # the network must actually detect a non-trivial field (otherwise this
    # test silently degenerates into the empty-mask case)
    assert (cellprob > 0).sum() > 2000

    # --- gate 1: integrator parity, QC off, strict ---
    ours_raw = np.asarray(
        masks_from_flows(flows, cellprob, max_labels=512, flow_threshold=None)
    )
    oracle_raw = np.asarray(
        compute_masks_oracle(flows, cellprob, flow_threshold=None), np.int32
    )
    assert int(ours_raw.max()) >= 10 and int(oracle_raw.max()) >= 10
    iou_fwd = matched_iou(oracle_raw, ours_raw)
    iou_rev = matched_iou(ours_raw, oracle_raw)
    assert iou_fwd >= 0.99, f"QC-off oracle->ours mean IoU {iou_fwd:.4f}"
    assert iou_rev >= 0.99, f"QC-off ours->oracle mean IoU {iou_rev:.4f}"

    # --- gate 2: QC decisions, band-tolerant at the threshold ---
    ours_qc = np.asarray(
        masks_from_flows(flows, cellprob, max_labels=512, flow_threshold=0.4)
    )
    oracle_qc = np.asarray(
        compute_masks_oracle(flows, cellprob, flow_threshold=0.4), np.int32
    )
    # per-candidate error as the oracle measures it (on its QC-off masks)
    orac_flows = masks_to_flows_oracle(oracle_raw)
    err_field = ((orac_flows - flows) ** 2).sum(axis=0)
    flips = 0
    flip_px = np.zeros(oracle_raw.shape, bool)
    for i in range(1, int(oracle_raw.max()) + 1):
        sel = oracle_raw == i
        if not sel.any():
            continue
        e = float(err_field[sel].mean())
        # majority coverage, not .any(): a single stray pixel of a
        # NEIGHBORING kept object on the region must not read as "kept"
        ours_kept = bool((ours_qc[sel] > 0).mean() > 0.5)
        orac_kept = bool((oracle_qc[sel] > 0).mean() > 0.5)
        if ours_kept != orac_kept:
            flips += 1
            flip_px |= sel
            assert abs(e - 0.4) <= 0.1, (
                f"object {i}: QC decision differs (ours={ours_kept} "
                f"oracle={orac_kept}) but oracle-measured err {e:.3f} is "
                f"not marginal"
            )
    assert flips <= 2, f"{flips} QC flips (allowed only at the margin)"
    # kept-object shape parity stays strict once the (marginal) flipped
    # OBJECTS are excluded from both maps — whole objects, not pixels
    # (post-QC hole filling can shift an object's support slightly off the
    # pre-QC footprint, and a leftover fragment would poison the mean),
    # then compact renumbering (matched_iou scores absent ids as 0)
    from oracle_dynamics import _renumber

    ours_agreed = ours_qc.copy()
    orac_agreed = oracle_qc.copy()
    for arr in (ours_agreed, orac_agreed):
        for j in np.unique(arr[arr > 0]):
            sel = arr == j
            if flip_px[sel].mean() > 0.5:
                arr[sel] = 0
    ours_agreed = _renumber(ours_agreed)
    orac_agreed = _renumber(orac_agreed)
    assert orac_agreed.max() > 0
    iou_kf = matched_iou(orac_agreed, ours_agreed)
    iou_kr = matched_iou(ours_agreed, orac_agreed)
    assert iou_kf >= 0.99, f"kept-object oracle->ours mean IoU {iou_kf:.4f}"
    assert iou_kr >= 0.99, f"kept-object ours->oracle mean IoU {iou_kr:.4f}"


def test_dynamics_parity_qc_marginal():
    """Objects with per-object flow corruption graded ACROSS the QC
    threshold: both paths must make the SAME keep/drop decision on every
    object whose oracle-measured flow error is outside a narrow band
    around flow_threshold=0.4; inside the band either decision is within
    spec (the two integrators differ by design there — 2-Euler+pointer vs
    200-step Euler, so their candidate masks and hence measured errors
    differ at the margin).

    The banding variable is the error the QC ACTUALLY measures — the
    oracle's own recomputed-flow MSE on its own pre-QC candidate masks —
    not an a-priori model of the corruption: rotating an object's flow
    field deforms the CANDIDATE mask (pixels spiral to displaced sinks),
    and the recomputed flows of that deformed candidate can legitimately
    match the rotated field, so "rotation angle => error" is not a valid
    ground truth (both integrators agree on keeping such objects; an
    earlier version of this test wrongly failed them)."""
    from aliby_tpu.models.flows import masks_from_flows, masks_to_flows
    from aliby_tpu.test_data import render_dense_cells
    from oracle_dynamics import (
        compute_masks_oracle,
        follow_flows_oracle,
        get_masks_oracle,
        masks_to_flows_oracle,
    )

    rng = np.random.default_rng(8)
    gt = render_dense_cells(160, 24, rng, 5.0, 10.0)
    n = int(gt.max())
    assert n >= 12
    flows = np.asarray(masks_to_flows(gt, max_labels=64)).astype(np.float64)
    # graded corruption: rotate each object's flows by an object-specific
    # angle; the measured error grows (non-monotonically, via candidate
    # deformation) with the angle, sweeping objects across the threshold
    angles = np.linspace(0.0, 2.4, n)
    cos = np.ones(gt.shape)
    sin = np.zeros(gt.shape)
    for i in range(1, n + 1):
        cos = np.where(gt == i, np.cos(angles[i - 1]), cos)
        sin = np.where(gt == i, np.sin(angles[i - 1]), sin)
    fy = cos * flows[0] - sin * flows[1]
    fx = sin * flows[0] + cos * flows[1]
    flows_c = np.stack([fy, fx]).astype(np.float32)
    cellprob = np.where(gt > 0, 4.0, -4.0).astype(np.float32)

    ours = np.asarray(
        masks_from_flows(flows_c, cellprob, max_labels=64, flow_threshold=0.4)
    )
    oracle = np.asarray(
        compute_masks_oracle(flows_c, cellprob, flow_threshold=0.4), np.int32
    )

    # the oracle's own QC measurement on its own pre-QC candidates: the
    # independent implementation's view of each region's error
    fg = cellprob > 0
    pre = get_masks_oracle(follow_flows_oracle(flows_c, fg), fg)
    pre_flows = masks_to_flows_oracle(pre)
    err_field = ((pre_flows - flows_c) ** 2).sum(axis=0)

    band = 0.08
    clear_keep, clear_drop, marginal = 0, 0, 0
    for i in range(1, n + 1):
        sel = gt == i
        # the oracle candidate covering this object (max overlap)
        cands, counts = np.unique(pre[sel], return_counts=True)
        nz = cands != 0
        if not nz.any():
            continue  # no candidate formed here: nothing for QC to decide
        cand = int(cands[nz][np.argmax(counts[nz])])
        csel = pre == cand
        e = float(err_field[csel].mean())
        # majority coverage, not .any(): a single stray pixel of a
        # NEIGHBORING kept object on the region must not read as "kept"
        ours_has = bool((ours[sel] > 0).mean() > 0.5)
        orac_has = bool((oracle[sel] > 0).mean() > 0.5)
        if abs(e - 0.4) <= band:
            marginal += 1
            continue  # either decision is in spec here
        assert ours_has == orac_has, (
            f"object {i}: oracle-measured err {e:.3f} (clearly "
            f"{'kept' if e < 0.4 else 'dropped'}) but ours={ours_has} "
            f"oracle={orac_has}"
        )
        if e < 0.4:
            clear_keep += 1
        else:
            clear_drop += 1
    # the sweep must actually produce both regimes for the gate to mean
    # anything
    assert clear_keep >= 3 and clear_drop >= 3, (clear_keep, clear_drop, marginal)
