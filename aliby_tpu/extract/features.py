"""Vectorized cp_measure-class feature bank.

Each family mirrors one cp_measure measurement group (reference
``extraction/core/functions/loaders.py:19-171`` wires
``get_core_measurements()`` / ``get_correlation_measurements()``): the
function computes the whole family for *all* labels of a tile in one jitted
pass and returns ``{CellProfiler_feature_name: (max_labels,) array}``.

Naming follows CellProfiler conventions (``Intensity_IntegratedIntensity``
matches the reference example's column ``0/max/intensity/
Intensity_IntegratedIntensity``, ``examples/01:160-162``). Numerical parity
is enforced feature-by-feature against an independent scipy per-object
oracle (``tests/test_golden_parity.py``; measured ledger in ``PARITY.md``
incl. documented convention waivers); ``scripts/golden_parity.py`` re-runs
the comparison against the real cp_measure wherever it is installable.

Absent labels (padding rows) carry NaN; the executor filters them out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from aliby_tpu.extract.reductions import (
    LabelStats,
    boundary_mask,
    convex_area_pixels,
    counts,
    directional_extents,
    ellipse_params,
    feret_diameters,
    mad_from_sorted,
    quantile_from_sorted,
    seg_max,
    seg_min,
    seg_minmax_cols,
    seg_sum,
    seg_sum_cols,
    sorted_by_label,
    table_lookup,
    topk_mean_from_sorted,
    topk_median_from_sorted,
)

_SQRT2 = math.sqrt(2.0)


def _nanpad(values, present):
    return jnp.where(present, values, jnp.nan)


# ---------------------------------------------------------------------------
# sizeshape (CellProfiler MeasureObjectSizeShape / AreaShape_*)
# ---------------------------------------------------------------------------


def _perimeter(labels, max_labels):
    """skimage-style weighted perimeter per label.

    Border pixels are categorized by their same-label 4/8-neighbor border
    counts (shift-based so touching objects don't bleed into each other) and
    weighted with the Vossepoel–Smeulders coefficients used by
    ``skimage.measure.perimeter``.
    """
    border = boundary_mask(labels)  # 4-conn: skimage's default erosion
    b = border.astype(jnp.float32)
    l_pad = jnp.pad(labels, 1, constant_values=0)
    b_pad = jnp.pad(b, 1)

    def shifted(arr, dy, dx):
        return arr[1 + dy : arr.shape[0] - 1 + dy, 1 + dx : arr.shape[1] - 1 + dx]

    n4 = jnp.zeros_like(b)
    nd = jnp.zeros_like(b)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        same = shifted(l_pad, dy, dx) == labels
        n4 = n4 + shifted(b_pad, dy, dx) * same
    for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        same = shifted(l_pad, dy, dx) == labels
        nd = nd + shifted(b_pad, dy, dx) * same
    # skimage perimeter weights: pattern code = 10*diag + 2*orth + center
    code = (10 * nd + 2 * n4 + 1) * b
    w = jnp.zeros_like(code)
    one_codes = (5, 7, 15, 17, 25, 27)
    sqrt2_codes = (21, 33)
    mixed_codes = (13, 23)
    for c in one_codes:
        w = w + (code == c) * 1.0
    for c in sqrt2_codes:
        w = w + (code == c) * _SQRT2
    for c in mixed_codes:
        w = w + (code == c) * ((1 + _SQRT2) / 2)
    # any other border pattern contributes 1 (skimage leaves them 0; for
    # robustness on odd shapes we count them as unit length)
    known = jnp.zeros_like(code, dtype=bool)
    for c in one_codes + sqrt2_codes + mixed_codes:
        known = known | (code == c)
    w = w + (~known & border) * 1.0
    return seg_sum(w, labels, max_labels)


def _euler_number(labels, max_labels):
    """Euler number per label (8-connectivity) via bit-quad counts."""
    pad = jnp.pad(labels, ((1, 0), (1, 0)), constant_values=0)
    H, W = labels.shape
    # 2x2 windows over padded map: corners a b / c d
    a = pad[:-1, :-1][: H + 0, : W + 0]
    b = pad[:-1, 1:]
    c = pad[1:, :-1]
    d = pad[1:, 1:]
    quad_lbl = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    fa, fb, fc, fd = (x > 0 for x in (a, b, c, d))
    n_set = fa.astype(jnp.int32) + fb + fc + fd
    q1 = (n_set == 1).astype(jnp.float32)
    q3 = (n_set == 3).astype(jnp.float32)
    qd = ((n_set == 2) & ((fa & fd & ~fb & ~fc) | (fb & fc & ~fa & ~fd))).astype(
        jnp.float32
    )
    contrib = (q1 - q3 - 2.0 * qd) / 4.0
    return seg_sum(contrib, quad_lbl, max_labels)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def sizeshape(labels: jnp.ndarray, max_labels: int) -> dict:
    st = LabelStats(labels, max_labels)
    present = st.present
    area = st.area
    mu20, mu02, mu11 = st.central_moments()
    major, minor, ecc, orientation = ellipse_params(mu20, mu02, mu11, area)
    bb_mn, bb_mx = seg_minmax_cols(
        jnp.stack([st.yy, st.xx], axis=-1), labels, max_labels
    )
    min_y, min_x = bb_mn[:, 0], bb_mn[:, 1]
    max_y, max_x = bb_mx[:, 0], bb_mx[:, 1]
    bbox_area = (max_y - min_y + 1) * (max_x - min_x + 1)
    perimeter = _perimeter(labels, max_labels)
    pmax, pmin = directional_extents(labels, max_labels, n_dir=360)
    max_feret, min_feret = feret_diameters(pmax, pmin)
    # hull rasterization at every other direction (180 slabs) — same pixels
    convex_area = convex_area_pixels(
        labels, max_labels, pmax=pmax[:, ::2], pmin=pmin[:, ::2], n_dir=180
    )
    convex_area = jnp.maximum(convex_area, area)  # hull can't be smaller
    # exact Euclidean per-object EDT (JFA) — the chessboard approximation
    # biased Max/Mean/MedianRadius ~sqrt(2) on diagonals (r1 parity gap)
    from aliby_tpu.ops.edt import edt_to_other_label

    dist = jnp.where(labels > 0, edt_to_other_label(labels), 0.0)
    max_radius = seg_max(dist, labels, max_labels)
    mean_radius = seg_sum(dist, labels, max_labels) / st.safe_area
    # MedianRadius: exact np.quantile (linear interpolation) straight from
    # the per-label value sort — the earlier (L+1) x 17k-bin histogram
    # scatter cost ~21 ms real vs ~2 ms for the lexsort
    sv_d, starts_d, cnt_d = sorted_by_label(dist, labels, max_labels)
    median_radius = jnp.nan_to_num(
        quantile_from_sorted(sv_d, starts_d, cnt_d, 0.5)
    )
    euler = _euler_number(labels, max_labels)
    form_factor = 4 * jnp.pi * area / jnp.maximum(perimeter**2, 1e-12)
    compactness = jnp.maximum(perimeter, 0.0) ** 2 / jnp.maximum(4 * jnp.pi * area, 1e-12)
    out = {
        "AreaShape_Area": area,
        "AreaShape_BoundingBoxArea": bbox_area,
        "AreaShape_BoundingBoxMaximum_X": max_x,
        "AreaShape_BoundingBoxMaximum_Y": max_y,
        "AreaShape_BoundingBoxMinimum_X": min_x,
        "AreaShape_BoundingBoxMinimum_Y": min_y,
        "AreaShape_Center_X": st.cx,
        "AreaShape_Center_Y": st.cy,
        "AreaShape_Compactness": compactness,
        "AreaShape_ConvexArea": convex_area,
        "AreaShape_Eccentricity": ecc,
        "AreaShape_EquivalentDiameter": jnp.sqrt(4 * area / jnp.pi),
        "AreaShape_EulerNumber": euler,
        "AreaShape_Extent": area / jnp.maximum(bbox_area, 1.0),
        "AreaShape_FormFactor": form_factor,
        "AreaShape_MajorAxisLength": major,
        "AreaShape_MaxFeretDiameter": max_feret,
        "AreaShape_MaximumRadius": max_radius,
        "AreaShape_MeanRadius": mean_radius,
        "AreaShape_MedianRadius": median_radius,
        "AreaShape_MinFeretDiameter": min_feret,
        "AreaShape_MinorAxisLength": minor,
        "AreaShape_Orientation": orientation * 180.0 / jnp.pi,
        "AreaShape_Perimeter": perimeter,
        "AreaShape_Solidity": area / jnp.maximum(convex_area, 1.0),
    }
    # Spatial / central / normalized moments + Hu moments + inertia tensor
    # (the exact CellProfiler MeasureObjectSizeShape 2-D advanced-feature
    # grid: SpatialMoment/CentralMoment over i<=2 x j<=3, NormalizedMoment
    # over (0..3)^2, 7 Hu moments, 2x2 InertiaTensor + eigenvalues). All 16
    # y^i x^j products go through ONE (HW, 16) scatter-add — 1/16th the HLO
    # count of per-moment scatters (compile time matters on the single-core
    # host).
    ypow = jnp.stack([st.yy**i for i in range(4)])  # (4, H, W)
    xpow = jnp.stack([st.xx**j for j in range(4)])
    prod = (ypow[:, None] * xpow[None, :]).reshape(16, -1).T  # (HW, 16)
    acc = seg_sum_cols(prod, labels, max_labels)  # (L, 16), one MXU pass
    sums = {}
    for i in range(3):
        for j in range(4):
            sums[(i, j)] = acc[:, i * 4 + j]
            out[f"AreaShape_SpatialMoment_{i}_{j}"] = sums[(i, j)]
    # Central moments accumulate CENTERED, sqrt(area)-SCALED coordinates
    # (a second (HW, 16) scatter): the binomial expansion around (cy, cx)
    # cancels catastrophically in float32 for objects far from the origin,
    # and O(1)-magnitude accumulands keep third-order sums conditioned.
    # With s = sqrt(area): mu_ij = acc_ij * s^(i+j), eta_ij = acc_ij / s^2.
    s_lbl = jnp.sqrt(st.safe_area)
    dyn, dxn = st.centered_scaled_coords()
    ypow_c = jnp.stack([dyn**i for i in range(4)])
    xpow_c = jnp.stack([dxn**j for j in range(4)])
    prod_c = (ypow_c[:, None] * xpow_c[None, :]).reshape(16, -1).T
    acc_c = seg_sum_cols(prod_c, labels, max_labels)
    mu = {}
    for i in range(4):
        for j in range(4):
            mu[(i, j)] = acc_c[:, i * 4 + j] * s_lbl ** (i + j)
            if i <= 2:
                out[f"AreaShape_CentralMoment_{i}_{j}"] = mu[(i, j)]
    eta = {}
    for i in range(4):
        for j in range(4):
            # eta = mu / area^(1+(i+j)/2) = acc / s^2 exactly (s=sqrt(area))
            eta[(i, j)] = acc_c[:, i * 4 + j] / st.safe_area
            out[f"AreaShape_NormalizedMoment_{i}_{j}"] = eta[(i, j)]
    e = eta
    hu0 = e[(2, 0)] + e[(0, 2)]
    hu1 = (e[(2, 0)] - e[(0, 2)]) ** 2 + 4 * e[(1, 1)] ** 2
    hu2 = (e[(3, 0)] - 3 * e[(1, 2)]) ** 2 + (3 * e[(2, 1)] - e[(0, 3)]) ** 2
    hu3 = (e[(3, 0)] + e[(1, 2)]) ** 2 + (e[(2, 1)] + e[(0, 3)]) ** 2
    hu4 = (e[(3, 0)] - 3 * e[(1, 2)]) * (e[(3, 0)] + e[(1, 2)]) * (
        (e[(3, 0)] + e[(1, 2)]) ** 2 - 3 * (e[(2, 1)] + e[(0, 3)]) ** 2
    ) + (3 * e[(2, 1)] - e[(0, 3)]) * (e[(2, 1)] + e[(0, 3)]) * (
        3 * (e[(3, 0)] + e[(1, 2)]) ** 2 - (e[(2, 1)] + e[(0, 3)]) ** 2
    )
    hu5 = (e[(2, 0)] - e[(0, 2)]) * (
        (e[(3, 0)] + e[(1, 2)]) ** 2 - (e[(2, 1)] + e[(0, 3)]) ** 2
    ) + 4 * e[(1, 1)] * (e[(3, 0)] + e[(1, 2)]) * (e[(2, 1)] + e[(0, 3)])
    hu6 = (3 * e[(2, 1)] - e[(0, 3)]) * (e[(3, 0)] + e[(1, 2)]) * (
        (e[(3, 0)] + e[(1, 2)]) ** 2 - 3 * (e[(2, 1)] + e[(0, 3)]) ** 2
    ) - (e[(3, 0)] - 3 * e[(1, 2)]) * (e[(2, 1)] + e[(0, 3)]) * (
        3 * (e[(3, 0)] + e[(1, 2)]) ** 2 - (e[(2, 1)] + e[(0, 3)]) ** 2
    )
    for idx, h in enumerate((hu0, hu1, hu2, hu3, hu4, hu5, hu6)):
        out[f"AreaShape_HuMoment_{idx}"] = h
    # Inertia tensor (skimage regionprops convention CP re-exports):
    # [[mu20, -mu11], [-mu11, mu02]] / mu00, eigenvalues descending.
    t00 = mu[(2, 0)] / st.safe_area
    t01 = -mu[(1, 1)] / st.safe_area
    t11 = mu[(0, 2)] / st.safe_area
    out["AreaShape_InertiaTensor_0_0"] = t00
    out["AreaShape_InertiaTensor_0_1"] = t01
    out["AreaShape_InertiaTensor_1_0"] = t01
    out["AreaShape_InertiaTensor_1_1"] = t11
    half_tr = (t00 + t11) / 2.0
    disc = jnp.sqrt(jnp.maximum(((t00 - t11) / 2.0) ** 2 + t01**2, 0.0))
    out["AreaShape_InertiaTensorEigenvalues_0"] = half_tr + disc
    out["AreaShape_InertiaTensorEigenvalues_1"] = half_tr - disc
    # NOTE: binary-shape Zernike magnitudes are NOT part of cp_measure's
    # "sizeshape" — upstream splits them into the separate "zernike"
    # feature (the 632-column anchor decomposes as 6x78 sizeshape +
    # 5x16 intensity + 10x8 coloc + 4 metadata).
    return {k: _nanpad(v, present) for k, v in out.items()}


# ---------------------------------------------------------------------------
# intensity (CellProfiler MeasureObjectIntensity / Intensity_*)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_labels", "edge_measurements"))
def intensity(
    labels: jnp.ndarray,
    img: jnp.ndarray,
    max_labels: int,
    edge_measurements: bool = True,
) -> dict:
    img = img.astype(jnp.float32)
    st = LabelStats(labels, max_labels)
    present = st.present
    # one 4-column kernel pass: total, sq, y-weighted, x-weighted
    acc_i = seg_sum_cols(
        jnp.stack([img, img**2, st.yy * img, st.xx * img], axis=-1),
        labels,
        max_labels,
    )
    total = acc_i[:, 0]
    mean = total / st.safe_area
    sq = acc_i[:, 1]
    var = jnp.maximum(sq / st.safe_area - mean**2, 0.0)
    std = jnp.sqrt(var)
    mm = seg_minmax_cols(img[..., None], labels, max_labels)
    vmin, vmax = mm[0][:, 0], mm[1][:, 0]
    sv, starts, cnt = sorted_by_label(img, labels, max_labels)
    median = quantile_from_sorted(sv, starts, cnt, 0.5)
    q1 = quantile_from_sorted(sv, starts, cnt, 0.25)
    q3 = quantile_from_sorted(sv, starts, cnt, 0.75)
    # MAD: median of |v - median(label)| — selected straight from the SAME
    # sorted run (two-sorted-halves k-th-element search) instead of a
    # second full-image lexsort on the residuals (~15 ms/16 images saved
    # on v5e, float-exact). vmax still broadcasts through a lookup.
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    lk = table_lookup(
        jnp.nan_to_num(vmax, neginf=0.0)[:, None],
        l_idx,
    )
    mad = mad_from_sorted(sv, starts, cnt, median)
    # intensity-weighted centroid + mass displacement
    safe_total = jnp.maximum(total, 1e-12)
    wcy = acc_i[:, 2] / safe_total
    wcx = acc_i[:, 3] / safe_total
    mass_disp = jnp.sqrt((wcy - st.cy) ** 2 + (wcx - st.cx) ** 2)
    # location of the max-intensity pixel: exact two-pass argmax (the value
    # scatter-max is exact in float32; among tied maxima take the FIRST
    # pixel in scan order, CellProfiler-like). Packing value+position into
    # one float32 loses the position bits — r1 parity gap of 2-3 px.
    flat_l = labels.reshape(-1)
    flat_v = img.reshape(-1)
    H, W = labels.shape
    pos = jnp.arange(flat_v.size, dtype=jnp.float32)
    vmax_px = lk[..., 0].reshape(-1)
    is_best = (flat_v == vmax_px) & (flat_l > 0)
    best_px = jnp.full(max_labels + 1, jnp.inf, jnp.float32)
    best_px = best_px.at[jnp.where(is_best, flat_l, 0)].min(
        jnp.where(is_best, pos, jnp.inf)
    )[1:]
    best_px = jnp.where(jnp.isfinite(best_px), best_px, 0.0)
    max_y = jnp.floor(best_px / W)
    max_x = best_px - max_y * W
    out = {
        "Intensity_IntegratedIntensity": total,
        "Intensity_MeanIntensity": mean,
        "Intensity_StdIntensity": std,
        "Intensity_MinIntensity": vmin,
        "Intensity_MaxIntensity": vmax,
        "Intensity_MedianIntensity": median,
        "Intensity_MADIntensity": mad,
        "Intensity_LowerQuartileIntensity": q1,
        "Intensity_UpperQuartileIntensity": q3,
        "Intensity_MassDisplacement": mass_disp,
        "Location_CenterMassIntensity_X": wcx,
        "Location_CenterMassIntensity_Y": wcy,
        "Location_CenterMassIntensity_Z": jnp.zeros_like(wcx),
        "Location_MaxIntensity_X": max_x,
        "Location_MaxIntensity_Y": max_y,
        "Location_MaxIntensity_Z": jnp.zeros_like(max_x),
    }
    if edge_measurements:
        edge = boundary_mask(labels)
        e_labels = jnp.where(edge, labels, 0)
        e_cnt = counts(e_labels, max_labels)
        e_total = seg_sum(img, e_labels, max_labels)
        e_mean = e_total / jnp.maximum(e_cnt, 1.0)
        e_sq = seg_sum(img**2, e_labels, max_labels)
        e_std = jnp.sqrt(jnp.maximum(e_sq / jnp.maximum(e_cnt, 1.0) - e_mean**2, 0.0))
        out.update(
            {
                "Intensity_IntegratedIntensityEdge": e_total,
                "Intensity_MeanIntensityEdge": e_mean,
                "Intensity_StdIntensityEdge": e_std,
                "Intensity_MinIntensityEdge": seg_min(
                    jnp.where(edge, img, jnp.inf), labels, max_labels
                ),
                "Intensity_MaxIntensityEdge": seg_max(
                    jnp.where(edge, img, -jnp.inf), labels, max_labels
                ),
            }
        )
    return {k: _nanpad(v, present) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Correlation / colocalization family (two channels, one mask)
# ---------------------------------------------------------------------------


def _per_label_pearson(labels, im1, im2, max_labels, weights=None):
    w = jnp.ones_like(im1) if weights is None else weights
    inside = (labels > 0).astype(jnp.float32) * w
    # all six correlation sums in ONE kernel pass
    acc = seg_sum_cols(
        jnp.stack(
            [
                inside,
                im1 * inside,
                im2 * inside,
                im1 * im1 * inside,
                im2 * im2 * inside,
                im1 * im2 * inside,
            ],
            axis=-1,
        ),
        labels,
        max_labels,
    )
    n, s1, s2, s11, s22, s12 = (acc[:, i] for i in range(6))
    safe_n = jnp.maximum(n, 1.0)
    cov = s12 / safe_n - (s1 / safe_n) * (s2 / safe_n)
    v1 = jnp.maximum(s11 / safe_n - (s1 / safe_n) ** 2, 0.0)
    v2 = jnp.maximum(s22 / safe_n - (s2 / safe_n) ** 2, 0.0)
    denom = jnp.sqrt(v1 * v2)
    corr = (cov / jnp.maximum(denom, 1e-12)) * (denom > 1e-12)
    slope = (cov / jnp.maximum(v1, 1e-12)) * (v1 > 1e-12)
    return corr, slope, n


@functools.partial(jax.jit, static_argnames=("max_labels",))
def pearson(labels, im1, im2, max_labels) -> dict:
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    corr, slope, n = _per_label_pearson(labels, im1, im2, max_labels)
    present = n > 0
    return {
        "pearson": _nanpad(corr, present),
        "slope": _nanpad(slope, present),
    }


@functools.partial(jax.jit, static_argnames=("max_labels",))
def manders_fold(labels, im1, im2, max_labels, thr_frac: float = 0.15) -> dict:
    """Manders coefficients against a fraction-of-per-label-max threshold."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    present = counts(labels, max_labels) > 0
    _, seg_mx = seg_minmax_cols(
        jnp.stack([im1, im2], axis=-1), labels, max_labels
    )
    t1 = jnp.nan_to_num(seg_mx[:, 0]) * thr_frac
    t2 = jnp.nan_to_num(seg_mx[:, 1]) * thr_frac
    lk = table_lookup(
        jnp.stack([t1, t2], axis=-1),
        jnp.clip(labels - 1, 0, max_labels - 1),
    )
    t1_px, t2_px = lk[..., 0], lk[..., 1]
    fg = labels > 0
    above2 = fg & (im2 > t2_px)
    above1 = fg & (im1 > t1_px)
    sums = seg_sum_cols(
        jnp.stack(
            [
                jnp.where(fg, im1, 0.0),
                jnp.where(fg, im2, 0.0),
                jnp.where(above2, im1, 0.0),
                jnp.where(above1, im2, 0.0),
            ],
            axis=-1,
        ),
        labels,
        max_labels,
    )
    m1 = sums[:, 2] / jnp.maximum(sums[:, 0], 1e-12)
    m2 = sums[:, 3] / jnp.maximum(sums[:, 1], 1e-12)
    return {
        "manders_fold": _nanpad(m1, present),
        "manders_fold_2": _nanpad(m2, present),
    }


@functools.partial(jax.jit, static_argnames=("max_labels",))
def rwc(labels, im1, im2, max_labels, thr_frac: float = 0.15) -> dict:
    """Rank-weighted colocalization (Singan et al.), per label.

    Per-label intensity ranks come from the lexicographic sort machinery:
    sort (label, value, pixel-id), scatter positions back, subtract the
    label's run offset.
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    cnt = counts(labels, max_labels)
    present = cnt > 0

    def ranks_of2(ima, imb):
        # BOTH channels ride ONE lexicographic sort (and one scatter) by
        # stacking them on a leading batch axis — lax.sort vectorizes over
        # leading dims, and the ~15 ms fixed cost of a 1M-element sort on
        # v5e dominates the per-element work, so this halves the stage's
        # dominant term vs two single-channel calls.
        flat_l = labels.reshape(-1).astype(jnp.int32)
        N = flat_l.size
        l2 = jnp.broadcast_to(flat_l, (2, N))
        flat_v = jnp.stack([ima.reshape(-1), imb.reshape(-1)])
        ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (2, N))
        sl, svv, sid = jax.lax.sort((l2, flat_v, ids), num_keys=2)
        del svv
        positions = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.float32), (2, N)
        )
        rank_px = (
            jnp.zeros((2, N), jnp.float32)
            .at[jnp.arange(2)[:, None], sid]
            .set(positions)
        )
        n_bg = N - cnt.sum()
        starts = n_bg + jnp.concatenate([jnp.zeros(1), jnp.cumsum(cnt)[:-1]])
        start_px = table_lookup(
            starts[:, None], jnp.clip(flat_l - 1, 0, max_labels - 1)
        )[..., 0]
        return (
            (rank_px[0] - start_px).reshape(labels.shape),
            (rank_px[1] - start_px).reshape(labels.shape),
        )

    r1, r2 = ranks_of2(im1, im2)
    _, seg_mx = seg_minmax_cols(
        jnp.stack([im1, im2], axis=-1), labels, max_labels
    )
    m1max = jnp.nan_to_num(seg_mx[:, 0])
    m2max = jnp.nan_to_num(seg_mx[:, 1])
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    lk = table_lookup(
        jnp.stack(
            [
                jnp.maximum(cnt - 1.0, 1.0),
                m1max * thr_frac,
                m2max * thr_frac,
            ],
            axis=-1,
        ),
        l_idx,
    )
    rmax, t1_px, t2_px = lk[..., 0], lk[..., 1], lk[..., 2]
    weight = (rmax - jnp.abs(r1 - r2)) / rmax
    fg = labels > 0
    coloc = fg & (im1 > t1_px) & (im2 > t2_px)
    sums = seg_sum_cols(
        jnp.stack(
            [
                jnp.where(fg, im1, 0.0),
                jnp.where(fg, im2, 0.0),
                jnp.where(coloc, im1 * weight, 0.0),
                jnp.where(coloc, im2 * weight, 0.0),
            ],
            axis=-1,
        ),
        labels,
        max_labels,
    )
    rwc1 = sums[:, 2] / jnp.maximum(sums[:, 0], 1e-12)
    rwc2 = sums[:, 3] / jnp.maximum(sums[:, 1], 1e-12)
    return {"rwc": _nanpad(rwc1, present), "rwc_2": _nanpad(rwc2, present)}


@functools.partial(jax.jit, static_argnames=("max_labels", "scale_max"))
def costes(labels, im1, im2, max_labels, scale_max: int = 255) -> dict:
    """Costes colocalization, CellProfiler ``linear_costes`` semantics.

    Published algorithm (Costes 2004 / CellProfiler MeasureColocalization):
    1. orthogonal (Deming) regression of im2 on im1 over the object's
       pixels with (im1>0)|(im2>0), sample statistics with ddof=1:
       a = (vy - vx + sqrt((vy-vx)^2 + 4*cov^2)) / (2*cov), b = my - a*mx;
    2. candidate thresholds T1(k) = k*max(im1)/scale_max descending from
       k=scale_max-1, T2(k) = a*T1(k)+b; stop at the first k where the
       Pearson correlation of pixels BELOW either threshold
       (im1 < T1 or im2 < T2) is <= 0;
    3. coefficients C_i = sum of channel i over pixels above BOTH
       thresholds / sum over pixels above its own threshold.

    TPU formulation: the descending scan is evaluated for EVERY k at once
    from a joint histogram binned exactly on the candidate grids (im1 on
    the T1 grid; im2 on the T2 grid via (im2-b)/(a*i_step)) — every
    comparison the scan makes is representable exactly, so the emulation
    matches the per-pixel oracle up to float rounding at bin edges. Stop-k
    = max k with non-positive correlation (the first hit of a descending
    scan). Gated against ``tests/oracle_features.o_costes``.
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    cnt = counts(labels, max_labels)
    present = cnt > 0
    fg = labels > 0
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    # Deming regression over (im1>0)|(im2>0) pixels, ddof=1
    nz = fg & ((im1 > 0) | (im2 > 0))
    reg_stats = seg_sum_cols(
        jnp.where(
            nz[..., None],
            jnp.stack(
                [jnp.ones_like(im1), im1, im2, im1 * im1, im2 * im2, im1 * im2],
                axis=-1,
            ),
            0.0,
        ).reshape(-1, 6),
        jnp.where(nz, labels, 0),
        max_labels,
    )
    n_r, s1_r, s2_r, s11_r, s22_r, s12_r = (reg_stats[:, i] for i in range(6))
    nm1 = jnp.maximum(n_r - 1.0, 1.0)
    mx = s1_r / jnp.maximum(n_r, 1.0)
    my = s2_r / jnp.maximum(n_r, 1.0)
    vx = jnp.maximum((s11_r - n_r * mx * mx) / nm1, 0.0)
    vy = jnp.maximum((s22_r - n_r * my * my) / nm1, 0.0)
    cov = (s12_r - n_r * mx * my) / nm1
    safe_cov = jnp.where(jnp.abs(cov) > 1e-20, cov, 1.0)
    a = ((vy - vx) + jnp.sqrt((vy - vx) ** 2 + 4.0 * cov**2)) / (2.0 * safe_cov)
    b = my - a * mx
    reg_ok = (n_r >= 2) & (jnp.abs(cov) > 1e-20) & (a > 0)
    # exact-grid joint histogram
    m1max = jnp.nan_to_num(
        seg_minmax_cols(im1[..., None], labels, max_labels)[1][:, 0]
    )
    i_step = jnp.maximum(m1max, 1e-20) / scale_max
    B = scale_max + 2
    safe_a = jnp.where(reg_ok, a, 1.0)
    lk_g = table_lookup(jnp.stack([i_step, b, safe_a], axis=-1), l_idx)
    step_px, b_px, a_px = lk_g[..., 0], lk_g[..., 1], lk_g[..., 2]
    bin1 = jnp.clip(jnp.floor(im1 / step_px).astype(jnp.int32), 0, B - 1)
    bin2 = jnp.clip(
        jnp.floor((im2 - b_px) / (a_px * step_px)).astype(jnp.int32),
        0,
        B - 1,
    )
    # The scan only ever tests the SQUARE rectangle {bin1 >= k AND
    # bin2 >= k}, whose indicator is min(bin1, bin2) >= k — so the joint
    # histogram collapses to a 1-D histogram over m = min(bin1, bin2):
    # one (HW, 6) scatter + a suffix cumsum, instead of six (L, B, B)
    # scatters + 2-D cumsums.
    m_bin = jnp.minimum(bin1, bin2)
    flat_bin = (jnp.where(fg, labels, 0) * B + m_bin).reshape(-1)
    stats_cols = jnp.where(
        fg.reshape(-1)[:, None],
        jnp.stack(
            [jnp.ones_like(im1), im1, im2, im1 * im1, im2 * im2, im1 * im2],
            axis=-1,
        ).reshape(-1, 6),
        0.0,
    )
    h = jnp.zeros(((max_labels + 1) * B, 6), jnp.float32).at[flat_bin].add(
        stats_cols
    ).reshape(max_labels + 1, B, 6)[1:]
    above6 = jnp.cumsum(h[:, ::-1, :], axis=1)[:, ::-1, :]  # (L, B, 6)
    above = [above6[..., i] for i in range(6)]
    tot = [s[:, 0:1] for s in above]  # suffix at 0 = all label pixels
    n_b = tot[0] - above[0]
    s1_b = tot[1] - above[1]
    s2_b = tot[2] - above[2]
    s11_b = tot[3] - above[3]
    s22_b = tot[4] - above[4]
    s12_b = tot[5] - above[5]
    safe_n = jnp.maximum(n_b, 1.0)
    cov_b = s12_b / safe_n - (s1_b / safe_n) * (s2_b / safe_n)
    v1_b = jnp.maximum(s11_b / safe_n - (s1_b / safe_n) ** 2, 0.0)
    v2_b = jnp.maximum(s22_b / safe_n - (s2_b / safe_n) ** 2, 0.0)
    denom = jnp.sqrt(v1_b * v2_b)
    corr = cov_b / jnp.maximum(denom, 1e-20)
    ok = (n_b >= 2) & (v1_b > 0) & (v2_b > 0) & (corr <= 0.0)
    ks = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1)
    # scan tests k = scale_max-1 .. 1; first (largest) non-positive k wins
    ok = ok & (ks >= 1) & (ks <= scale_max - 1)
    k_star = jnp.maximum(jnp.max(jnp.where(ok, ks, 0), axis=1), 1)
    t1 = k_star.astype(jnp.float32) * i_step
    t2 = a * t1 + b
    lk_t = table_lookup(jnp.stack([t1, t2], axis=-1), l_idx)
    t1_px, t2_px = lk_t[..., 0], lk_t[..., 1]
    both = fg & (im1 > t1_px) & (im2 > t2_px)
    sums4 = seg_sum_cols(
        jnp.stack(
            [
                jnp.where(fg & (im1 > t1_px), im1, 0.0),
                jnp.where(fg & (im2 > t2_px), im2, 0.0),
                jnp.where(both, im1, 0.0),
                jnp.where(both, im2, 0.0),
            ],
            axis=-1,
        ),
        labels,
        max_labels,
    )
    den1, den2 = sums4[:, 0], sums4[:, 1]
    c1 = sums4[:, 2] / jnp.maximum(den1, 1e-20)
    c2 = sums4[:, 3] / jnp.maximum(den2, 1e-20)
    good = present & reg_ok & (den1 > 0) & (den2 > 0)
    return {"costes": _nanpad(c1, good), "costes_2": _nanpad(c2, good)}


CORRELATION_FEATURES = {
    "pearson": pearson,
    "manders_fold": manders_fold,
    "rwc": rwc,
    "costes": costes,
}
