"""Feature-bank numerics vs per-object numpy/scipy ground truth."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from aliby_tpu.extract import cellfuns, features
from aliby_tpu.ops import edt as edt_mod


def _ellipse_labels(size=96, specs=((30, 30, 10, 6, 0.3), (66, 60, 12, 9, 1.2))):
    yy, xx = np.mgrid[0:size, 0:size]
    labels = np.zeros((size, size), np.int32)
    for i, (cy, cx, a, b, th) in enumerate(specs, start=1):
        u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
        v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
        labels[(u / a) ** 2 + (v / b) ** 2 <= 1] = i
    return labels


@pytest.fixture(scope="module")
def labeled():
    labels = _ellipse_labels()
    rng = np.random.default_rng(0)
    img = rng.uniform(10, 100, labels.shape).astype(np.float32)
    img[labels == 1] += 200
    img[labels == 2] += 50
    return labels, img


def test_edt_matches_scipy(labeled):
    labels, _ = labeled
    mask = labels > 0
    ours = np.asarray(edt_mod.edt(mask))
    ref = ndi.distance_transform_edt(mask)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_other_label_touching():
    # two touching squares: per-label EDT must see the other label as bg
    labels = np.zeros((20, 20), np.int32)
    labels[5:15, 2:10] = 1
    labels[5:15, 10:18] = 2
    d = np.asarray(edt_mod.edt_to_other_label(labels))
    # pixel deep inside label 1 but adjacent to label 2's column
    assert d[10, 9] == 1.0
    ref1 = ndi.distance_transform_edt(labels == 1)
    np.testing.assert_allclose(d[labels == 1], ref1[labels == 1], atol=1e-3)


def test_pixel_metrics_vs_numpy(labeled):
    labels, img = labeled
    L = 8
    out = {
        k: np.asarray(v)
        for k, v in cellfuns.pixel_metrics(labels, img, L).items()
    }
    for lbl in (1, 2):
        sel = img[labels == lbl]
        i = lbl - 1
        assert np.isclose(out["mean"][i], sel.mean(), rtol=1e-5)
        assert np.isclose(out["total"][i], sel.sum(), rtol=1e-5)
        assert np.isclose(out["median"][i], np.median(sel), rtol=1e-5)
        assert np.isclose(out["std"][i], sel.std(), rtol=1e-4)
        n_top = int(np.ceil(sel.size * 0.025))
        ref_top = np.mean(np.sort(sel)[-n_top:])
        assert np.isclose(out["max2p5pc"][i], ref_top, rtol=1e-4)  # f32 cumsum
        ref_m5 = np.mean(np.sort(sel)[-5:]) / np.median(sel)
        assert np.isclose(out["max5px_median"][i], ref_m5, rtol=1e-5)
    # absent labels NaN
    assert np.isnan(out["mean"][5])


def test_mask_metrics_volume_analytic():
    """Reference property test style (tests/extraction/test_volume.py):
    ellipsoid volume within a few % of analytic over radius x ecc grid."""
    size = 128
    for a, b in [(20, 20), (24, 16), (30, 12)]:
        yy, xx = np.mgrid[0:size, 0:size]
        labels = (
            ((xx - 64) / a) ** 2 + ((yy - 64) / b) ** 2 <= 1
        ).astype(np.int32)
        out = {k: np.asarray(v) for k, v in cellfuns.mask_metrics(labels, 8).items()}
        vol_analytic = 4 / 3 * np.pi * a * b * b  # maj=a, min=b
        assert abs(out["volume"][0] - vol_analytic) / vol_analytic < 0.12, (a, b)
        ecc_analytic = np.sqrt(a**2 - b**2) / a
        assert abs(out["eccentricity"][0] - ecc_analytic) < 0.12


def test_sizeshape_core(labeled):
    labels, _ = labeled
    out = {k: np.asarray(v) for k, v in features.sizeshape(labels, 8).items()}
    for lbl in (1, 2):
        i = lbl - 1
        mask = labels == lbl
        assert out["AreaShape_Area"][i] == mask.sum()
        cy, cx = ndi.center_of_mass(mask)
        assert np.isclose(out["AreaShape_Center_Y"][i], cy, atol=1e-3)
        assert np.isclose(out["AreaShape_Center_X"][i], cx, atol=1e-3)
        ys, xs = np.nonzero(mask)
        assert out["AreaShape_BoundingBoxMinimum_Y"][i] == ys.min()
        assert out["AreaShape_BoundingBoxMaximum_X"][i] == xs.max()
        bbox_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert np.isclose(out["AreaShape_Extent"][i], mask.sum() / bbox_area, rtol=1e-5)
        assert out["AreaShape_EulerNumber"][i] == 1.0
        assert 0.9 <= out["AreaShape_Solidity"][i] <= 1.01
    # ellipse axes vs specs (a=10,b=6 for label 1)
    assert abs(out["AreaShape_MajorAxisLength"][0] - 20) < 1.5
    assert abs(out["AreaShape_MinorAxisLength"][0] - 12) < 1.5


def test_sizeshape_euler_with_hole():
    labels = np.zeros((40, 40), np.int32)
    labels[5:25, 5:25] = 1
    labels[12:18, 12:18] = 0  # a hole
    out = features.sizeshape(labels, 4)
    assert np.asarray(out["AreaShape_EulerNumber"])[0] == 0.0


def test_perimeter_square():
    # a 10x10 square has a weighted perimeter near 4*9=36
    labels = np.zeros((20, 20), np.int32)
    labels[5:15, 5:15] = 1
    p = float(np.asarray(features.sizeshape(labels, 4)["AreaShape_Perimeter"])[0])
    assert 30 < p < 40


def test_intensity_vs_numpy(labeled):
    labels, img = labeled
    out = {k: np.asarray(v) for k, v in features.intensity(labels, img, 8).items()}
    for lbl in (1, 2):
        i = lbl - 1
        sel = img[labels == lbl]
        assert np.isclose(out["Intensity_IntegratedIntensity"][i], sel.sum(), rtol=1e-5)
        assert np.isclose(out["Intensity_MeanIntensity"][i], sel.mean(), rtol=1e-5)
        assert np.isclose(out["Intensity_MedianIntensity"][i], np.median(sel), rtol=1e-5)
        assert np.isclose(
            out["Intensity_LowerQuartileIntensity"][i],
            np.percentile(sel, 25),
            rtol=1e-4,
        )
        mad_ref = np.median(np.abs(sel - np.median(sel)))
        assert np.isclose(out["Intensity_MADIntensity"][i], mad_ref, rtol=1e-4)
    # max intensity location
    mask1 = labels == 1
    masked = np.where(mask1, img, -np.inf)
    my, mx = np.unravel_index(np.argmax(masked), img.shape)
    assert out["Location_MaxIntensity_Y"][0] == my
    assert out["Location_MaxIntensity_X"][0] == mx


def test_pearson_vs_numpy(labeled):
    labels, img = labeled
    rng = np.random.default_rng(1)
    img2 = 0.6 * img + rng.normal(0, 5, img.shape).astype(np.float32)
    out = features.pearson(labels, img, img2, 8)
    for lbl in (1, 2):
        sel = labels == lbl
        ref = np.corrcoef(img[sel], img2[sel])[0, 1]
        assert np.isclose(float(np.asarray(out["pearson"])[lbl - 1]), ref, atol=1e-4)


def test_manders_and_rwc_ranges(labeled):
    labels, img = labeled
    img2 = img[::-1, ::-1].copy()
    m = features.manders_fold(labels, img, img2, 8)
    r = features.rwc(labels, img, img2, 8)
    for d in (m, r):
        for v in d.values():
            vals = np.asarray(v)[:2]
            assert np.all((vals >= -1e-6) & (vals <= 1.0 + 1e-6))
    # costes (linear_costes semantics) needs a positive Deming slope;
    # anticorrelated channels are NaN by convention (oracle agrees), so
    # range-check it on a correlated pair instead
    rng = np.random.default_rng(0)
    img3 = (0.7 * img + rng.normal(0, 2, img.shape)).astype(np.float32)
    c = features.costes(labels, img, img3, 8)
    for v in c.values():
        vals = np.asarray(v)[:2]
        assert np.all((vals >= -1e-6) & (vals <= 1.0 + 1e-6))
    # arbitrary (reversed) channel pairs may land anywhere incl. NaN when
    # the Deming slope is non-positive — just require in-range-or-NaN
    c_anti = features.costes(labels, img, img2, 8)
    for v in c_anti.values():
        vals = np.asarray(v)[:2]
        ok = np.isnan(vals) | ((vals >= -1e-6) & (vals <= 1.0 + 1e-6))
        assert ok.all()


def test_background_metrics(labeled):
    labels, img = labeled
    out = cellfuns.background_metrics(labels, img)
    bg = img[labels == 0]
    assert np.isclose(float(out["imBackground"]), np.median(bg), rtol=1e-5)
    assert np.isclose(float(out["background_max5"]), np.sort(bg)[-5:].mean(), rtol=1e-5)


def test_localisation_features(labeled):
    """nuc_est_conv responds to a nuclear hot-spot; small_peaks_conv runs."""
    import jax.numpy as jnp

    from aliby_tpu.extract import localisation as loc

    labels, img = labeled
    # plant a bright nuclear blob inside label 1
    img2 = img.copy()
    yy, xx = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
    img2 += 500 * np.exp(-((yy - 30) ** 2 + (xx - 30) ** 2) / (2 * 3.0**2)) * (
        labels == 1
    )
    v_hot = np.asarray(loc.nuc_est_conv(jnp.asarray(labels), jnp.asarray(img2), 8))
    v_flat = np.asarray(loc.nuc_est_conv(jnp.asarray(labels), jnp.asarray(img), 8))
    assert np.isfinite(v_hot[0]) and np.isfinite(v_flat[0])
    assert v_hot[0] > 2 * v_flat[0]  # localisation signal detected
    assert np.isnan(v_hot[5])  # absent labels NaN
    sp = np.asarray(loc.small_peaks_conv(jnp.asarray(labels), jnp.asarray(img2), 8))
    assert np.isfinite(sp[:2]).all()


def test_localisation_through_tree(labeled):
    from aliby_tpu.extract import process_tree_masks

    labels, img = labeled
    pixels = img[None, None, None]
    tree = {0: {"None": ["nuc_est_conv", "small_peaks_conv"]}}
    instructions, results = process_tree_masks(tree, [labels], pixels)
    assert len(results) == 2 * 2  # 2 labels x 2 metrics
    assert all(isinstance(r, float) for r in results)


def test_min_maj_parity_with_reference_chain():
    """Exact parity with the reference's scipy EDT-cone construction
    (cell.py min_maj_approximation) across an ellipse grid — the analytic
    deviation that remains (<=9%) is the reference algorithm's own integer
    rounding, reproduced faithfully."""
    import scipy.ndimage as ndi

    from aliby_tpu.extract.cellfuns import min_maj_approximation

    def ref_min_maj(cell_mask):
        padded = np.pad(cell_mask, 1, mode="constant", constant_values=0)
        nn = ndi.distance_transform_edt(padded == 1) * padded
        dn = ndi.distance_transform_edt(nn - nn.max()) * padded
        cone_top = ndi.distance_transform_edt(dn == 0) * padded
        return np.round(np.max(nn)), np.round(np.max(dn) + np.sum(cone_top) / 2)

    size = 160
    yy, xx = np.mgrid[0:size, 0:size]
    for a, ratio, th in [
        (24, 0.4, 0.0), (24, 0.6, 1.1), (30, 0.4, 0.5),
        (18, 1.0, 0.0), (20, 0.75, 0.3),
    ]:
        b = a * ratio
        u = (xx - 80) * np.cos(th) + (yy - 80) * np.sin(th)
        v = -(xx - 80) * np.sin(th) + (yy - 80) * np.cos(th)
        mask = (((u / a) ** 2 + (v / b) ** 2) <= 1).astype(np.int32)
        rmin, rmaj = ref_min_maj(mask)
        mine_min, mine_maj = min_maj_approximation(mask, 8)
        assert float(np.asarray(mine_min)[0]) == rmin, (a, ratio, th)
        assert float(np.asarray(mine_maj)[0]) == rmaj, (a, ratio, th)


def test_perimeter_exact_parity_with_skimage_algorithm():
    """Bit-exact match with skimage.measure.perimeter's weighted border
    construction (reimplemented in scipy here) on isolated ellipses."""
    from aliby_tpu.extract.features import sizeshape as _sizeshape

    def skimage_perimeter(image):
        strel = ndi.generate_binary_structure(2, 1)
        image = image.astype(np.uint8)
        eroded = ndi.binary_erosion(image, strel, border_value=0)
        border = image ^ eroded
        w = np.zeros(50)
        w[[5, 7, 15, 17, 25, 27]] = 1
        w[[21, 33]] = np.sqrt(2)
        w[[13, 23]] = (1 + np.sqrt(2)) / 2
        pim = ndi.convolve(
            border.astype(np.double),
            np.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]]),
            mode="constant", cval=0,
        )
        return (w * np.bincount(pim.ravel().astype(int), minlength=50)).sum()

    rng = np.random.default_rng(0)
    size = 96
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(4):
        labels = np.zeros((size, size), np.int32)
        cy, cx = rng.integers(25, 70, 2)
        a, b = rng.uniform(8, 16, 2)
        th = rng.uniform(0, np.pi)
        u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
        v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
        labels[((u / a) ** 2 + (v / b) ** 2) <= 1] = 1
        ref = skimage_perimeter(labels == 1)
        mine = float(np.asarray(_sizeshape(labels, 4)["AreaShape_Perimeter"])[0])
        assert abs(ref - mine) < 1e-3


def test_radial_distribution_large_image_path():
    """radial_distribution's most-interior-pixel center argmax used to pack
    the raster position into 16 bits — silently corrupt on any image over
    65536 pixels (e.g. 293x293 yeast monotiles). The large-image two-pass
    path must agree with the (oracle-gated) packed fast path: the features
    are translation-invariant, so embedding the same objects in a >256^2
    canvas must reproduce the small-canvas values exactly."""
    from aliby_tpu.extract.texture import radial_distribution

    labels = _ellipse_labels()
    rng = np.random.default_rng(3)
    img = rng.uniform(10, 100, labels.shape).astype(np.float32)

    small = {
        k: np.asarray(v)[:2]
        for k, v in radial_distribution(labels, img, max_labels=8).items()
    }
    H, W = 293, 300  # H*W > 2^16 -> two-pass path
    big_l = np.zeros((H, W), np.int32)
    big_i = np.zeros((H, W), np.float32)
    oy, ox = 150, 170
    big_l[oy : oy + labels.shape[0], ox : ox + labels.shape[1]] = labels
    big_i[oy : oy + labels.shape[0], ox : ox + labels.shape[1]] = img
    big = {
        k: np.asarray(v)[:2]
        for k, v in radial_distribution(big_l, big_i, max_labels=8).items()
    }
    assert small.keys() == big.keys()
    for k in small:
        np.testing.assert_allclose(big[k], small[k], rtol=1e-5, err_msg=k)


def test_mad_from_sorted_matches_residual_sort_oracle():
    """The sort-free MAD selection (two-sorted-halves k-th element from the
    VALUE sort) must match median(|v - median|) computed the direct way —
    including empty labels (NaN), singletons (0), and even/odd run lengths."""
    import jax.numpy as jnp

    from aliby_tpu.extract.reductions import (
        mad_from_sorted,
        quantile_from_sorted,
        sorted_by_label,
    )

    rng = np.random.default_rng(11)
    L = 24
    for trial in range(12):
        labels = rng.integers(0, L + 1, (48, 48)).astype(np.int32)
        # force edge cases: an absent label, a singleton label
        labels[labels == 5] = 0
        labels[labels == 7] = 0
        labels[0, 0] = 7
        img = rng.normal(size=(48, 48)).astype(np.float32)
        sv, starts, cnt = sorted_by_label(jnp.asarray(img), jnp.asarray(labels), L)
        med = quantile_from_sorted(sv, starts, cnt, 0.5)
        got = np.asarray(mad_from_sorted(sv, starts, cnt, med))
        for k in range(1, L + 1):
            v = img[labels == k]
            if v.size == 0:
                assert np.isnan(got[k - 1]), (trial, k)
                continue
            m = np.quantile(v, 0.5).astype(np.float32)
            ref = np.quantile(np.abs(v - m), 0.5)
            np.testing.assert_allclose(got[k - 1], ref, rtol=1e-5, atol=1e-6,
                                       err_msg=f"trial {trial} label {k}")
