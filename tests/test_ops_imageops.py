"""Image primitives vs scipy / analytic ground truth."""

import numpy as np
import scipy.ndimage as ndi
import scipy.signal

from aliby_tpu.ops import imageops as I


def test_otsu_bimodal():
    rng = np.random.default_rng(0)
    img = np.concatenate([rng.normal(50, 5, 4000), rng.normal(200, 10, 2000)])
    thr = float(I.otsu_threshold(img.reshape(60, 100)))
    # plateau argmax lands just above mode 1; must separate the modes
    assert 60 < thr < 180


def test_gaussian_blur_matches_scipy():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(48, 52)).astype(np.float32)
    ours = np.asarray(I.gaussian_blur(img, 2.0))
    ref = ndi.gaussian_filter(img, 2.0, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_binary_morphology():
    mask = np.zeros((20, 20), bool)
    mask[8:12, 8:12] = True
    grown = np.asarray(I.binary_dilation(mask, 2, connectivity=2))
    ref = ndi.binary_dilation(mask, ndi.generate_binary_structure(2, 2), iterations=2)
    np.testing.assert_array_equal(grown, ref)
    shrunk = np.asarray(I.binary_erosion(mask, 1))
    ref_e = ndi.binary_erosion(mask, ndi.generate_binary_structure(2, 1), 1)
    np.testing.assert_array_equal(shrunk, ref_e)


def test_clear_border():
    lbl = np.zeros((10, 10), np.int32)
    lbl[0:3, 0:3] = 1  # touches border
    lbl[5:8, 5:8] = 2  # interior
    out = np.asarray(I.clear_border(lbl))
    assert (out == 1).sum() == 0
    assert (out == 2).sum() == 9


def test_match_template_finds_target():
    rng = np.random.default_rng(2)
    img = rng.normal(0, 0.05, (80, 80)).astype(np.float32)
    tpl = np.zeros((9, 9), np.float32)
    tpl[2:7, 2:7] = 1.0
    img[30:39, 50:59] += tpl
    ncc = np.asarray(I.match_template(img, tpl))
    peak = np.unravel_index(np.argmax(ncc), ncc.shape)
    assert abs(peak[0] - 34) <= 1 and abs(peak[1] - 54) <= 1
    assert ncc.max() <= 1.0 + 1e-5


def test_phase_cross_correlation_recovers_shift():
    rng = np.random.default_rng(3)
    base = ndi.gaussian_filter(rng.normal(size=(128, 128)), 3)
    shifted = np.roll(np.roll(base, 5, axis=0), -7, axis=1)
    # convention: shift to register moving onto reference
    dy, dx = np.asarray(I.phase_cross_correlation(shifted, base))
    assert (round(float(dy)), round(float(dx))) == (5, -7)
    # host (numpy) variant — the tiler's drift path — matches exactly
    dyh, dxh = I.phase_cross_correlation_host(shifted, base)
    assert (round(float(dyh)), round(float(dxh))) == (5, -7)


def test_peak_local_max():
    img = np.zeros((40, 40), np.float32)
    img[10, 10] = 5.0
    img[30, 12] = 4.0
    img[11, 12] = 3.0  # within min_distance of the first peak
    coords, valid = I.peak_local_max(img, min_distance=3, threshold=0.5, max_peaks=8)
    coords = np.asarray(coords)[np.asarray(valid)]
    assert [tuple(c) for c in coords[:2]] == [(10, 10), (30, 12)]
    assert len(coords) == 2


def test_entropy_filter_flat_vs_textured():
    rng = np.random.default_rng(4)
    img = np.zeros((40, 40), np.float32)
    img[:, 20:] = rng.uniform(0, 1, (40, 20))
    ent = np.asarray(I.entropy_filter(img, radius=4))
    assert ent[:, :12].mean() < 0.5
    assert ent[:, 28:].mean() > 2.0


def test_order_statistics_exact_vs_sort():
    # bit-exact selection: ranks, duplicates, constants, denormals, negatives
    rng = np.random.default_rng(11)
    cases = []
    for n in (5, 64, 65, 1000, 4096):
        cases.append(rng.normal(0, 1, n).astype(np.float32))
        cases.append(rng.integers(-4, 4, n).astype(np.float32))  # duplicates
        cases.append(np.full(n, rng.normal(), np.float32))
        cases.append(rng.normal(0, 1e-38, n).astype(np.float32))  # subnormals
    for x in cases:
        n = x.size
        ranks = tuple(sorted({0, n - 1, n // 2, int(rng.integers(0, n))}))
        got = np.asarray(I.order_statistics(x, ranks))
        want = np.sort(x)[list(ranks)]
        assert np.array_equal(got, want), (n, ranks)


def test_percentile_pair_matches_numpy():
    # the normalization spec is NUMPY's linear percentile (what upstream
    # cellpose calls); order statistics are exact, the lerp agrees to f32
    # rounding (numpy interpolates the fraction in f64)
    rng = np.random.default_rng(12)
    for n in (100, 4096, 65536):
        for x in (
            rng.normal(0, 1, n).astype(np.float32),
            rng.integers(0, 7, n).astype(np.float32),
        ):
            lo, hi = I.percentile_pair(x.reshape(-1), 1.0, 99.0)
            want_lo, want_hi = np.percentile(x, [1.0, 99.0])
            np.testing.assert_allclose(float(lo), want_lo, rtol=1e-6)
            np.testing.assert_allclose(float(hi), want_hi, rtol=1e-6)
