"""Trap detection + drift under realistic bright-field degradations
(VERDICT r2 item #8).

The reference's detector is tuned on real ALCATRAS bright-field
(entropy/Otsu front-end, 0.3*ts..ts axis filters, NCC over 4 rotations x
10 scales — ``/root/reference/src/aliby/tile/process_traps.py:24-218``).
These property tests assert the port survives plausible real-world
conditions instead of only the clean synthetic grid:

- multiplicative illumination gradients (vignetting / lamp misalignment),
- defocus blur,
- debris blobs (dust, dead cells) brighter and darker than background,
- partial traps cut by the field edge,
- occupied traps (cells inside the U), and
- frame-to-frame drift with all of the above.

Failure mode guarded against: the entropy/NCC front-end silently falling
back to the center monotile (``tiler.py`` fallback) on inputs a real scope
produces routinely.
"""

from __future__ import annotations

import numpy as np
import pytest

from scipy.ndimage import gaussian_filter


def render_trap_field(
    size: int = 420,
    spacing: int = 60,
    trap: int = 18,
    seed: int = 0,
    illumination: float = 0.0,
    defocus: float = 0.0,
    n_debris: int = 0,
    occupancy: float = 0.0,
    edge_offset: int = 20,
    drift: tuple[float, float] = (0.0, 0.0),
):
    """Bright-field-like trap grid with controlled degradations.

    Returns (image, interior_truth_centres). Traps whose centre is within
    trap size of the border are rendered but excluded from truth (the
    detector's edge filter legitimately drops them).
    """
    rng = np.random.default_rng(seed)
    img = rng.normal(100.0, 3.0, (size, size)).astype(np.float32)
    n = (size - 2 * edge_offset) // spacing
    centres = []
    dy, dx = drift
    for i in range(n + 1):  # +1 row/col so some traps straddle the edge
        for j in range(n + 1):
            cy = edge_offset + spacing // 2 + i * spacing + dy
            cx = edge_offset + spacing // 2 + j * spacing + dx
            iy, ix = int(round(cy)), int(round(cx))
            h = trap // 2
            ys = slice(max(0, iy - h), min(size, iy + h))

            def xs(a, b):
                return slice(max(0, a), min(size, b))

            img[ys, xs(ix - h, ix - h + 3)] += 80
            img[ys, xs(ix + h - 3, ix + h)] += 80
            img[
                slice(max(0, iy + h - 3), min(size, iy + h)),
                xs(ix - h, ix + h),
            ] += 80
            if rng.uniform() < occupancy:
                yy, xx = np.mgrid[0:size, 0:size]
                cell = (yy - iy) ** 2 + (xx - ix + 2) ** 2 <= (h - 5) ** 2
                img[cell] += rng.uniform(20, 45)
            margin = trap
            if margin <= iy <= size - margin and margin <= ix <= size - margin:
                centres.append((cy, cx))
    for _ in range(n_debris):
        yy, xx = np.mgrid[0:size, 0:size]
        by, bx = rng.uniform(0, size, 2)
        r = rng.uniform(3, 9)
        blob = (yy - by) ** 2 + (xx - bx) ** 2 <= r**2
        img[blob] += rng.choice([-60.0, 120.0])
    if defocus > 0:
        img = gaussian_filter(img, defocus)
    if illumination > 0:
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        ramp = 1.0 + illumination * (
            (yy / size - 0.5) + 0.6 * (xx / size - 0.5)
        )
        img = img * ramp
    return img.astype(np.float32), np.asarray(centres, np.float64)


def _recovery(found: np.ndarray, truth: np.ndarray, tol: float = 9.0):
    if len(found) == 0:
        return 0.0, np.inf
    d = np.sqrt(
        ((found[:, None, :] - truth[None, :, :]) ** 2).sum(-1)
    ).min(axis=0)
    rate = float((d < tol).mean())
    dd = np.sqrt(
        ((found[:, None, :] - truth[None, :, :]) ** 2).sum(-1)
    ).min(axis=1)
    return rate, float(np.median(dd))


SWEEP = [
    dict(),  # clean baseline
    dict(illumination=0.35),
    dict(defocus=1.5),
    dict(n_debris=25),
    dict(occupancy=0.7),
    dict(illumination=0.25, defocus=1.0, n_debris=12, occupancy=0.5),
]


@pytest.mark.parametrize("degr", SWEEP, ids=[
    "clean", "illum", "defocus", "debris", "occupied", "combined",
])
def test_trap_grid_recovery_under_degradation(degr):
    from aliby_tpu.tile.traps import segment_traps

    img, truth = render_trap_field(seed=3, **degr)
    found = segment_traps(img, tile_size=40, min_traps=10)
    rate, med = _recovery(np.asarray(found, float), truth)
    assert len(found) >= 0.7 * len(truth), (
        f"only {len(found)}/{len(truth)} traps under {degr}"
    )
    assert rate >= 0.7, f"recovery {rate:.2f} under {degr}"
    assert med < 9.0, f"median centre error {med:.1f}px under {degr}"


def test_tiler_does_not_fall_back_on_realistic_field(tmp_path):
    """The Tiler must find a real grid (not the center monotile) on a
    degraded field: the fallback emits exactly one tile."""
    from aliby_tpu.tile.tiler import dispatch_tiler

    img, truth = render_trap_field(
        seed=5, illumination=0.25, defocus=1.0, n_debris=10, occupancy=0.5
    )

    class _Img:
        data = img[None, None, None]  # TCZYX
        meta = {}

    tiler = dispatch_tiler(tile_size=40, track_drift=False)(_Img())
    result = tiler.run_tp(0)
    assert tiler.n_tiles >= 0.6 * len(truth), (
        f"{tiler.n_tiles} tiles vs {len(truth)} true traps — monotile "
        "fallback on a realistic field"
    )
    assert result["pixels"].shape[3:] == (40, 40)


def test_drift_tracking_under_degradation():
    """Known inter-frame drift is recovered by phase correlation on a
    degraded field (median |error| <= 1 px over several frames)."""
    from aliby_tpu.tile.tiler import dispatch_tiler

    shifts = [(0.0, 0.0), (2.0, -3.0), (5.0, -5.0), (7.0, -4.0)]
    frames = []
    for k, (dy, dx) in enumerate(shifts):
        img, _ = render_trap_field(
            seed=11,  # SAME seed: one field, moving
            illumination=0.2,
            defocus=0.8,
            drift=(dy, dx),
        )
        frames.append(img)
    stack = np.stack(frames)[:, None, None]  # TCZYX

    class _Img:
        data = stack
        meta = {}

    tiler = dispatch_tiler(tile_size=40, track_drift=True)(_Img())
    for t in range(len(shifts)):
        tiler.run_tp(t)
    drifts = np.cumsum(np.asarray(tiler.tile_locs.drifts), axis=0)
    for k in range(1, len(shifts)):
        dy, dx = shifts[k]
        got = drifts[k]
        err = np.abs(np.asarray([dy, dx]) - np.abs(got) * np.sign([dy, dx]) * np.sign(np.abs(got)))
        # sign convention: compare magnitude of the recovered total shift
        assert abs(abs(got[0]) - abs(dy)) <= 1.5 and abs(abs(got[1]) - abs(dx)) <= 1.5, (
            f"tp{k}: drift {got} vs true {(dy, dx)}"
        )
