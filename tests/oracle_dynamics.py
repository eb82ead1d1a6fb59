"""Independent NumPy/SciPy oracle for Cellpose-style flow dynamics.

This is a from-the-paper reimplementation of the mask-reconstruction
pipeline the reference consumes through ``model.eval`` at
``/root/reference/src/aliby/segment/dispatch.py:172-248``: the published
Cellpose dynamics (Stringer et al., Nat. Methods 2021) —

1. ``follow_flows_oracle``: ~200 explicit Euler steps per foreground pixel,
   flow sampled with bilinear interpolation at the current (float) position,
   positions clipped to the image.
2. ``get_masks_oracle``: histogram clustering of the converged positions on
   an ``rpad``-padded grid; seeds are local maxima of the histogram (size-5
   separable maximum filter) with count > 10; each seed region is expanded
   for 5 rounds into 3x3 neighbours whose histogram count > 2; every
   foreground pixel is labeled by the seed region its converged position
   falls in; masks covering > 40% of the image are dropped.
3. ``flow_error_qc``: recompute flows from the candidate masks (heat
   diffusion from object centers in the UPSTREAM shape — per-object
   bounding-box crops with size-scaled iteration counts, cellpose
   ``dynamics.masks_to_flows_cpu`` — sharing neither code nor the
   production path's fixed whole-image iteration budget) and drop masks
   whose mean squared flow error exceeds the threshold (cellpose
   flow_threshold, default 0.4).
4. ``fill_holes_and_remove_small``: per-mask binary hole filling + minimum
   size, cellpose ``utils.fill_holes_and_remove_small_masks`` behavior.

Flow convention: this repo's flows are unit vectors (normalized gradient of
the log-heat); cellpose's network predicts 5x-scaled flows and divides by 5
before integration. The oracle therefore consumes unit flows directly —
both the oracle and the production path (`aliby_tpu.models.flows`) are fed
the SAME predicted flow field, so the convention cancels out of the parity
measurement (tests/test_dynamics_parity.py).

Used only by tests — deliberately slow and literal.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import (
    binary_fill_holes,
    map_coordinates,
    maximum_filter1d,
)


def follow_flows_oracle(
    flows: np.ndarray, fg: np.ndarray, niter: int = 200
) -> np.ndarray:
    """Euler-integrate foreground pixels along (2, H, W) flows.

    Returns (2, H, W) float positions; background pixels stay put.
    """
    H, W = fg.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    p = np.stack([yy, xx])
    ys, xs = np.nonzero(fg)
    pts = np.stack([ys.astype(np.float64), xs.astype(np.float64)])
    for _ in range(niter):
        dy = map_coordinates(flows[0], pts, order=1, mode="nearest")
        dx = map_coordinates(flows[1], pts, order=1, mode="nearest")
        pts[0] = np.clip(pts[0] + dy, 0, H - 1)
        pts[1] = np.clip(pts[1] + dx, 0, W - 1)
    p[0][ys, xs] = pts[0]
    p[1][ys, xs] = pts[1]
    return p


def get_masks_oracle(
    p: np.ndarray, fg: np.ndarray, rpad: int = 20
) -> np.ndarray:
    """Histogram-cluster converged positions into a (H, W) uint32 label map."""
    H, W = fg.shape
    py = (np.round(p[0]).astype(np.int64) + rpad)[fg]
    px = (np.round(p[1]).astype(np.int64) + rpad)[fg]
    hH, hW = H + 2 * rpad, W + 2 * rpad
    h = np.zeros((hH, hW), np.float64)
    np.add.at(h, (py, px), 1.0)

    hmax = maximum_filter1d(h, 5, axis=0)
    hmax = maximum_filter1d(hmax, 5, axis=1)
    seed_y, seed_x = np.nonzero((h - hmax > -1e-6) & (h > 10))
    order = np.argsort(h[seed_y, seed_x])[::-1]
    seed_y, seed_x = seed_y[order], seed_x[order]

    # grow each seed: 5 rounds of 3x3 dilation restricted to bins with h > 2
    offs = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    regions = []
    for sy, sx in zip(seed_y, seed_x):
        ry = np.array([sy], np.int64)
        rx = np.array([sx], np.int64)
        for _ in range(5):
            ny = (ry[:, None] + offs[:, 0]).ravel()
            nx = (rx[:, None] + offs[:, 1]).ravel()
            ok = (ny >= 0) & (ny < hH) & (nx >= 0) & (nx < hW)
            ny, nx = ny[ok], nx[ok]
            good = h[ny, nx] > 2
            flat = np.unique(ny[good] * hW + nx[good])
            ry, rx = flat // hW, flat % hW
        regions.append((ry, rx))

    M = np.zeros((hH, hW), np.uint32)
    for k, (ry, rx) in enumerate(regions):
        M[ry, rx] = k + 1

    labels = np.zeros((H, W), np.uint32)
    labels[fg] = M[py, px]

    # drop megamasks covering > 40% of the image (cellpose get_masks tail)
    ids, counts = np.unique(labels[labels > 0], return_counts=True)
    for i in ids[counts > 0.4 * H * W]:
        labels[labels == i] = 0
    return _renumber(labels)


def _renumber(labels: np.ndarray) -> np.ndarray:
    ids = np.unique(labels)
    ids = ids[ids > 0]
    out = np.zeros_like(labels)
    for new, old in enumerate(ids, start=1):
        out[labels == old] = new
    return out


def _same_label_shift_np(arr, labels, dy, dx):
    """Value of the (dy, dx) neighbor where it shares the pixel's label,
    NaN elsewhere (pure NumPy twin of the repo's flow-synthesis helper —
    independent implementation of the same published definition)."""
    H, W = arr.shape
    a = np.pad(arr, 1, constant_values=0.0)
    l = np.pad(labels, 1, constant_values=-1)
    sh = a[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
    sl = l[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
    return np.where(sl == labels, sh, np.nan)


def masks_to_flows_oracle(
    labels: np.ndarray, n_iter: int | None = None
) -> np.ndarray:
    """Unit flow field by heat diffusion from each object's median-center
    pixel — the published cellpose training-target construction in its
    UPSTREAM shape (``dynamics.masks_to_flows_cpu``): each object is
    processed on its own padded bounding-box crop with a SIZE-SCALED
    iteration count ``niter_i = 2 * (ptp(y) + ptp(x))``, per iteration the
    center gains +1 and every object pixel becomes the mean of its 3x3
    neighborhood with absorbing zero boundaries outside the object; flows
    are the unit-normalized gradient of log1p(heat).

    NumPy-only and per-object-cropped so ``flow_error_qc`` shares NEITHER
    code NOR the production path's fixed whole-image iteration budget
    (``models/flows.masks_to_flows`` uses a fixed ``n_iter=96`` for static
    jit shapes; PARITY.md documents that budget's convergence bound — this
    oracle independently validates it instead of assuming it). Pass
    ``n_iter`` to force a fixed count (legacy behavior for targeted tests).
    """
    H, W = labels.shape
    labels = labels.astype(np.int64)
    fg = labels > 0
    gy = np.zeros((H, W))
    gx = np.zeros((H, W))
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)]
    for i in np.unique(labels[fg]):
        ys, xs = np.nonzero(labels == i)
        # padded crop (pad 2 so every object pixel has in-crop neighbors
        # even at the image border; out-of-image rows simply read as
        # background = absorbing, identical to upstream's +1 pad)
        y0, y1 = max(int(ys.min()) - 2, 0), min(int(ys.max()) + 3, H)
        x0, x1 = max(int(xs.min()) - 2, 0), min(int(xs.max()) + 3, W)
        sel = (labels[y0:y1, x0:x1] == i)
        cys, cxs = ys - y0, xs - x0
        # center = object pixel closest to the coordinate median, first in
        # raster order on ties (cellpose's np.argmin over the pixel list)
        ymed, xmed = np.median(cys), np.median(cxs)
        k = int(np.argmin((cys - ymed) ** 2 + (cxs - xmed) ** 2))
        src = np.zeros(sel.shape)
        src[cys[k], cxs[k]] = 1.0
        ni = int(n_iter) if n_iter else 2 * int(np.ptp(ys) + np.ptp(xs)) + 2
        ch, cw = sel.shape
        T = np.zeros(sel.shape)
        for _ in range(ni):
            T = T + src
            acc = T.copy()
            for dy, dx in offs:
                a = np.pad(T, 1)
                s = np.pad(sel, 1)
                nbv = a[1 + dy : ch + 1 + dy, 1 + dx : cw + 1 + dx]
                nbs = s[1 + dy : ch + 1 + dy, 1 + dx : cw + 1 + dx]
                acc += np.where(nbs, nbv, 0.0)
            T = np.where(sel, acc / 9.0, 0.0)
        logT = np.log1p(T)

        def grad_axis(dy, dx):
            a = np.pad(logT, 1)
            s = np.pad(sel, 1)
            plus = np.where(
                s[1 + dy : ch + 1 + dy, 1 + dx : cw + 1 + dx],
                a[1 + dy : ch + 1 + dy, 1 + dx : cw + 1 + dx], 0.0,
            )
            minus = np.where(
                s[1 - dy : ch + 1 - dy, 1 - dx : cw + 1 - dx],
                a[1 - dy : ch + 1 - dy, 1 - dx : cw + 1 - dx], 0.0,
            )
            return (plus - minus) / 2.0

        cgy, cgx = grad_axis(1, 0), grad_axis(0, 1)
        gy[ys, xs] = cgy[cys, cxs]
        gx[ys, xs] = cgx[cys, cxs]
    mag = np.sqrt(gy**2 + gx**2)
    gy = np.where(fg, gy / np.maximum(mag, 1e-20), 0.0)
    gx = np.where(fg, gx / np.maximum(mag, 1e-20), 0.0)
    return np.stack([gy, gx]).astype(np.float32)


def flow_error_qc(
    labels: np.ndarray, flows: np.ndarray, threshold: float = 0.4
) -> np.ndarray:
    """Remove masks whose recomputed flows disagree with the predicted
    flows (mean squared error over the mask > threshold)."""
    if labels.max() == 0:
        return labels
    mask_flows = masks_to_flows_oracle(labels)
    err = ((mask_flows - flows) ** 2).sum(axis=0)
    out = labels.copy()
    for i in range(1, int(labels.max()) + 1):
        sel = labels == i
        if sel.any() and float(err[sel].mean()) > threshold:
            out[sel] = 0
    return _renumber(out)


def fill_holes_and_remove_small(
    labels: np.ndarray, min_size: int = 15
) -> np.ndarray:
    """Per-mask hole filling + minimum-size removal (cellpose utils)."""
    out = np.zeros_like(labels)
    new = 0
    for i in range(1, int(labels.max()) + 1):
        sel = labels == i
        n = int(sel.sum())
        if n == 0 or n < min_size:
            continue
        filled = binary_fill_holes(sel)
        new += 1
        out[filled] = new
    return out


def compute_masks_oracle(
    flows: np.ndarray,
    cellprob: np.ndarray,
    cellprob_threshold: float = 0.0,
    niter: int = 200,
    flow_threshold: float | None = 0.4,
    min_size: int = 15,
) -> np.ndarray:
    """Full oracle pipeline: (2,H,W) flows + (H,W) logit -> (H,W) labels."""
    fg = cellprob > cellprob_threshold
    if not fg.any():
        return np.zeros(fg.shape, np.uint32)
    p = follow_flows_oracle(flows, fg, niter=niter)
    labels = get_masks_oracle(p, fg)
    if flow_threshold is not None and labels.max() > 0:
        labels = flow_error_qc(labels, flows, threshold=flow_threshold)
    return fill_holes_and_remove_small(labels, min_size=min_size)
