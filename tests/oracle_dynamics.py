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
   diffusion from object centers — the aliby-tpu trainer's definition,
   which matches cellpose's up to the unit-normalization convention used
   throughout this repo) and drop masks whose mean squared flow error
   exceeds the threshold (cellpose flow_threshold, default 0.4).
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


def masks_to_flows_oracle(labels: np.ndarray, n_iter: int = 96) -> np.ndarray:
    """Unit flow field by heat diffusion from each object's median-center
    pixel (the published cellpose training-target definition: per
    iteration the center gains +1, every object pixel becomes the mean of
    its 3x3 neighborhood with absorbing zero boundaries outside the
    object; flows are the unit-normalized gradient of log1p(heat)).
    NumPy-only so flow_error_qc shares no code with the production path."""
    H, W = labels.shape
    labels = labels.astype(np.int64)
    fg = labels > 0
    # center = object pixel closest to the coordinate median, first in
    # raster order on ties (cellpose's np.argmin over the pixel list)
    source = np.zeros((H, W), bool)
    for i in np.unique(labels[fg]):
        ys, xs = np.nonzero(labels == i)
        ymed, xmed = np.median(ys), np.median(xs)
        k = int(np.argmin((ys - ymed) ** 2 + (xs - xmed) ** 2))
        source[ys[k], xs[k]] = True

    T = np.zeros((H, W))
    src = source.astype(np.float64)
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)]
    for _ in range(n_iter):
        T = T + src
        acc = T.copy()
        for dy, dx in offs:
            nb = _same_label_shift_np(T, labels, dy, dx)
            acc += np.where(np.isnan(nb), 0.0, nb)
        T = np.where(fg, acc / 9.0, 0.0)
    logT = np.log1p(T)

    def grad_axis(dy, dx):
        plus = _same_label_shift_np(logT, labels, dy, dx)
        minus = _same_label_shift_np(logT, labels, -dy, -dx)
        plus = np.where(np.isnan(plus), 0.0, plus)
        minus = np.where(np.isnan(minus), 0.0, minus)
        return (plus - minus) / 2.0

    gy, gx = grad_axis(1, 0), grad_axis(0, 1)
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
