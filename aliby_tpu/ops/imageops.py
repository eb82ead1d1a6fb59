"""Statically-shaped JAX image primitives.

Replaces the reference's scipy/scikit-image calls (Otsu, entropy filter,
template matching, phase correlation, morphology — ``tile/process_traps.py``,
``tile/tiler.py:297``) with XLA-friendly equivalents: histograms are
scatter-adds, neighborhood ops are ``reduce_window``, and correlations ride
the FFT so they batch onto the MXU/VPU without data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Histograms / thresholds
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram(img: jnp.ndarray, bins: int = 256, vmin=None, vmax=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    vmin = img.min() if vmin is None else vmin
    vmax = img.max() if vmax is None else vmax
    span = jnp.maximum(vmax - vmin, 1e-12)
    idx = jnp.clip(((img - vmin) / span * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros(bins, jnp.int32).at[idx.reshape(-1)].add(1)
    edges = vmin + jnp.arange(bins + 1) * span / bins
    return counts, edges


@functools.partial(jax.jit, static_argnames=("bins",))
def otsu_threshold(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Between-class-variance-maximizing threshold (skimage-compatible)."""
    counts, edges = histogram(img, bins)
    centers = (edges[:-1] + edges[1:]) / 2
    w = counts.astype(jnp.float32)
    p = w / jnp.maximum(w.sum(), 1)
    omega0 = jnp.cumsum(p)
    mu_part = jnp.cumsum(p * centers)
    mu_total = mu_part[-1]
    omega1 = 1.0 - omega0
    mu0 = mu_part / jnp.maximum(omega0, 1e-12)
    mu1 = (mu_total - mu_part) / jnp.maximum(omega1, 1e-12)
    sigma_b = omega0 * omega1 * (mu0 - mu1) ** 2
    # exclude degenerate tails
    sigma_b = jnp.where((omega0 > 0) & (omega1 > 0), sigma_b, -1.0)
    return centers[jnp.argmax(sigma_b)]


# ---------------------------------------------------------------------------
# Separable / neighborhood filters
# ---------------------------------------------------------------------------


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    radius = max(int(truncate * sigma + 0.5), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian on a 2-D image (reflect padding, scipy-like)."""
    k = gaussian_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    # scipy's default "reflect" is half-sample symmetric == jnp "symmetric"
    x = jnp.pad(img.astype(jnp.float32), ((r, r), (0, 0)), mode="symmetric")
    x = jax.vmap(lambda col: jnp.correlate(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (r, r)), mode="symmetric")
    x = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(x)
    return x


def _window_reduce(img: jnp.ndarray, size: int, op, init) -> jnp.ndarray:
    return jax.lax.reduce_window(
        img, init, op,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding="SAME",
    )


@functools.partial(jax.jit, static_argnames=("size",))
def max_filter(img: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _window_reduce(img, size, jax.lax.max, -jnp.inf if img.dtype.kind == "f" else jnp.iinfo(img.dtype).min)


@functools.partial(jax.jit, static_argnames=("n_iter", "connectivity"))
def binary_dilation(mask: jnp.ndarray, n_iter: int = 1, connectivity: int = 1) -> jnp.ndarray:
    def step(_, m):
        f = m.astype(jnp.float32)
        if connectivity == 2:
            grown = _window_reduce(f, 3, jax.lax.max, 0.0)
        else:
            up = jnp.pad(f, ((1, 0), (0, 0)))[:-1]
            down = jnp.pad(f, ((0, 1), (0, 0)))[1:]
            left = jnp.pad(f, ((0, 0), (1, 0)))[:, :-1]
            right = jnp.pad(f, ((0, 0), (0, 1)))[:, 1:]
            grown = jnp.maximum(f, jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right)))
        return grown > 0
    return jax.lax.fori_loop(0, n_iter, step, mask)


@functools.partial(jax.jit, static_argnames=("n_iter", "connectivity"))
def binary_erosion(mask: jnp.ndarray, n_iter: int = 1, connectivity: int = 1) -> jnp.ndarray:
    return ~binary_dilation(~mask, n_iter=n_iter, connectivity=connectivity)


@functools.partial(jax.jit, static_argnames=("size",))
def binary_closing(mask: jnp.ndarray, size: int = 2) -> jnp.ndarray:
    return binary_erosion(binary_dilation(mask, size, 2), size, 2)


@jax.jit
def clear_border(labels: jnp.ndarray) -> jnp.ndarray:
    """Zero out any label touching the image border (skimage semantics).

    Label ids may be raw connected-component ids (min-pixel-index + 1,
    up to H*W) — the presence table is sized accordingly; a fixed 4096-bin
    table used to alias every id above it onto one bin, so a single
    border-touching component wiped ALL large-id labels (caught by
    tests/test_trap_hardening.py on fields with edge-straddling traps).
    """
    border = jnp.zeros_like(labels, dtype=bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border_labels = jnp.where(border, labels, 0)
    n_bins = labels.size + 1
    touched = jnp.zeros(n_bins, bool).at[
        jnp.clip(border_labels.reshape(-1), 0, n_bins - 1)
    ].set(True)
    touched = touched.at[0].set(False)
    return jnp.where(touched[jnp.clip(labels, 0, n_bins - 1)], 0, labels)


@functools.partial(jax.jit, static_argnames=("radius", "bins"))
def entropy_filter(img: jnp.ndarray, radius: int = 3, bins: int = 32) -> jnp.ndarray:
    """Local Shannon entropy over a disk footprint (skimage.filters.rank.entropy).

    Per-bin indicator maps are box-correlated with the disk via a depthwise
    conv — ``bins`` channels in one XLA conv, no Python loops.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape
    vmin, vmax = img.min(), img.max()
    q = jnp.clip(((img - vmin) / jnp.maximum(vmax - vmin, 1e-12) * bins).astype(jnp.int32), 0, bins - 1)
    onehot = (q[None] == jnp.arange(bins)[:, None, None]).astype(jnp.float32)
    # Disk correlation as static shift-and-accumulate: ~pi*r^2 elementwise
    # adds that XLA fuses trivially. (A grouped depthwise conv miscompiled
    # to zeros under jit on the axon TPU backend; shifts are robust, and
    # this op runs once per position at tile init, so FLOPs don't matter.)
    padded = jnp.pad(onehot, ((0, 0), (radius, radius), (radius, radius)))
    counts = jnp.zeros_like(onehot)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius:
                counts = counts + jax.lax.dynamic_slice(
                    padded, (0, radius + dy, radius + dx), (bins, H, W)
                )
    total = counts.sum(0, keepdims=True)
    p = counts / jnp.maximum(total, 1.0)
    # p*log2(max(p, eps)) is exactly 0 at p == 0 and safe against
    # inf-propagating fusions.
    ent = -jnp.sum(p * jnp.log2(jnp.maximum(p, 1e-12)), axis=0)
    return ent


# ---------------------------------------------------------------------------
# FFT correlation family
# ---------------------------------------------------------------------------


@jax.jit
def fft_correlate_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """'same'-mode cross-correlation via rFFT (float32)."""
    H, W = img.shape
    h, w = kernel.shape
    fh, fw = H + h - 1, W + w - 1
    F = jnp.fft.rfft2(img.astype(jnp.float32), (fh, fw))
    K = jnp.fft.rfft2(kernel.astype(jnp.float32)[::-1, ::-1], (fh, fw))
    full = jnp.fft.irfft2(F * K, (fh, fw))
    y0, x0 = (h - 1) // 2, (w - 1) // 2
    return jax.lax.dynamic_slice(full, (y0, x0), (H, W))


@jax.jit
def match_template(img: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Normalized cross-correlation, 'same' output (skimage pad_input=True).

    Local image sums come from a ones-kernel FFT correlation; the result is
    the Pearson correlation of the template against each window, in [-1, 1].
    """
    img = img.astype(jnp.float32)
    t = template.astype(jnp.float32)
    n = t.size
    t0 = t - t.mean()
    t_ss = jnp.maximum((t0**2).sum(), 1e-12)
    ones = jnp.ones_like(t)
    num = fft_correlate_same(img, t0)
    s1 = fft_correlate_same(img, ones)
    s2 = fft_correlate_same(img**2, ones)
    win_var = jnp.maximum(s2 - s1**2 / n, 0.0)
    denom = jnp.sqrt(win_var * t_ss)
    # divide by a clamped denominator, then mask — no inf enters the graph
    return (num / jnp.maximum(denom, 1e-8)) * (denom > 1e-8)


def phase_cross_correlation_host(
    reference: np.ndarray, moving: np.ndarray
) -> np.ndarray:
    """Host (numpy) pixel-precision phase correlation, same semantics as
    :func:`phase_cross_correlation` at ``upsample_factor=1``.

    The drift tracker calls this once per (position, timepoint) on a single
    frame pair — a few-ms FFT the host does for free, whereas a device
    dispatch pays the tunnel's per-call latency AND queues behind any
    in-flight fused chunk program (measured ~0.7 s blocked per call while
    the mesh runner saturates the chip)."""
    A = np.fft.rfft2(np.asarray(reference, np.float32))
    B = np.fft.rfft2(np.asarray(moving, np.float32))
    corr = np.fft.irfft2(A * np.conj(B), s=reference.shape)
    idx = int(np.argmax(np.abs(corr)))
    H, W = reference.shape
    dy, dx = idx // W, idx % W
    if dy > H // 2:
        dy -= H
    if dx > W // 2:
        dx -= W
    return np.array([dy, dx], np.float32)


@functools.partial(jax.jit, static_argnames=("upsample_factor",))
def phase_cross_correlation(reference: jnp.ndarray, moving: jnp.ndarray, upsample_factor: int = 1) -> jnp.ndarray:
    """Shift (dy, dx) registering ``moving`` to ``reference``.

    skimage.registration.phase_cross_correlation semantics at pixel
    precision (the reference drift path uses the default factor,
    ``tile/tiler.py:282-305``): argmax of the inverse-FFT'd normalized
    cross-power spectrum, wrapped to signed shifts.
    """
    A = jnp.fft.fft2(reference.astype(jnp.float32))
    B = jnp.fft.fft2(moving.astype(jnp.float32))
    R = A * jnp.conj(B)
    corr = jnp.fft.ifft2(R)
    mag = jnp.abs(corr)
    idx = jnp.argmax(mag)
    H, W = reference.shape
    dy, dx = idx // W, idx % W
    dy = jnp.where(dy > H // 2, dy - H, dy)
    dx = jnp.where(dx > W // 2, dx - W, dx)
    shift = jnp.array([dy, dx], jnp.float32)
    if upsample_factor > 1:
        # Parabolic sub-pixel refinement around the integer peak.
        def axis_refine(d, axis_len, plus, minus, center):
            denom = plus - 2 * center + minus
            frac = jnp.where(jnp.abs(denom) > 1e-9, (minus - plus) / (2 * denom), 0.0)
            return d + jnp.clip(frac, -1, 1)
        c = mag[dy % H, dx % W]
        up = mag[(dy + 1) % H, dx % W]
        down = mag[(dy - 1) % H, dx % W]
        right = mag[dy % H, (dx + 1) % W]
        left = mag[dy % H, (dx - 1) % W]
        shift = jnp.array(
            [
                axis_refine(shift[0], H, up, down, c),
                axis_refine(shift[1], W, right, left, c),
            ],
            jnp.float32,
        )
    return shift


@functools.partial(jax.jit, static_argnames=("min_distance", "max_peaks"))
def peak_local_max(
    img: jnp.ndarray,
    min_distance: int,
    threshold: jnp.ndarray | float,
    max_peaks: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local maxima at least ``min_distance`` apart and above ``threshold``.

    Returns ``(coords (max_peaks, 2) int32, valid (max_peaks,) bool)`` padded
    statically — peaks ranked by intensity (skimage.feature.peak_local_max).
    """
    size = 2 * min_distance + 1
    local_max = (img >= _window_reduce(img, size, jax.lax.max, -jnp.inf)) & (img > threshold)
    score = jnp.where(local_max, img, -jnp.inf).reshape(-1)
    top_vals, top_idx = jax.lax.top_k(score, max_peaks)
    W = img.shape[1]
    coords = jnp.stack([top_idx // W, top_idx % W], axis=-1).astype(jnp.int32)
    return coords, top_vals > -jnp.inf


@functools.partial(jax.jit, static_argnames=("factor",))
def downscale_mean(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Antialiased integer-factor downscale (mean pooling)."""
    H, W = img.shape
    Hc, Wc = (H // factor) * factor, (W // factor) * factor
    x = img[:Hc, :Wc].astype(jnp.float32)
    return x.reshape(Hc // factor, factor, Wc // factor, factor).mean((1, 3))


@functools.partial(jax.jit, static_argnames=("out_shape",))
def resize_bilinear(img: jnp.ndarray, out_shape: tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img.astype(jnp.float32), out_shape, method="bilinear")


# ---------------------------------------------------------------------------
# Sort-free exact order statistics (selection)
# ---------------------------------------------------------------------------


def _monotone_key_u32(x: jnp.ndarray) -> jnp.ndarray:
    """float32 -> uint32 key with the same total order lax.sort uses on
    NaN-free data (IEEE-754 sign-magnitude flip; -0.0 keys below +0.0 —
    numerically equal, so selected VALUES are unaffected)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(u >> 31 == 1, ~u, u | jnp.uint32(0x80000000))


def _key_to_f32(k: jnp.ndarray) -> jnp.ndarray:
    u = jnp.where(
        k >= jnp.uint32(0x80000000), k ^ jnp.uint32(0x80000000), ~k
    )
    return jax.lax.bitcast_convert_type(u, jnp.float32)


@functools.partial(jax.jit, static_argnames=("ranks",))
def order_statistics(x: jnp.ndarray, ranks: tuple[int, ...]) -> jnp.ndarray:
    """Exact 0-indexed order statistics of a float32 array WITHOUT a sort.

    ``lax.sort`` costs ~15 ms per 1M elements on v5e and the percentile
    normalization in front of every segmentation forward paid it per
    (image, channel) — 32 ms per fused 16-image batch, competing with the
    convs for the vector unit. Selection instead bisects the monotone
    uint32 encoding of IEEE-754 floats: 32 rounds, each ONE fused
    compare+count pass over the data for all requested ranks at once
    (the smallest key whose rank-(r+1) count is reached is itself an
    element, so the result is an exact array element, bit-identical to
    ``sorted(x)[r]`` for NaN-free input). ~1 ms for 32x65k on v5e.
    """
    keys = _monotone_key_u32(x.reshape(-1))
    r1 = jnp.asarray(ranks, jnp.uint32) + 1  # count threshold per rank
    lo = jnp.zeros((len(ranks),), jnp.uint32)
    hi = jnp.full((len(ranks),), 0xFFFFFFFF, jnp.uint32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        # one full-lane-width reduction per rank (static unroll) — a
        # broadcast (N, R) compare would put R=4 on the 128-lane axis and
        # run ~30x under-utilized
        cnt = jnp.stack(
            [
                (keys <= mid[j]).sum(dtype=jnp.uint32)
                for j in range(len(ranks))
            ]
        )
        take = cnt >= r1
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return _key_to_f32(lo)


def percentile_pair(img: jnp.ndarray, q_lo: float, q_hi: float):
    """(lo, hi) linear-interpolated percentiles of ``img``, sort-free.

    Order statistics are bit-exact vs a sort (:func:`order_statistics`);
    the interpolation follows NUMPY's convention — float64 index
    arithmetic ``q/100*(n-1)`` (upstream cellpose normalizes with
    ``np.percentile``), lerp ``a + (b-a)*t`` in f32. ``jnp.percentile``
    is NOT the spec on purpose: XLA's f32 divide is not correctly
    rounded, so its q=0.99 differs from numpy's per backend (~1e-7
    relative — irrelevant downstream, but not reproducible). NaN inputs
    select as if NaN were +huge (numpy would propagate NaN) — callers
    feed images, which are NaN-free."""
    n = int(np.prod(img.shape))
    idx = [float(q) / 100.0 * (n - 1) for q in (q_lo, q_hi)]
    lo_r = [int(np.floor(i)) for i in idx]
    hi_r = [int(np.ceil(i)) for i in idx]
    t = [np.float32(i - np.floor(i)) for i in idx]
    vals = order_statistics(
        img.reshape(-1), (lo_r[0], hi_r[0], lo_r[1], hi_r[1])
    )
    out_lo = vals[0] + (vals[1] - vals[0]) * t[0]
    out_hi = vals[2] + (vals[3] - vals[2]) * t[1]
    return out_lo, out_hi
