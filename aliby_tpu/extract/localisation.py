"""Nuclear-localisation estimates (MATLAB-lineage features).

Reference (``extraction/core/functions/custom/localisation.py:16-140``):
``nuc_est_conv`` convolves each cell's median-subtracted, mask-zeroed image
with a Gaussian whose sigma derives from the cell's area (approximate
nuclear radius / sqrt(chi2inv(0.95, df=2))) and reports the normalized
convolution maximum; ``small_peaks_conv`` does the same with a disk kernel
sized to the expected nucleus.

Per-cell kernel sizes are data-dependent — anathema to jit — so sigmas are
quantized onto a static geometric bucket grid: one convolution per bucket
over the image restricted to that bucket's cells, per-label maxima gathered
from the matching bucket. Exact when cells are farther apart than the
kernel support (the overwhelming case); documented approximation otherwise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from aliby_tpu.extract.reductions import (
    counts,
    quantile_from_sorted,
    seg_max,
    sorted_by_label,
)
from aliby_tpu.ops.imageops import fft_correlate_same

CHI2INV_95_DF2 = 5.991464547107979  # scipy.stats.chi2.ppf(0.95, 2)
_SIGMA_BUCKETS = tuple(float(s) for s in (0.75, 1.2, 1.9, 3.0, 4.8, 7.6, 12.0))


def _gauss2d(size: int, sigma: float) -> jnp.ndarray:
    """MATLAB fspecial('gaussian')-style normalized kernel."""
    m = (size - 1) / 2.0
    y = jnp.arange(size) - m
    h = jnp.exp(-(y[:, None] ** 2 + y[None, :] ** 2) / (2.0 * sigma**2))
    h = jnp.where(h < jnp.finfo(jnp.float32).eps * h.max(), 0.0, h)
    return h / jnp.maximum(h.sum(), 1e-12)


def _disk(radius: float, size: int) -> jnp.ndarray:
    m = (size - 1) / 2.0
    y = jnp.arange(size) - m
    return ((y[:, None] ** 2 + y[None, :] ** 2) <= radius**2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_labels", "alpha", "object_radius_estimation"))
def nuc_est_conv(
    labels: jnp.ndarray,
    img: jnp.ndarray,
    max_labels: int,
    alpha: float = 0.95,
    object_radius_estimation: float = 0.085,
) -> jnp.ndarray:
    img = img.astype(jnp.float32)
    fg = labels > 0
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    # per-label median of fluorescence, counts of nonzero fluo pixels
    sv, starts, cnt = sorted_by_label(jnp.where(fg, img, 0.0), labels, max_labels)
    median = jnp.nan_to_num(quantile_from_sorted(sv, starts, cnt, 0.5))
    nonzero = counts(jnp.where(fg & (img != 0), labels, 0), max_labels)
    r = jnp.sqrt(object_radius_estimation * nonzero / jnp.pi)
    sigma = r / jnp.sqrt(CHI2INV_95_DF2)
    cell_image = jnp.where(fg, img - median[l_idx], 0.0)

    buckets = jnp.asarray(_SIGMA_BUCKETS)
    bucket_of = jnp.argmin(
        jnp.abs(jnp.log(jnp.maximum(sigma, 1e-3))[:, None] - jnp.log(buckets)[None, :]),
        axis=1,
    )  # (L,)
    out = jnp.full(max_labels, jnp.nan)
    for b, sig in enumerate(_SIGMA_BUCKETS):
        r_b = sig * math.sqrt(CHI2INV_95_DF2)
        size = 2 * int(math.ceil(2 * r_b)) + 1
        kernel = _gauss2d(size, sig)
        in_bucket = bucket_of[l_idx] == b
        masked = jnp.where(fg & in_bucket, cell_image, 0.0)
        conv = fft_correlate_same(masked, kernel)
        per_label_max = seg_max(
            jnp.where(fg & in_bucket, conv, -jnp.inf), labels, max_labels
        )
        norm = jnp.sum(kernel**2) * alpha * jnp.pi * CHI2INV_95_DF2 * sig**2
        val = per_label_max / jnp.maximum(norm, 1e-12)
        out = jnp.where((bucket_of == b) & (cnt > 0), val, out)
    return out


@functools.partial(jax.jit, static_argnames=("max_labels",))
def small_peaks_conv(labels: jnp.ndarray, img: jnp.ndarray, max_labels: int) -> jnp.ndarray:
    """Max of a disk-kernel convolution within each cell; disk radius
    3 * (0.025 * n_pixels) / 5 per the reference."""
    img = img.astype(jnp.float32)
    fg = labels > 0
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    area = counts(labels, max_labels)
    radius = 3.0 * (area * 0.025) / 5.0
    buckets = jnp.asarray(_SIGMA_BUCKETS)
    bucket_of = jnp.argmin(
        jnp.abs(jnp.log(jnp.maximum(radius, 1e-3))[:, None] - jnp.log(buckets)[None, :]),
        axis=1,
    )
    out = jnp.full(max_labels, jnp.nan)
    for b, r_b in enumerate(_SIGMA_BUCKETS):
        size = 2 * int(math.ceil(r_b)) + 1
        kernel = _disk(r_b, size)
        conv = fft_correlate_same(img, kernel)
        in_bucket = bucket_of[l_idx] == b
        per_label_max = seg_max(
            jnp.where(fg & in_bucket, conv, -jnp.inf), labels, max_labels
        )
        out = jnp.where((bucket_of == b) & (area > 0), per_label_max, out)
    return out


LOCALISATION_METRICS = ("nuc_est_conv", "small_peaks_conv")


def compute(metric: str, labels, img, max_labels: int):
    if img.ndim == 3:  # un-reduced z stack: max-project (squeeze when Z=1)
        img = img.max(axis=0)
    if metric == "nuc_est_conv":
        return nuc_est_conv(labels, img, max_labels)
    if metric == "small_peaks_conv":
        return small_peaks_conv(labels, img, max_labels)
    raise KeyError(metric)
