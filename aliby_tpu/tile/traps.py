"""Yeast-trap (ALCATRAS) detection — the skimage pipeline re-expressed in JAX.

Behavioral model (``tile/process_traps.py:24-218``): entropy-texture
segmentation finds candidate traps, their mean crop becomes a matched
template, and normalized cross-correlation (4 rotations x 10 scales) +
minimum-distance peak picking yields the final trap grid. A <30-trap result
triggers a full-resolution retry, keeping whichever run found more traps.

Compute path: entropy/otsu/closing/CC/NCC all come from
``aliby_tpu.ops`` (FFT correlation on the MXU-friendly rfft, scatter
histograms, pointer-doubling CC). Only the candidate bookkeeping is host
Python — it runs once per position.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aliby_tpu.extract.reductions import LabelStats, ellipse_params
from aliby_tpu.ops import imageops as I
from aliby_tpu.ops.labels import connected_components, relabel_sequential


def _candidate_centres(image: np.ndarray, tile_size: int, downscale: float):
    """Entropy -> otsu -> closing -> clear_border -> CC -> shape filter."""
    H, W = image.shape
    img = jnp.asarray(image, jnp.float32)
    if downscale != 1.0:
        small = I.resize_bilinear(img, (int(H * downscale), int(W * downscale)))
    else:
        small = img
    radius = max(2, int(round(tile_size * downscale / 10)))
    ent = I.entropy_filter(small, radius=radius)
    ent_full = I.resize_bilinear(ent, (H, W))
    thr = I.otsu_threshold(ent_full)
    binary = I.binary_closing(ent_full > thr, 2)
    labels = connected_components(binary, connectivity=2)
    labels = I.clear_border(labels)
    max_labels = 256
    labels, _ = relabel_sequential(labels, max_labels)
    st = LabelStats(labels, max_labels)
    mu20, mu02, mu11 = st.central_moments()
    major, _minor, _e, _o = ellipse_params(mu20, mu02, mu11, st.area)
    area = np.asarray(st.area)
    major = np.asarray(major)
    cy = np.asarray(st.cy)
    cx = np.asarray(st.cx)
    half = tile_size // 2
    keep = (
        (area > 0)
        & (major > 0.3 * tile_size)
        & (major < tile_size)
        & (cy > half)
        & (cy < H - half)
        & (cx > half)
        & (cx < W - half)
    )
    return np.stack([cy[keep], cx[keep]], axis=1)


def _mean_template(image: np.ndarray, centres: np.ndarray, size: int) -> np.ndarray:
    half = size // 2
    crops = []
    for cy, cx in centres:
        y0, x0 = int(round(cy)) - half, int(round(cx)) - half
        crop = image[y0 : y0 + size, x0 : x0 + size]
        if crop.shape == (size, size):
            crops.append(crop)
    if not crops:
        raise RuntimeError("No valid template crops")
    return np.mean(crops, axis=0).astype(np.float32)


def identify_trap_locations(
    image: np.ndarray,
    template: np.ndarray,
    trap_size: int,
    min_score: float = 0.3,
    max_peaks: int = 512,
) -> np.ndarray:
    """Template matching over 4 rotations x 10 scales -> trap centres (N, 2)."""
    img = jnp.asarray(image, jnp.float32)
    # Best rotation by the 99.9th-percentile NCC score.
    best_rot, best_q = None, -np.inf
    for k in range(4):
        tpl = np.rot90(template, k)
        ncc = np.asarray(I.match_template(img, jnp.asarray(tpl)))
        q = float(np.quantile(ncc, 0.999))
        if q > best_q:
            best_q, best_rot = q, tpl
    # Scale sweep.
    best = None
    for scale in np.linspace(0.5, 2.0, 10):
        size = max(8, int(round(best_rot.shape[0] * scale)))
        tpl = np.asarray(
            I.resize_bilinear(jnp.asarray(best_rot), (size, size))
        )
        ncc = I.match_template(img, jnp.asarray(tpl))
        coords, valid = I.peak_local_max(
            ncc,
            min_distance=max(1, int(0.7 * trap_size)),
            threshold=min_score,
            max_peaks=max_peaks,
        )
        coords = np.asarray(coords)[np.asarray(valid)]
        scores = np.asarray(ncc)[tuple(coords.T)] if len(coords) else np.zeros(0)
        quality = scores.mean() * np.sqrt(len(coords)) if len(coords) else -np.inf
        if best is None or quality > best[0]:
            best = (quality, coords)
    return best[1]


def segment_traps(
    image: np.ndarray, tile_size: int, downscale: float = 0.4, min_traps: int = 30
) -> np.ndarray:
    """Full trap detection with the reference's retry-at-full-res policy."""
    image = np.asarray(image, np.float32)

    def run(ds: float) -> np.ndarray:
        centres = _candidate_centres(image, tile_size, ds)
        if len(centres) == 0:
            raise RuntimeError("no candidate traps")
        template = _mean_template(image, centres, tile_size // 2)
        return identify_trap_locations(image, template, tile_size)

    try:
        traps = run(downscale)
    except RuntimeError:
        traps = np.zeros((0, 2))
    if len(traps) < min_traps and downscale != 1.0:
        try:
            retry = run(1.0)
            if len(retry) > len(traps):
                traps = retry
        except RuntimeError:
            pass
    if len(traps) == 0:
        raise RuntimeError("no traps found")  # tiler falls back to monotile
    return traps
