"""Deterministic synthetic test-data catalogue.

The reference fetches a ~18 MB Zenodo tarball with 5 sub-datasets covering
every input modality (``aliby/test_data.py:34-160``). This environment has no
network, so the same modalities are *generated* deterministically:

- ``crop_cellpainting_256``  TIFF dir, one file per (well, field, channel)
  — 5-channel Cell Painting look-alike with elliptical nuclei + cells.
- ``cellpainting_zarr``      same content as a zarr store (CYX per position).
- ``yeast_tiff``             TIFF dir over (field, T, C, Z) — time-lapse.
- ``yeast_multitiff``        one multi-page TIFF per position (T*C*Z pages).
- ``yeast_zarr``             TCZYX zarr store, 2 positions, (4,3,3,293,293)
  uint16 matching the reference fixture shape
  (``examples/03_yeast_timelapse_baby.py:48-51``).
- ``cellpainting_zarr_jxl``  the cellpainting_zarr pixels with
  JPEG-XL-compressed chunks (first-party libjxl binding, lossless) — the
  codec the reference registers unconditionally (``pipe_core.py:19,34``).

Images contain synthetic cells (anisotropic Gaussian blobs thresholded into
ellipses) so segmentation/extraction produce non-trivial profiles.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from aliby_tpu.io import zarrlite

CP_CHANNELS = {"DNA": 0, "ER": 1, "RNA": 2, "AGP": 3, "Mito": 4}

DATASETS = {
    "crop_cellpainting_256": {
        "name": "crop_cellpainting_256",
        "regex": r".*__([A-Z][0-9]{2})__([0-9])__([A-Za-z]+)\.tif",
        "capture_order": "WFC",
        "channels": dict(CP_CHANNELS),
        "kind": "tiff_dir",
    },
    "cellpainting_zarr": {
        "name": "cellpainting_zarr",
        "capture_order": "CYX",
        "channels": dict(CP_CHANNELS),
        "kind": "zarr",
    },
    "yeast_tiff": {
        "name": "yeast_tiff",
        "regex": r".*__([0-9])__T([0-9]+)__C([0-9])__Z([0-9])\.tif",
        "capture_order": "FTCZ",
        "channels": {"Brightfield": 0, "GFP": 1, "mCherry": 2},
        "kind": "tiff_dir",
    },
    "yeast_multitiff": {
        "name": "yeast_multitiff",
        "capture_order": "TCZYX",
        "channels": {"Brightfield": 0, "GFP": 1, "mCherry": 2},
        "kind": "multitiff",
    },
    "yeast_zarr": {
        "name": "yeast_zarr",
        "capture_order": "TCZYX",
        "channels": {"Brightfield": 0, "GFP": 1, "mCherry": 2},
        "kind": "zarr",
    },
    "cellpainting_zarr_jxl": {
        # the reference's JXL-chunked plate layout (it registers the Jpegxl
        # numcodec unconditionally, pipe_core.py:19,34); chunks encoded by
        # the first-party libjxl binding (io/jxl.py), lossless
        "name": "cellpainting_zarr_jxl",
        "capture_order": "CYX",
        "channels": dict(CP_CHANNELS),
        "kind": "zarr",
    },
}


def fixtures_root() -> Path:
    root = os.environ.get("ALIBY_TPU_FIXTURES")
    if root:
        return Path(root)
    return Path.home() / ".cache" / "aliby_tpu" / "fixtures"


# ---------------------------------------------------------------------------
# Synthetic field rendering
# ---------------------------------------------------------------------------


def render_cells(
    size: int,
    n_cells: int,
    rng: np.random.Generator,
    nucleus_frac: float = 0.45,
    with_nucleus_labels: bool = False,
) -> tuple[np.ndarray, ...]:
    """Return (cell_intensity, nucleus_intensity, label_map) for one field.

    Cells are rotated ellipses placed without heavy overlap; intensities have
    a soft interior profile so per-label statistics are non-degenerate.
    With ``with_nucleus_labels`` a fourth array is appended: the per-nucleus
    label map (same ids as the cell labels) — the ground truth when the
    *nucleus* channel is the segmentation target, as in the yeast fixture's
    channel 1 (``_yeast_timelapse``).
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cells = np.zeros((size, size), np.float32)
    nuclei = np.zeros((size, size), np.float32)
    labels = np.zeros((size, size), np.int32)
    nuc_labels = np.zeros((size, size), np.int32)
    centers = []
    placed = 0
    attempts = 0
    margin = min(18, max(4, size // 4))
    while placed < n_cells and attempts < n_cells * 30:
        attempts += 1
        cy, cx = rng.uniform(margin, size - margin, 2)
        if centers and np.min(
            np.hypot(np.array(centers)[:, 0] - cy, np.array(centers)[:, 1] - cx)
        ) < 26:
            continue
        a = rng.uniform(8, 14)
        b = rng.uniform(6, 11)
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        d2 = (u / a) ** 2 + (v / b) ** 2
        inside = d2 <= 1.0
        if not inside.any():
            continue
        placed += 1
        centers.append((cy, cx))
        profile = np.clip(1.2 - d2, 0, None).astype(np.float32)
        cells = np.maximum(cells, profile * rng.uniform(0.6, 1.0))
        labels[inside & (labels == 0)] = placed
        nd2 = (u / (a * nucleus_frac)) ** 2 + (v / (b * nucleus_frac)) ** 2
        nprofile = np.clip(1.2 - nd2, 0, None).astype(np.float32)
        nuclei = np.maximum(nuclei, nprofile * rng.uniform(0.7, 1.0))
        nuc_labels[(nd2 <= 1.0) & (nuc_labels == 0)] = placed
    if with_nucleus_labels:
        return cells, nuclei, labels, nuc_labels
    return cells, nuclei, labels


def render_dense_cells(
    size: int,
    n_cells: int,
    rng: np.random.Generator,
    rmin: float = 3.0,
    rmax: float = 12.0,
) -> np.ndarray:
    """Densely packed touching ellipses -> (size, size) int32 label map.

    Unlike :func:`render_cells` this allows objects to touch (centers may be
    as close as the sum of minor radii x ~0.9), producing the dense-field
    regime the flow-dynamics parity gate exercises (touching boundaries are
    exactly where basin assignment is decided). Later objects claim only
    unlabeled pixels, so earlier objects keep their full extent.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    labels = np.zeros((size, size), np.int32)
    centers: list[tuple[float, float, float]] = []
    placed = 0
    attempts = 0
    while placed < n_cells and attempts < n_cells * 60:
        attempts += 1
        a = float(rng.uniform(rmin, rmax))
        b = float(rng.uniform(rmin, min(rmax, a)))
        m = a + 2
        if size - m <= m:
            continue
        cy, cx = rng.uniform(m, size - m, 2)
        if centers:
            cs = np.array([(y, x) for y, x, _ in centers])
            rs = np.array([r for _, _, r in centers])
            d = np.hypot(cs[:, 0] - cy, cs[:, 1] - cx)
            # touching allowed; heavy overlap (deeper than ~55% of the
            # smaller radius) rejected so every object keeps a core
            if np.any(d < 0.55 * (rs + b)):
                continue
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        inside = (u / a) ** 2 + (v / b) ** 2 <= 1.0
        fresh = inside & (labels == 0)
        if fresh.sum() < 9:
            continue
        placed += 1
        labels[fresh] = placed
        centers.append((cy, cx, b))
    return labels


def render_budding_movie(
    size: int,
    T: int,
    rng: np.random.Generator,
    n_mothers: int = 5,
    bud_max_radius: float = 6.0,
) -> tuple[np.ndarray, np.ndarray, dict[int, int]]:
    """Synthetic budding-yeast movie with ground-truth lineage.

    Mothers are fixed rotated ellipses; each sprouts ONE bud at a random
    tp >= 1 on its rim, attached at the bud neck and growing over time —
    the geometry BABY-class models are trained on (reference
    ``segment/dispatch.py:26-78``). Returns ``(frames (T, Y, X) float32,
    labels (T, Y, X) int32 persistent ground-truth ids,
    lineage {bud_label: mother_label})``.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    margin = 28
    mothers: list[dict] = []
    label = 0
    attempts = 0
    while len(mothers) < n_mothers and attempts < n_mothers * 50:
        attempts += 1
        cy, cx = rng.uniform(margin, size - margin, 2)
        if mothers and min(
            np.hypot(m["cy"] - cy, m["cx"] - cx) for m in mothers
        ) < 46:
            continue
        label += 1
        mothers.append(
            dict(
                cy=cy, cx=cx,
                a=rng.uniform(10, 14), b=rng.uniform(8, 12),
                theta=rng.uniform(0, np.pi), label=label,
            )
        )
    lineage: dict[int, int] = {}
    buds = []
    for m in mothers:
        label += 1
        buds.append(
            dict(
                mother=m,
                tp0=int(rng.integers(1, max(2, T - 1))),
                psi=rng.uniform(0, 2 * np.pi),
                label=label,
            )
        )
        lineage[label] = m["label"]

    def _paint(frame, labels_map, cy, cx, a, b, theta, lbl, overwrite=False):
        ct, st = np.cos(theta), np.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        d2 = (u / a) ** 2 + (v / b) ** 2
        inside = d2 <= 1.0
        np.maximum(frame, np.clip(1.2 - d2, 0, None), out=frame)
        if overwrite:
            labels_map[inside] = lbl
        else:
            labels_map[inside & (labels_map == 0)] = lbl

    frames = np.zeros((T, size, size), np.float32)
    labels = np.zeros((T, size, size), np.int32)
    for t in range(T):
        for m in mothers:
            _paint(frames[t], labels[t], m["cy"], m["cx"], m["a"], m["b"],
                   m["theta"], m["label"])
        for bud in buds:
            if t < bud["tp0"]:
                continue
            m = bud["mother"]
            grow = min(1.0, 0.35 + 0.35 * (t - bud["tp0"]))
            r = grow * bud_max_radius
            # rim point of the mother ellipse at parameter psi, pushed
            # outward so the bud touches at a neck
            ct, st = np.cos(m["theta"]), np.sin(m["theta"])
            px = m["a"] * np.cos(bud["psi"])
            py = m["b"] * np.sin(bud["psi"])
            bx = m["cx"] + px * ct - py * st
            by = m["cy"] + px * st + py * ct
            out_dir = np.array([by - m["cy"], bx - m["cx"]])
            out_dir = out_dir / max(np.hypot(*out_dir), 1e-6)
            bcy = by + out_dir[0] * r * 0.8
            bcx = bx + out_dir[1] * r * 0.8
            # buds overwrite the mother at the neck: they are the newer cell
            _paint(frames[t], labels[t], bcy, bcx, r, r, 0.0, bud["label"],
                   overwrite=True)
        frames[t] += rng.normal(0.0, 0.02, (size, size)).astype(np.float32)
    return frames, labels, lineage


def _to_uint16(img: np.ndarray, rng: np.random.Generator, peak: float = 12000.0) -> np.ndarray:
    noisy = img * peak + rng.normal(200.0, 30.0, img.shape)
    return np.clip(noisy, 0, 65535).astype(np.uint16)


def _channel_stack(size: int, n_cells: int, seed: int, n_channels: int = 5):
    """Stack of channels derived from one rendered field (uint16)."""
    rng = np.random.default_rng(seed)
    cells, nuclei, labels = render_cells(size, n_cells, rng)
    ring = np.clip(cells - nuclei, 0, None)
    per_channel = [nuclei, ring, 0.5 * nuclei + 0.5 * cells, cells, ring * 0.8 + 0.2 * cells]
    out = np.stack(
        [_to_uint16(per_channel[c % 5], rng) for c in range(n_channels)]
    )
    return out, labels


def _write_tiff(path: Path, arr: np.ndarray) -> None:
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    if arr.dtype == np.uint16:
        im = Image.fromarray(arr)
    else:
        im = Image.fromarray(arr)
    im.save(str(path))


def _write_multipage_tiff(path: Path, pages: list[np.ndarray]) -> None:
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    imgs = [
        Image.fromarray(p)
        for p in pages
    ]
    imgs[0].save(str(path), save_all=True, append_images=imgs[1:])


# ---------------------------------------------------------------------------
# Builders per dataset
# ---------------------------------------------------------------------------


def _build_crop_cellpainting_256(root: Path) -> None:
    wells = ["A01"]
    fields = [1]
    for wi, well in enumerate(wells):
        for field in fields:
            stack, _ = _channel_stack(256, 24, seed=100 + wi * 10 + field)
            for ch_name, ch_idx in CP_CHANNELS.items():
                _write_tiff(
                    root / f"plate1__{well}__{field}__{ch_name}.tif",
                    stack[ch_idx],
                )


def _build_cellpainting_zarr(root: Path) -> None:
    for wi, well in enumerate(["A01", "B02"]):
        stack, _ = _channel_stack(256, 24, seed=100 + wi * 10 + 1)
        zarrlite.write_array(root / f"{well}", stack, chunks=(1, 256, 256))


def _build_cellpainting_zarr_jxl(root: Path) -> None:
    # identical pixels to cellpainting_zarr — only the chunk codec differs,
    # so dataset-level tests can assert decode equality across codecs
    for wi, well in enumerate(["A01", "B02"]):
        stack, _ = _channel_stack(256, 24, seed=100 + wi * 10 + 1)
        zarrlite.write_array(
            root / f"{well}", stack, chunks=(1, 256, 256), compressor="jpegxl"
        )


def _yeast_timelapse(seed: int, T: int = 4, C: int = 3, Z: int = 3, size: int = 293):
    """A drifting yeast-like time-lapse, (T, C, Z, Y, X) uint16."""
    rng = np.random.default_rng(seed)
    cells, nuclei, _ = render_cells(size, 18, rng)
    out = np.zeros((T, C, Z, size, size), np.uint16)
    for t in range(T):
        dy, dx = int(round(1.5 * t)), int(round(-1.0 * t))
        shifted = np.roll(np.roll(cells, dy, 0), dx, 1)
        nshift = np.roll(np.roll(nuclei, dy, 0), dx, 1)
        growth = 1.0 + 0.05 * t
        for z in range(Z):
            zfac = 1.0 - 0.25 * abs(z - Z // 2)
            out[t, 0, z] = _to_uint16(shifted * zfac * growth, rng, peak=9000)
            if C > 1:
                out[t, 1, z] = _to_uint16(nshift * zfac, rng, peak=11000)
            if C > 2:
                out[t, 2, z] = _to_uint16((shifted - nshift).clip(0) * zfac, rng, peak=7000)
    return out


def _build_yeast_tiff(root: Path) -> None:
    for field in (1, 2):
        stack = _yeast_timelapse(seed=40 + field, size=160)
        T, C, Z = stack.shape[:3]
        for t in range(T):
            for c in range(C):
                for z in range(Z):
                    _write_tiff(
                        root / f"pos__{field}__T{t:02d}__C{c}__Z{z}.tif",
                        stack[t, c, z],
                    )


def _build_yeast_multitiff(root: Path) -> None:
    for field in (1, 2):
        stack = _yeast_timelapse(seed=40 + field, size=160)
        T, C, Z, Y, X = stack.shape
        pages = [stack[t, c, z] for t in range(T) for c in range(C) for z in range(Z)]
        _write_multipage_tiff(root / f"pos{field}.tif", pages)


def _build_yeast_zarr(root: Path) -> None:
    for field in (1, 2):
        stack = _yeast_timelapse(seed=40 + field, size=293)
        zarrlite.write_array(
            root / f"pos{field}", stack, chunks=(1, 1, 1, 293, 293)
        )


_BUILDERS = {
    "crop_cellpainting_256": _build_crop_cellpainting_256,
    "cellpainting_zarr": _build_cellpainting_zarr,
    "yeast_tiff": _build_yeast_tiff,
    "yeast_multitiff": _build_yeast_multitiff,
    "yeast_zarr": _build_yeast_zarr,
    "cellpainting_zarr_jxl": _build_cellpainting_zarr_jxl,
}


def get_dataset(name: str) -> dict:
    if name not in DATASETS:
        raise KeyError(f"Unknown dataset {name!r}; known: {sorted(DATASETS)}")
    return dict(DATASETS[name])


def get_dataset_path(name: str) -> Path:
    """Generate (once) and return the root path of a synthetic dataset."""
    entry = get_dataset(name)
    root = fixtures_root() / entry["name"]
    marker = root / ".complete"
    if not marker.exists():
        root.mkdir(parents=True, exist_ok=True)
        _BUILDERS[name](root)
        marker.write_text("ok")
    return root


def get_data_root() -> Path:
    """Generate all datasets and return the shared fixtures root."""
    for name in DATASETS:
        get_dataset_path(name)
    return fixtures_root()
