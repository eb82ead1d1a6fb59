"""Golden-parity harness: compare the feature bank and segmenter against
the upstream stacks (cp_measure / cellpose) when they are installed.

This environment cannot install them (BASELINE.md), so exact name/value
parity is recorded as a ledger to be (re)generated wherever the upstream
packages exist:

    python scripts/golden_parity.py [out.md]

For every cp_measure core/correlation family it reports, per feature name:
present-in-both / only-ours / only-theirs, and max relative error over a
synthetic object set; for cellpose it reports mask IoU of CellposeTPU vs
CellposeModel on the same fields. Absent packages are noted, not fatal.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _objects(seed=0, size=128, n=8):
    from aliby_tpu.test_data import render_cells

    rng = np.random.default_rng(seed)
    cells, nuclei, labels = render_cells(size, n, rng)
    img = (cells + rng.normal(0, 0.02, cells.shape)).astype(np.float32)
    img2 = (nuclei + rng.normal(0, 0.02, cells.shape)).astype(np.float32)
    return labels.astype(np.int32), img, img2


def compare_features() -> list[str]:
    lines = ["## cp_measure feature parity", ""]
    try:
        from cp_measure.bulk import (
            get_core_measurements,
            get_correlation_measurements,
        )
    except ImportError:
        lines.append(
            "cp_measure is **not installed** in this environment — run this "
            "script where it is available to fill the ledger."
        )
        return lines

    import jax.numpy as jnp

    from aliby_tpu.extract import features as F
    from aliby_tpu.extract import texture as T

    labels, img, img2 = _objects()
    L = 16
    ours_by_family = {
        "sizeshape": lambda: F.sizeshape(jnp.asarray(labels), L),
        "intensity": lambda: F.intensity(jnp.asarray(labels), jnp.asarray(img), L),
        "texture": lambda: T.texture(jnp.asarray(labels), jnp.asarray(img), L),
        "granularity": lambda: T.granularity(jnp.asarray(labels), jnp.asarray(img), L),
        "zernike": lambda: T.zernike(jnp.asarray(labels), L),
        "radial_distribution": lambda: T.radial_distribution(
            jnp.asarray(labels), jnp.asarray(img), L
        ),
        "radial_zernikes": lambda: T.radial_zernikes(
            jnp.asarray(labels), jnp.asarray(img), L
        ),
    }
    core = get_core_measurements()
    for family, theirs_fn in core.items():
        lines.append(f"### {family}")
        if family not in ours_by_family:
            lines.append("- not implemented here")
            continue
        ours = {k: np.asarray(v) for k, v in ours_by_family[family]().items()}
        theirs: dict = {}
        for lbl in range(1, labels.max() + 1):
            mask = (labels == lbl).astype(np.uint16)
            out = theirs_fn(mask, img)
            for k, v in out.items():
                theirs.setdefault(k, []).append(np.asarray(v).reshape(-1)[0])
        both = sorted(set(ours) & set(theirs))
        lines.append(
            f"- names: {len(both)} shared, {len(set(ours) - set(theirs))} "
            f"only-ours, {len(set(theirs) - set(ours))} only-theirs"
        )
        for k in both:
            a = ours[k][: labels.max()]
            b = np.asarray(theirs[k])
            rel = np.nanmax(np.abs(a - b) / np.maximum(np.abs(b), 1e-9))
            lines.append(f"  - `{k}`: max rel err {rel:.2e}")
    return lines


def compare_masks() -> list[str]:
    lines = ["## cellpose mask parity", ""]
    try:
        from cellpose.models import CellposeModel
    except ImportError:
        lines.append(
            "cellpose is **not installed** in this environment — run this "
            "script where it is available to measure mask IoU."
        )
        return lines
    from aliby_tpu.models.segment import dispatch_segmenter

    labels, img, img2 = _objects()
    theirs = CellposeModel(gpu=False).eval([np.stack([img, img2])], channels=[1, 2])[0][0]
    seg = dispatch_segmenter("cellpose", channel_to_segment=0, second_channel=1)
    ours = seg(np.stack([img, img2])[None][:, :, None])[0]
    inter = ((theirs > 0) & (ours > 0)).sum()
    union = ((theirs > 0) | (ours > 0)).sum()
    lines.append(f"- foreground IoU: {inter / max(union, 1):.3f}")
    return lines


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("PARITY.md")
    lines = ["# Golden parity ledger", ""]
    lines += compare_features()
    lines.append("")
    lines += compare_masks()
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
