"""Generate PARITY.md — the measured golden-parity ledger.

Compares every feature of the vectorized JAX bank against the independent
per-object numpy/scipy oracle (``tests/oracle_features.py``) over synthetic
fields and records max abs/rel error per feature, plus the waiver table
(features where float32 or discretization bounds the achievable parity).

    python scripts/gen_parity_ledger.py [PARITY.md]

The complementary upstream harness (``scripts/golden_parity.py``) fills the
cp_measure/cellpose sections wherever those packages are installable.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from parity_common import compute_pairs, max_errors
    from test_golden_parity import DEFAULT_REL, WAIVERS, _bound_for

    pairs = compute_pairs()
    errs = max_errors(pairs)

    lines = [
        "# PARITY — measured golden-parity ledger",
        "",
        "JAX feature bank (`aliby_tpu/extract`) vs the independent scipy",
        "per-object oracle (`tests/oracle_features.py`), max error over",
        "synthetic non-touching fields (3 fields x 7 objects). Gate enforced",
        "by `tests/test_golden_parity.py`: rel <= 1e-3 unless waived below.",
        "cp_measure/cellpose themselves are not installable here (zero",
        "egress); `scripts/golden_parity.py` re-runs the same comparison",
        "against the real packages wherever they exist, and",
        "`tests/test_cpnet_port.py` pins torch-forward parity (2e-4) for",
        "ported Cellpose checkpoints.",
        "",
        "## Documented conventions (vs upstream cp_measure/CellProfiler)",
        "",
        "- Perimeter: skimage weighted-border algorithm (4-conn border erosion).",
        "- Edge intensity: 4-connected outline (centrosome convention).",
        "- ConvexArea: pixel-count of the convex image; hull rasterized from",
        "  180 support slabs (exact for cell-scale objects).",
        "- Feret: calipers over 360 directions (error O(1/K^2)).",
        "- Orientation: regionprops convention, degrees.",
        "- Zernike (binary + intensity-weighted): the upstream centrosome",
        "  disk — each object's exact MINIMUM ENCLOSING CIRCLE (oracle:",
        "  exhaustive circumcircle enumeration; production: Badoiu-Clarkson",
        "  + exact refinement, enclosure guaranteed); magnitudes carry the",
        "  (n+1)/(pi r^2) disk-measure normalization, RadialZernike weights",
        "  normalized by per-object total intensity.",
        "- RadialDistribution: CellProfiler's EDT-normalized binning —",
        "  center = most-interior pixel (EDT argmax, raster-first ties),",
        "  normalized distance = d_center/(d_center + d_edge + .001);",
        "  RadialCV over 8 angular wedge intensity sums about that center.",
        "- Texture: GLCM per object at 256 gray levels (per-object min-max,",
        "  floor-quantized), 4 angles, scale 3 — the `_256` suffix is now",
        "  the actual level count.",
        "- Costes: CellProfiler linear_costes — Deming regression (ddof=1)",
        "  over (im1>0)|(im2>0) pixels, descending 255-step threshold scan",
        "  stopping at the first non-positive below-threshold correlation,",
        "  evaluated exactly on the candidate grid (oracle: literal",
        "  per-pixel scan, `o_costes`).",
        "",
        "## Measured errors (worst first)",
        "",
        "| feature | n | max rel err | max abs err | oracle scale | gate |",
        "|---|---|---|---|---|---|",
    ]
    n_pass = 0
    for name, e in sorted(errs.items(), key=lambda kv: -kv[1]["rel"]):
        kind, bound, why = _bound_for(name)
        val = e["abs"] if kind == "abs" else e["rel"]
        ok = e["n"] > 0 and val <= bound
        n_pass += ok
        gate = f"{kind}<={bound:.0e}" + (f" ({why})" if why else "")
        status = "pass" if ok else "**FAIL**"
        lines.append(
            f"| `{name}` | {e['n']} | {e['rel']:.2e} | {e['abs']:.2e} "
            f"| {e['scale']:.2e} | {gate} {status} |"
        )
    lines += [
        "",
        f"**{n_pass}/{len(errs)} features pass** "
        f"({sum(1 for n in errs if _bound_for(n)[2])} carry waivers; "
        f"default gate rel<={DEFAULT_REL:.0e}).",
        "",
        "## Waiver table",
        "",
        "| pattern | gate | reason |",
        "|---|---|---|",
    ]
    for pat, (kind, bound, why) in WAIVERS.items():
        lines.append(f"| `{pat}` | {kind} <= {bound:.0e} | {why} |")

    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("PARITY.md")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}: {n_pass}/{len(errs)} features pass")


if __name__ == "__main__":
    main()
