"""Measure a single-CPU-node reference-workalike baseline IN KIND.

The true reference stack (cellpose + cp_measure) cannot be installed here
(zero egress; BASELINE.md). This measures the same work with the repo's two
independently-authored reference-style implementations, on this machine's
CPU — replacing the documented 0.4 FOV/s *estimate* with a measurement:

- segmentation: the torch CPnet (``tests/test_cpnet_port.py`` — the
  published Cellpose architecture, written in torch from the paper) forward
  pass on (2, 256, 256) input, torch CPU with default threading. Flow
  dynamics + mask reconstruction are EXCLUDED (cellpose spends additional
  CPU time there), so the denominator is conservative (too fast).
- features: the scipy per-object oracle (``tests/oracle_features.py`` —
  the same per-object masked-crop formulation cp_measure/CellProfiler use,
  looped object by object exactly like the reference executor,
  ``extraction/extract.py:345-374``).

Both the LIGHT set (sizeshape + intensity x2 channels + coloc — round-1's
anchor) and the FULL builder bank (+ texture, granularity, zernike,
radial_* per channel) are timed on the same rendered 24-object fields the
TPU bench uses. Prints one JSON line with per-stage seconds and FOV/s.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(n_fovs: int = 2):
    import oracle_features as O

    from aliby_tpu.test_data import render_cells

    rng = np.random.default_rng(7)
    fields = []
    for _ in range(n_fovs):
        cells, nuclei, _ = render_cells(256, 24, rng)
        noise = lambda: rng.normal(0.02, 0.01, (256, 256)).astype(np.float32)
        ch0 = nuclei + noise()
        ch3 = cells + noise()
        from scipy import ndimage

        # TWO object sets, matching the TPU bench's two segmented objects
        # (nuclei + cell) — each gets the full per-object feature pass.
        labels_nuc, _ = ndimage.label(nuclei > 0.3)
        labels_cell, _ = ndimage.label(cells > 0.3)
        fields.append((ch0, ch3, (labels_nuc, labels_cell)))

    # ---- torch CPnet forward (reference segmentation's compute core) ----
    t_fwd = None
    try:
        import torch

        import test_cpnet_port as TP

        net = TP._CPnetTorch()
        net.eval()
        x = torch.from_numpy(
            np.stack([fields[0][0], fields[0][1]])[None].astype(np.float32)
        )
        with torch.no_grad():
            net(x)  # warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                net(x)
                best = min(best, time.perf_counter() - t0)
        t_fwd = best
        print(f"# torch CPnet fwd (1 FOV, CPU): {t_fwd:.3f}s", file=sys.stderr)
    except Exception as e:  # torch missing in some environments
        print(f"# torch fwd unavailable: {e}", file=sys.stderr)

    # ---- per-object scipy feature pass (reference executor style) ----
    def run_features(full: bool):
        t0 = time.perf_counter()
        for ch0, ch3, labelings in fields:
            for labels in labelings:  # both objects, as in bench.py
                for lab in range(1, labels.max() + 1):
                    mask = labels == lab
                    O.o_sizeshape(mask)
                    for img in (ch0, ch3):
                        O.o_intensity(mask, img, edge_measurements=False)
                    O.o_pearson(mask, ch0, ch3)
                    O.o_manders_fold(mask, ch0, ch3)
                    O.o_rwc(mask, ch0, ch3)
                    if full:
                        for img in (ch0, ch3):
                            O.o_texture(mask, img)
                            O.o_granularity(mask, img)
                            O.o_zernike(mask, img)
                            O.o_radial_distribution(mask, img)
        return (time.perf_counter() - t0) / len(fields)

    t_light = run_features(full=False)
    print(f"# light features/FOV: {t_light:.2f}s", file=sys.stderr)
    t_full = run_features(full=True)
    print(f"# full features/FOV: {t_full:.2f}s", file=sys.stderr)

    seg = 2 * (t_fwd or 0.0)  # two segmented objects, as in bench.py
    out = {
        "torch_fwd_s": t_fwd,
        "light_features_s_per_fov": round(t_light, 3),
        "full_features_s_per_fov": round(t_full, 3),
        "light_fov_per_s": round(1.0 / (seg + t_light), 4) if t_fwd else None,
        "full_fov_per_s": round(1.0 / (seg + t_full), 4) if t_fwd else None,
        "note": "flow dynamics/mask reconstruction excluded -> conservative",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
