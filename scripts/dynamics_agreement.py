"""Measure oracle-vs-production mask agreement for the dynamics stage.

Feeds the SAME flow field (synthesized from dense GT label maps by
``masks_to_flows``) to (a) the NumPy cellpose-dynamics oracle
(tests/oracle_dynamics.py) and (b) the production
``aliby_tpu.models.flows.masks_from_flows``, then reports per-field mean
matched IoU. Run on CPU. Used to tune budgets before the CI gate
(tests/test_dynamics_parity.py) was pinned.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def matched_iou(a: np.ndarray, b: np.ndarray) -> tuple[float, int, int]:
    """Mean best-match IoU of objects in `a` against objects in `b`."""
    na, nb = int(a.max()), int(b.max())
    if na == 0 or nb == 0:
        return (1.0 if na == nb else 0.0), na, nb
    # confusion counts
    conf = np.zeros((na + 1, nb + 1), np.int64)
    np.add.at(conf, (a.ravel(), b.ravel()), 1)
    area_a = conf.sum(axis=1)
    area_b = conf.sum(axis=0)
    ious = []
    for i in range(1, na + 1):
        j = int(np.argmax(conf[i, 1:])) + 1
        inter = conf[i, j]
        union = area_a[i] + area_b[j] - inter
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious)), na, nb


def main():
    import jax
    from pathlib import Path

    cache = Path.home() / ".cache" / "aliby_tpu" / "jax_cache"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from aliby_tpu.models.flows import masks_from_flows, masks_to_flows
    from aliby_tpu.test_data import render_dense_cells
    from oracle_dynamics import compute_masks_oracle

    configs = [
        ("small-dense-256", 256, 140, 3.0, 8.0, 0),
        ("mixed-256", 256, 60, 4.0, 18.0, 1),
        ("large-256", 256, 8, 30.0, 60.0, 2),
        ("dense-512", 512, 400, 3.0, 12.0, 3),
    ]
    for name, size, n, rmin, rmax, seed in configs:
        rng = np.random.default_rng(seed)
        gt = render_dense_cells(size, n, rng, rmin, rmax)
        n_gt = int(gt.max())
        flows = np.asarray(masks_to_flows(gt))
        cellprob = np.where(gt > 0, 4.0, -4.0).astype(np.float32)
        oracle = compute_masks_oracle(flows, cellprob)
        ours = np.asarray(
            masks_from_flows(flows, cellprob, max_labels=512, flow_threshold=0.4)
        )
        iou, na, nb = matched_iou(np.asarray(oracle, np.int32), ours)
        iou_r, _, _ = matched_iou(ours, np.asarray(oracle, np.int32))
        print(
            f"{name:16s} gt={n_gt:4d} oracle={na:4d} ours={nb:4d} "
            f"mIoU(o->u)={iou:.4f} mIoU(u->o)={iou_r:.4f}"
        )


if __name__ == "__main__":
    main()
