"""In-composition family ablation for the fused full-bank program.

Compiles the bench full-bank fused step minus one feature family at a
time and reports the steady-state delta vs the full program — the honest
way to attribute time inside ONE fused executable (standalone stage
tables mislead: XLA CSEs shared subtrees and fusions shift costs).

Run on the TPU chip: python scripts/ablate_families.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, reps=5):
    import jax

    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import bench
    from aliby_tpu.engine.builders import DEFAULT_FEATURES
    from aliby_tpu.engine.fused import FusedObject, compile_fused_step
    from aliby_tpu.models.segment import dispatch_segmenter

    print(f"devices: {jax.devices()}", file=sys.stderr)
    seg = dispatch_segmenter("cellpose", channel_to_segment=0, second_channel=3)
    seg2 = dispatch_segmenter("cellpose", channel_to_segment=3, second_channel=0)
    cpkw = {"intensity": {"edge_measurements": False}}
    multi_tree = {
        (0, 3): {"None": {"max": ["pearson", "costes", "manders_fold", "rwc"]}}
    }
    n_fovs = 8
    batch = np.concatenate(bench.build_workload(n_fovs, seed=11), axis=0)
    warm = np.concatenate(bench.build_workload(n_fovs, seed=3), axis=0)

    def build(features, with_sizeshape=True, with_coloc=True):
        mono = {}
        if with_sizeshape:
            mono["None"] = {"None": ("sizeshape",)}
        if features:
            mono[0] = {"max": list(features)}
            mono[3] = {"max": list(features)}
        trees = [(mono, cpkw)] + ([(multi_tree, None)] if with_coloc else [])
        return compile_fused_step(
            [
                FusedObject(seg.engine, 0, 3, trees),
                FusedObject(seg2.engine, 3, 0, trees),
            ]
        )

    def measure(fused):
        fused(warm)
        dt = best_of(lambda: fused(batch), reps=5)
        return dt

    full = list(DEFAULT_FEATURES)
    fused_full = build(full)
    t_full0 = measure(fused_full)
    print(f"FULL: {t_full0 * 1e3:7.1f} ms ({n_fovs / t_full0:6.2f} fov/s)")

    configs = [("minus " + f, [x for x in full if x != f], True, True) for f in full]
    configs.append(("minus sizeshape", full, False, True))
    configs.append(("minus coloc", full, True, False))
    configs.append(("segment-only floor", [], False, False))

    # The tunnel drifts by hundreds of ms over a multi-minute run, so a
    # single up-front FULL anchor produces garbage deltas (observed:
    # removing a family "slowing" the program). Bracket every config with
    # a fresh FULL measurement and difference against the bracket mean —
    # drift cancels to first order.
    t_prev = t_full0
    for name, feats, ss, co in configs:
        t = measure(build(feats, with_sizeshape=ss, with_coloc=co))
        t_next = measure(fused_full)
        anchor = 0.5 * (t_prev + t_next)
        print(
            f"{name:28s}: {t * 1e3:7.1f} ms  delta {1e3 * (anchor - t):+7.1f} ms"
            f"  (bracket FULL {t_prev * 1e3:.0f}/{t_next * 1e3:.0f})"
        )
        t_prev = t_next


if __name__ == "__main__":
    main()
