"""Fused-step throughput vs FOV batch size (fixed-cost amortization probe).

The tunnel-attached chip pays per-dispatch fixed costs (~28 ms dispatch
floor after any D2H, host bookkeeping, readback latency) that an 8-FOV
batch charges to 8 fov-tps. A production plate has 96+ positions, so
batching more FOVs per fused dispatch is a realistic configuration.
This probe measures the SAME full-bank fused step at batch sizes
8/16/32 and prints per-batch fov/s (best of N through the tunnel).

Run on the TPU chip: python scripts/batch_scaling_probe.py [sizes...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from aliby_tpu.engine.fused import (
        FusedObject,
        compile_fused_step,
        results_from_fused,
    )
    from aliby_tpu.models.segment import dispatch_segmenter

    print(f"devices: {jax.devices()}", flush=True)
    seg = dispatch_segmenter("cellpose", channel_to_segment=0, second_channel=3)
    seg2 = dispatch_segmenter("cellpose", channel_to_segment=3, second_channel=0)

    full_mono = {
        "None": {"None": ("sizeshape",)},
        0: {"max": list(DEFAULT_FEATURES)},
        3: {"max": list(DEFAULT_FEATURES)},
    }
    multi_tree = {
        (0, 3): {"None": {"max": ["pearson", "costes", "manders_fold", "rwc"]}}
    }
    cpkw = {"intensity": {"edge_measurements": False}}

    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for n in sizes:
        fused = compile_fused_step(
            [
                FusedObject(seg.engine, 0, 3, [(full_mono, cpkw), (multi_tree, None)]),
                FusedObject(seg2.engine, 3, 0, [(full_mono, cpkw), (multi_tree, None)]),
            ]
        )

        def run(pixels):
            out = fused(pixels)
            res = []
            for oi in range(2):
                for ti in range(2):
                    res.append(
                        results_from_fused(
                            fused.plans[oi][ti],
                            *out["features"][oi][ti],
                            out["labels"][oi],
                        )
                    )
            return res

        warm = np.concatenate(bench.build_workload(n, seed=3), axis=0)
        batch = np.concatenate(bench.build_workload(n, seed=11), axis=0)
        t0 = time.perf_counter()
        run(warm)
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            run(batch)
            best = min(best, time.perf_counter() - t0)
        print(
            f"batch={n:3d}: {best * 1000:8.1f} ms/step = {n / best:6.2f} fov/s"
            f"  (compile+warm {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
