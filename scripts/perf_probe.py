"""Per-substage device timing for the segmentation path + fused grouping.

Finer-grained than bench.py's stage table: isolates the U-Net forward,
flow integration, sink clustering, flow-error QC, and hole filling inside
``CellposeTPU._segment_all``, then compares the grouped fused program
(objects batched per shared engine) against per-object calls.

Run on the TPU chip: python scripts/perf_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def best_of(fn, reps=5):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import bench
    from aliby_tpu.models import flows as FL
    from aliby_tpu.models.segment import dispatch_segmenter

    print(f"devices: {jax.devices()}")
    seg = dispatch_segmenter("cellpose", channel_to_segment=0, second_channel=3)
    engine = seg.engine
    params = engine.params
    model = engine.model

    B = 16  # both objects' batches concatenated, bench shape
    batch = np.concatenate(bench.build_workload(8, seed=11), axis=0)
    imgs8 = np.stack([batch[:, 0, 0], batch[:, 3, 0]], axis=1)  # (8, 2, Y, X)
    imgs = np.concatenate([imgs8, imgs8[:, ::-1]], axis=0)  # (16, 2, Y, X)
    x = jnp.asarray(imgs)

    from aliby_tpu.models.segment import _normalize_percentile

    @jax.jit
    def fwd(params, images):
        xin = images.transpose(0, 2, 3, 1)
        xin = jax.vmap(
            lambda im: jax.vmap(_normalize_percentile, in_axes=-1, out_axes=-1)(im)
        )(xin)
        pred = model.apply(params, xin)
        return pred[0] if isinstance(pred, tuple) else pred

    pred = fwd(params, x)
    jax.block_until_ready(pred)
    t_fwd = best_of(lambda: fwd(params, x))
    print(f"forward+normalize  ({B} imgs): {t_fwd*1000:8.1f} ms")

    flows = jnp.stack([pred[..., 0], pred[..., 1]], axis=1) / 5.0  # (B,2,H,W)
    cellprob = pred[..., 2]

    @jax.jit
    def stage_follow(flows, cellprob):
        fg = cellprob > 0.0
        return jax.vmap(lambda f, g: FL.follow_flows(f, g, n_iter=2))(flows, fg)

    final = stage_follow(flows, cellprob)
    jax.block_until_ready(final)
    print(f"follow_flows       ({B} imgs): {best_of(lambda: stage_follow(flows, cellprob))*1000:8.1f} ms")

    @jax.jit
    def stage_sinks(final, cellprob):
        fg = cellprob > 0.0
        return jax.vmap(lambda p, g: FL.masks_from_sinks(p, g, max_labels=256))(final, fg)

    labels0 = stage_sinks(final, cellprob)
    jax.block_until_ready(labels0)
    print(f"masks_from_sinks   ({B} imgs): {best_of(lambda: stage_sinks(final, cellprob))*1000:8.1f} ms")

    @jax.jit
    def stage_qc(labels, flows):
        return jax.vmap(FL.masks_to_flows)(labels)

    mf = stage_qc(labels0, flows)
    jax.block_until_ready(mf)
    print(f"QC masks_to_flows  ({B} imgs): {best_of(lambda: stage_qc(labels0, flows))*1000:8.1f} ms")

    @jax.jit
    def stage_fill(labels):
        return jax.vmap(FL.fill_label_holes)(labels)

    jax.block_until_ready(stage_fill(labels0))
    print(f"fill_label_holes   ({B} imgs): {best_of(lambda: stage_fill(labels0))*1000:8.1f} ms")

    full = engine._segment_all(params, x)
    jax.block_until_ready(full)
    print(f"_segment_all QC=on ({B} imgs): {best_of(lambda: engine._segment_all(params, x))*1000:8.1f} ms")

    eng_noqc = dispatch_segmenter(
        "cellpose", channel_to_segment=0, second_channel=3, flow_threshold=None
    ).engine
    jax.block_until_ready(eng_noqc._segment_all(eng_noqc.params, x))
    print(f"_segment_all QC=off({B} imgs): {best_of(lambda: eng_noqc._segment_all(eng_noqc.params, x))*1000:8.1f} ms")


if __name__ == "__main__":
    main()
