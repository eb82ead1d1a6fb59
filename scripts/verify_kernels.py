"""Hardware self-test lane for every Pallas kernel branch (VERDICT r4 item 4).

The CPU suite runs every kernel in interpreter mode, which cannot exercise
Mosaic layout verification — round 4's `bench --dense` crash (a 512-wide
pixel tile disagreeing with XLA's T(1024) layout for the shared flattened
labels buffer) sailed through interpreter tests and died on the chip. This
script compiles and RUNS every `pallas_call` branch on the real TPU and
asserts parity against the XLA scatter/gather/loop fallbacks:

- ``binned_sum_cols_batched``: both tile branches (l_pad<=512 -> 2048,
  otherwise 1024) x narrow/padded K, up to the 2176-bin kernel cap;
- ``binned_minmax_batched``: same widths;
- ``table_lookup_batched``: narrow + widest tables, non-finite entries;
- ``segment_sum_matmul``: the unbatched top kernel;
- ``successor_prop`` / ``diffuse_heat``: the VMEM-resident stencil loops
  at production (16, 256, 256) shapes and an odd-batch shape;
- the MIXED-width single program: several widths sharing ONE flattened
  bins buffer inside one jit (the exact CSE/layout-conflict regression).

Exit 0 = every branch compiled by the real Mosaic pipeline and matched.
Run: python scripts/verify_kernels.py   (also: python bench.py --kernels)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _report(name):
    print(f"ok: {name}", flush=True)


def main() -> int:
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    from aliby_tpu.ops.pallas_segsum import (
        binned_minmax_batched,
        binned_sum_cols_batched,
        segment_sum_matmul,
        table_lookup_batched,
    )
    from aliby_tpu.ops.pallas_stencil import diffuse_heat, successor_prop

    dev = jax.devices()[0]
    print(f"device: {dev} ({getattr(dev, 'device_kind', dev.platform)})")
    if dev.platform != "tpu":
        print("NOT a TPU — this lane verifies real Mosaic compilation only.")
        return 2

    rng = np.random.default_rng(0)
    B, H, W = 16, 256, 256
    n = H * W
    bins = jnp.asarray(rng.integers(0, 500, (B, n), dtype=np.int32))

    # --- binned sums: both tile branches x K widths (1 = heavy K8 padding,
    # 9 = padded to 16, 16 = exact) ------------------------------------------
    for n_bins in (65, 128, 257, 513, 640, 1281, 2176):
        for K in (1, 9):
            vals = jnp.asarray(rng.normal(size=(B, n, K)).astype(np.float32))
            ref = (
                jnp.zeros((B, n_bins, K))
                .at[jnp.arange(B)[:, None], bins]
                .add(vals)
            )
            got = binned_sum_cols_batched(vals, bins, n_bins)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-2
            )
            _report(f"binned_sum_cols_batched n_bins={n_bins} K={K}")

    # --- min/max: both branches ---------------------------------------------
    for n_bins in (128, 640, 2176):
        vals = jnp.asarray(rng.normal(size=(B, n, 2)).astype(np.float32))
        mn, mx = binned_minmax_batched(vals, bins, n_bins)
        big = jnp.full((B, n_bins, 2), jnp.inf)
        ref_mn = big.at[jnp.arange(B)[:, None], bins].min(vals)
        ref_mx = (-big).at[jnp.arange(B)[:, None], bins].max(vals)
        np.testing.assert_allclose(np.asarray(mn), np.asarray(ref_mn))
        np.testing.assert_allclose(np.asarray(mx), np.asarray(ref_mx))
        _report(f"binned_minmax_batched n_bins={n_bins}")

    # --- table lookup: narrow + widest, with non-finite rows ----------------
    for L in (128, 640, 2176):
        tab = rng.normal(size=(B, L, 3)).astype(np.float32)
        tab[:, 7, 1] = np.nan
        tab[:, 11, 2] = np.inf
        tab = jnp.asarray(tab)
        idx = jnp.asarray(rng.integers(0, L, (B, n), dtype=np.int32))
        got = table_lookup_batched(tab, idx)
        ref = jnp.take_along_axis(tab, idx[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4)
        _report(f"table_lookup_batched L={L} (non-finite rows)")

    # --- unbatched top kernel -----------------------------------------------
    flat_l = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    ref = jnp.zeros((257, 16)).at[flat_l].add(vals)[1:]
    got = segment_sum_matmul(vals, flat_l, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-2)
    _report("segment_sum_matmul max_labels=256")

    # --- stencil kernels at production + odd-batch shapes -------------------
    for Bs in (16, 5):
        dcode = jnp.asarray(rng.integers(0, 9, (Bs, H, W), dtype=np.int32))
        yy, xx = np.mgrid[0:H, 0:W].astype(np.int32)
        key0 = jnp.asarray(np.broadcast_to(yy * W + xx, (Bs, H, W)).copy())
        got = successor_prop(dcode, key0, n_prop=12, block=6)
        ref = successor_prop(dcode, key0, n_prop=12, block=6, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        _report(f"successor_prop B={Bs} n_prop=12")

        labels = jnp.asarray(rng.integers(0, 8, (Bs, H, W), dtype=np.int32))
        source = (
            jnp.asarray(rng.random((Bs, H, W)).astype(np.float32)) < 0.01
        ).astype(jnp.float32)
        got = diffuse_heat(labels, source, n_iter=8)
        ref = diffuse_heat(labels, source, n_iter=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        _report(f"diffuse_heat B={Bs} n_iter=8")

    # --- the regression: mixed widths over ONE shared bins buffer ----------
    vals = jnp.asarray(rng.normal(size=(B, n, 4)).astype(np.float32))
    tab = jnp.asarray(rng.normal(size=(B, 2176, 3)).astype(np.float32))

    @jax.jit
    def mixed(vals, bins, tab):
        a = binned_sum_cols_batched(vals, bins, 128)  # tile=2048
        b = binned_sum_cols_batched(vals, bins, 513)  # tile=1024
        c = binned_sum_cols_batched(vals, bins, 2176)  # widest
        mn, mx = binned_minmax_batched(vals, bins, 640)
        lk = table_lookup_batched(tab, bins)
        fin = lambda x: jnp.where(jnp.isfinite(x), x, 0.0).sum()
        return a.sum() + b.sum() + c.sum() + fin(mn) + fin(mx) + lk.sum()

    out = float(mixed(vals, bins, tab))
    assert np.isfinite(out), out
    _report("mixed-width single program (shared bins buffer)")

    print("ALL KERNEL BRANCHES COMPILED AND MATCHED ON HARDWARE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
