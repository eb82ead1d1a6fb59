"""Dense-field readback-cap machinery: >64 objects (sticky full-width
rebuild) and >255 objects (uint8 -> uint16 label readback), bit-equal to
the stepwise path (VERDICT r3 item 3 — the cap path had never been
exercised by any test; real Cell Painting plates run hundreds of objects
per FOV, reference ``extraction/extract.py:345-374`` handles them
object-by-object).

A deterministic stub engine stands in for the segmenter so the realized
label count is exact (the cap logic lives entirely in
``engine/fused.py``'s readback runner and is segmenter-agnostic —
``FusedObject.engine`` is documented as "anything with ._segment_all +
.params").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aliby_tpu.engine.fused import FusedObject, compile_fused_step, results_from_fused
from aliby_tpu.extract.extract import process_tree_masks
from aliby_tpu.test_data import render_dense_cells


class StubEngine:
    """Returns fixed dense labels; shape contract of CellposeTPU._segment_all
    ((F, 2, H, W) images -> (F, H, W) int32 labels)."""

    def __init__(self, labels):
        self.params = {"empty": jnp.zeros(())}
        self._labels = jnp.asarray(labels, jnp.int32)

    def _segment_all(self, params, images):
        del params, images
        return self._labels


def _dense_case(size, n_cells, rmin, rmax, seed):
    rng = np.random.default_rng(seed)
    labels = np.stack(
        [render_dense_cells(size, n_cells, rng, rmin=rmin, rmax=rmax)
         for _ in range(2)]
    )
    img = np.stack(
        [(labels[f] > 0) * (0.4 + 0.02 * (labels[f] % 7))
         + rng.normal(0, 0.01, (size, size))
         for f in range(2)]
    ).astype(np.float32)
    pixels = np.stack([img, img * 0.5 + 0.1])[:, :, None].transpose(1, 0, 2, 3, 4)
    # pixels: (F=2, C=2, Z=1, Y, X)
    return labels.astype(np.int32), pixels.astype(np.float32)


def _assert_fused_equals_stepwise(labels, pixels, max_labels):
    mono_tree = {"None": {"None": ("sizeshape",)}, 0: {"max": ["mean"]}}
    masks = [labels[f] for f in range(labels.shape[0])]
    ref = process_tree_masks(mono_tree, masks, pixels)

    fused = compile_fused_step(
        [FusedObject(StubEngine(labels), 0, 1, [(mono_tree, None)])],
        max_labels=max_labels,
        out_labels_cap=64,
    )
    out = fused(pixels)
    # labels must be read back at full fidelity despite the uint8 default
    np.testing.assert_array_equal(out["labels"][0], labels)
    fused_res = results_from_fused(
        fused.plans[0][0], *out["features"][0][0], out["labels"][0]
    )
    for (ri, rv), (fi, fv) in zip(zip(*ref), zip(*fused_res)):
        assert ri == fi
        if isinstance(rv, dict):
            for k in rv:
                np.testing.assert_allclose(rv[k], fv[k], rtol=2e-4,
                                           atol=1e-5, err_msg=str((ri, k)))
        else:
            assert np.isclose(rv, fv, rtol=2e-4, atol=1e-5) or (
                np.isnan(rv) and np.isnan(fv)
            )
    return fused, out


def test_dense_over_cap_sticky_rebuild():
    """>64 objects/tile crosses out_labels_cap=64: the runner must detect
    the overflow on the labels readback, rebuild at full width, and stay
    there (sticky) — with values identical to the stepwise path."""
    labels, pixels = _dense_case(96, 90, rmin=2.0, rmax=4.0, seed=5)
    n_obj = int(labels.max())
    assert n_obj > 64, f"fixture too sparse ({n_obj})"
    fused, _ = _assert_fused_equals_stepwise(labels, pixels, max_labels=128)
    # a second call re-uses the rebuilt executable (no further recompiles):
    # the sticky state now reads back the full label axis
    out2 = fused(pixels)
    np.testing.assert_array_equal(out2["labels"][0], labels)
    arr = out2["features"][0][0][1]
    assert arr.shape[-1] == 128  # full width, not the 64 cap


def test_dense_over_uint8_label_range():
    """>255 objects/tile flips the uint8 labels readback to uint16; values
    stay bit-equal to the stepwise path (the wrap the uint8 default would
    cause is exactly what the sticky rebuild guards)."""
    labels, pixels = _dense_case(160, 320, rmin=1.8, rmax=3.0, seed=9)
    n_obj = int(labels.max())
    assert n_obj > 255, f"fixture too sparse ({n_obj})"
    _assert_fused_equals_stepwise(labels, pixels, max_labels=400)


def test_cap_not_crossed_keeps_uint8():
    """Control: under the cap, the narrow (uint8, 64-slot) readback is kept
    (no rebuild) and values still match the stepwise path."""
    labels, pixels = _dense_case(96, 20, rmin=3.0, rmax=5.0, seed=3)
    assert 0 < int(labels.max()) <= 64
    fused, out = _assert_fused_equals_stepwise(labels, pixels, max_labels=128)
    arr = out["features"][0][0][1]
    assert arr.shape[-1] == 64  # capped readback width
