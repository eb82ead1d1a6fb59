"""Label primitives vs scipy ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from aliby_tpu.ops import labels as L


def _random_blobs(seed, size=96, n=8):
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size), bool)
    for _ in range(n):
        cy, cx = rng.integers(8, size - 8, 2)
        r = rng.integers(3, 7)
        yy, xx = np.mgrid[0:size, 0:size]
        img |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
    return img


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("connectivity", [1, 2])
def test_connected_components_matches_scipy(seed, connectivity):
    mask = _random_blobs(seed)
    structure = ndi.generate_binary_structure(2, connectivity)
    ref, n_ref = ndi.label(mask, structure=structure)
    ours = np.asarray(L.connected_components(mask, connectivity=connectivity))
    # Same partition: bijection between label sets
    assert (ours > 0).sum() == (ref > 0).sum()
    pairs = set(zip(ref[mask].tolist(), ours[mask].tolist()))
    assert len(pairs) == n_ref  # one-to-one
    assert len({a for a, _ in pairs}) == n_ref
    assert len({b for _, b in pairs}) == n_ref


def test_relabel_sequential():
    lbl = np.array([[0, 5, 5], [9, 0, 2], [9, 2, 0]], np.int32)
    new, forward = L.relabel_sequential(lbl, max_labels=8)
    new = np.asarray(new)
    assert sorted(np.unique(new).tolist()) == [0, 1, 2, 3]
    # ascending original order: 2->1, 5->2, 9->3
    assert new[1, 2] == 1 and new[0, 1] == 2 and new[1, 0] == 3
    fw = np.asarray(forward)
    assert fw[1] == 2 and fw[2] == 5 and fw[3] == 9


def test_segment_sum_and_onehot():
    lbl = np.array([[1, 1, 0], [2, 2, 2], [0, 0, 3]], np.int32)
    vals = np.arange(9, dtype=np.float32).reshape(3, 3)
    sums = np.asarray(L.segment_sum(vals, lbl, max_labels=4))
    assert sums[0] == 0 + 1
    assert sums[1] == 3 + 4 + 5
    assert sums[2] == 8
    assert sums[3] == 0
    oh = np.asarray(L.label_onehot(lbl, 4))
    assert oh.shape == (4, 3, 3)
    assert oh[0].sum() == 2 and oh[1].sum() == 3 and oh[2].sum() == 1


def test_big_snake():
    """A long winding component converges within the iteration budget."""
    size = 64
    mask = np.zeros((size, size), bool)
    for row in range(0, size, 4):
        mask[row, :] = True
        if (row // 4) % 2 == 0:
            mask[row : row + 4, -1] = True
        else:
            mask[row : row + 4, 0] = True
    ours = np.asarray(L.connected_components(mask))
    assert len(np.unique(ours[mask])) == 1


def test_pallas_segment_sum_matches_scatter():
    """MXU one-hot matmul segment sums == scatter (interpreter on CPU)."""
    from aliby_tpu.ops.pallas_segsum import segment_sum_auto

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 17, 4000).astype(np.int32)
    values = rng.normal(size=(4000, 5)).astype(np.float32)
    ref = np.zeros((17, 5), np.float32)
    np.add.at(ref, labels, values)
    out = np.asarray(segment_sum_auto(values, labels, 16))
    np.testing.assert_allclose(out, ref[1:], rtol=1e-4, atol=1e-3)


def test_connected_components_hybrid_matches_hook_cc():
    """The hybrid (local sweep + hook finish) CC equals the full hook+jump
    CC on small blobs AND on large/elongated components."""
    import numpy as np

    from aliby_tpu.ops.labels import (
        connected_components,
        connected_components_hybrid,
    )

    rng = np.random.default_rng(3)
    mask = np.zeros((128, 128), bool)
    for _ in range(40):  # scattered blobs up to ~9 px extent
        cy, cx = rng.integers(6, 122, 2)
        r = rng.integers(1, 5)
        yy, xx = np.ogrid[:128, :128]
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    a = np.asarray(connected_components(jnp.asarray(mask), 2, 24))
    b = np.asarray(connected_components_hybrid(jnp.asarray(mask)))
    np.testing.assert_array_equal(a, b)


def test_connected_components_hybrid_large_and_snake_components():
    import numpy as np

    from aliby_tpu.ops.labels import (
        connected_components,
        connected_components_hybrid,
    )

    mask = np.zeros((128, 128), bool)
    mask[20:80, 20:80] = True          # 60x60 solid block
    mask[100, 5:120] = True            # 115-px snake
    mask[5:60, 110] = True             # vertical snake
    a = np.asarray(connected_components(jnp.asarray(mask), 2, 24))
    b = np.asarray(connected_components_hybrid(jnp.asarray(mask)))
    np.testing.assert_array_equal(a, b)
