"""All-NaN tiles (out-of-bounds trap crops) flow through without crashing."""

import numpy as np

from aliby_tpu.extract.extract import format_extraction, process_tree_masks
from aliby_tpu.models.segment import dispatch_segmenter
from aliby_tpu.test_data import render_cells


def test_nan_tile_through_segment_and_extract():
    rng = np.random.default_rng(1)
    cells, nuclei, labels = render_cells(96, 6, rng)
    good = np.stack([cells, nuclei])[:, None]       # (C, Z, Y, X)
    nan_tile = np.full_like(good, np.nan)
    pixels = np.stack([good, nan_tile])             # (F=2, C, Z, Y, X)

    seg = dispatch_segmenter("threshold", channel_to_segment=0, threshold_scale=0.4)
    masks = seg(pixels)
    assert masks[0].max() > 0
    assert masks[1].max() == 0  # NaN tile -> no objects

    tree = {"None": {"None": ("sizeshape",)}, 0: {"max": ["mean", "intensity"]}}
    out = process_tree_masks(tree, masks, pixels)
    table = format_extraction(out)
    # only the good tile contributes rows; no crash, no NaN labels
    assert set(table.column("tile").to_pylist()) == {0}
    assert table.num_rows == int(masks[0].max())


def test_nan_tile_through_cellpose():
    from aliby_tpu.models.segment import BUNDLED_WEIGHTS

    if not BUNDLED_WEIGHTS.exists():
        import pytest

        pytest.skip("no bundled weights")
    rng = np.random.default_rng(2)
    cells, nuclei, _ = render_cells(64, 5, rng)
    good = np.stack([cells, nuclei])[:, None]
    pixels = np.stack([good, np.full_like(good, np.nan)])
    seg = dispatch_segmenter(
        "cellpose", channel_to_segment=0, second_channel=1, max_labels=64
    )
    masks = seg(pixels)
    assert masks[0].max() > 0
    assert masks[1].max() == 0
