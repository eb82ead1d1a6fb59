"""Tree executor + formatting contract (reference extract.py:240-301, 520-599)."""

import numpy as np
import pyarrow as pa

from aliby_tpu.extract import format_extraction, process_tree_masks


def _fixture():
    labels = np.zeros((64, 64), np.int32)
    labels[5:20, 5:20] = 1
    labels[30:50, 30:45] = 2
    labels2 = np.zeros((64, 64), np.int32)
    labels2[10:25, 40:55] = 1
    rng = np.random.default_rng(0)
    pixels = rng.uniform(0, 100, (2, 2, 3, 64, 64)).astype(np.float32)
    return [labels, labels2], pixels


def test_process_tree_scalar_metrics():
    masks, pixels = _fixture()
    tree = {"None": {"None": ["area"]}, 0: {"max": ["mean", "total"]}}
    instructions, results = process_tree_masks(tree, masks, pixels)
    # 3 objects x 3 instructions
    assert len(instructions) == 9
    assert len(results) == 9
    # instruction order: object-major (reference product(ind_masks, instructions))
    assert instructions[0][0] == (0, 1)
    assert instructions[3][0] == (0, 2)
    assert instructions[6][0] == (1, 1)
    # verify one value: mean of z-max of ch0 for tile 0, label 1
    idx = [i for i, (om, inst) in enumerate(instructions)
           if om == (0, 1) and inst == (0, "max", "mean")][0]
    zmax = pixels[0, 0].max(axis=0)
    ref = zmax[masks[0] == 1].mean()
    assert np.isclose(results[idx], ref, rtol=1e-5)


def test_process_tree_cp_dicts():
    masks, pixels = _fixture()
    tree = {"None": {"None": ("sizeshape",)}, 1: {"max": ["intensity"]}}
    instructions, results = process_tree_masks(
        tree, masks, pixels,
        cp_measure_kwargs={"intensity": {"edge_measurements": False}},
    )
    d = results[0]
    assert isinstance(d, dict)
    assert "AreaShape_Area" in d
    assert d["AreaShape_Area"].shape == (1,)
    # edge_measurements disabled
    intensity_result = [
        r for (om, inst), r in zip(instructions, results) if inst[-1] == "intensity"
    ][0]
    assert "Intensity_MeanIntensityEdge" not in intensity_result
    assert "Intensity_MeanIntensity" in intensity_result


def test_process_tree_multichannel():
    masks, pixels = _fixture()
    tree = {(0, 1): {"None": {"max": ["pearson"]}}}
    instructions, results = process_tree_masks(tree, masks, pixels)
    assert instructions[0][1] == ((0, 1), "None", "max", "pearson")
    assert "pearson" in results[0]


def test_format_extraction_columns():
    masks, pixels = _fixture()
    tree = {"None": {"None": ["area"]}, 0: {"max": ["intensity"]}}
    table = format_extraction(process_tree_masks(tree, masks, pixels))
    assert isinstance(table, pa.Table)
    cols = table.column_names
    # scalar name duplication quirk: branch + "/" + metric
    assert "None/None/area/area" in cols
    # cp dict naming: branch + "/" + cp key
    assert "0/max/intensity/Intensity_IntegratedIntensity" in cols
    assert cols[:2] == ["tile", "label"]
    assert table.num_rows == 3  # three objects across two tiles
    tiles = table.column("tile").to_pylist()
    labels = table.column("label").to_pylist()
    assert set(zip(tiles, labels)) == {(0, 1), (0, 2), (1, 1)}


def test_format_extraction_multich_column_name():
    masks, pixels = _fixture()
    tree = {(0, 1): {"None": {"max": ["pearson"]}}}
    table = format_extraction(process_tree_masks(tree, masks, pixels))
    assert "(0, 1)/None/max/pearson" in table.column_names


def test_format_extraction_embedder_ndarray():
    """Raw (tiles, dim) embedding arrays become X_<c> columns
    (reference regression: tests/test_nahual_embed_minimal.py)."""
    emb = np.arange(12, dtype=np.float32).reshape(3, 4)
    table = format_extraction(((("__", "__"),), (emb,)))
    assert [c for c in table.column_names if c.startswith("X_")] == [
        "X_0", "X_1", "X_2", "X_3"
    ]
    assert table.num_rows == 3
    assert table.column("X_1").to_pylist() == [1.0, 5.0, 9.0]
