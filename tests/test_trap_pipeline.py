"""Multi-tile (trap) pipeline: detection -> per-tile masks -> profiles."""

import numpy as np
import pytest

from aliby_tpu.io import zarrlite
from aliby_tpu.pipe import run_pipeline_and_post


@pytest.fixture(scope="module")
def trap_store(tmp_path_factory):
    """A trap field with cells inside the traps, as a 1-position zarr."""
    rng = np.random.default_rng(2)
    size, spacing, trap = 420, 96, 22
    img = rng.normal(100, 3, (size, size)).astype(np.float32)
    fluo = rng.normal(50, 2, (size, size)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(4):
        for j in range(4):
            cy, cx = 48 + spacing // 2 + i * spacing, 48 + spacing // 2 + j * spacing
            img[cy - trap // 2 : cy + trap // 2, cx - trap // 2 : cx - trap // 2 + 4] += 90
            img[cy - trap // 2 : cy + trap // 2, cx + trap // 2 - 4 : cx + trap // 2] += 90
            img[cy + trap // 2 - 4 : cy + trap // 2, cx - trap // 2 : cx + trap // 2] += 90
            # a cell sitting in the trap
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            fluo += 400 * np.exp(-d2 / (2 * 5.0**2))
    stack = np.stack([img, fluo])[None, :, None]  # (T, C, Z, Y, X)
    root = tmp_path_factory.mktemp("trapstore")
    zarrlite.write_array(root / "posT", stack.astype(np.float32))
    return root / "posT"


def test_trap_pipeline_multitile(trap_store, tmp_path):
    pipeline = {
        "steps": {
            "tile": {
                "tile_size": 64,
                "track_drift": False,
                "image_kwargs": {
                    "source": {"key": "posT", "path": str(trap_store)},
                    "capture_order": "TCZYX",
                },
            },
            "segment_cell": {
                "segmenter_kwargs": {
                    "kind": "threshold", "threshold_scale": 0.8, "min_size": 10,
                },
                "channel_to_segment": 1,
            },
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}, 1: {"max": ["mean"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")]
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": ["segment_cell"],
        "save_interval": 1,
    }
    profiles, _ = run_pipeline_and_post(
        pipeline=pipeline, pipeline_name="posT", output_path=tmp_path,
        overwrite=True,
    )
    tiles = set(profiles.column("metadata_tile").to_pylist())
    # the trap detector found a grid: several tiles, each with >= 1 cell
    assert len(tiles) >= 6
    areas = profiles.column("None/None/area/area").to_pylist()
    assert all(a >= 10 for a in areas)
    # per-tile npz stack matches the tile count
    files = sorted((tmp_path / "steps" / "posT" / "segment_cell").glob("*.npz"))
    with np.load(files[0]) as npz:
        assert npz["arr_0"].shape[0] >= len(tiles)
        assert npz["arr_0"].shape[1:] == (64, 64)


def test_retain_and_pixel_hygiene(trap_store, tmp_path):
    """History trimming per retain; tile pixels dropped after each tp."""
    from aliby_tpu.engine.core import pipeline_step, validate_pipeline
    from aliby_tpu.pipe import init_step

    pipeline = {
        "steps": {
            "tile": {
                "tile_size": None,
                "track_drift": False,
                "image_kwargs": {
                    "source": {"key": "posT", "path": str(trap_store)},
                    "capture_order": "TCZYX",
                },
            },
            "segment_cell": {
                "segmenter_kwargs": {"kind": "threshold"},
                "channel_to_segment": 1,
            },
        },
        "passed_data": {},
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": [],
        "save_interval": 1,
        "retain": {"segment_cell": 1, "tile": 1},
    }
    validate_pipeline(pipeline)
    state = None
    state = pipeline_step(pipeline, state, None, init_step)
    # same single-tp store re-run: histories stay bounded at 1
    state["tps"] = {k: 0 for k in state["tps"]}
    state = pipeline_step(pipeline, state, None, init_step)
    assert len(state["data"]["segment_cell"]) == 1
    assert len(state["data"]["tile"]) == 1
    assert "pixels" not in state["data"]["tile"][-1]
