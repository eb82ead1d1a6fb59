"""End-to-end pipeline: fixture -> tile -> segment -> extract -> parquet.

Mirrors the reference's integration tier (tests/test_cellpose_cpmeasure_
minimal.py and test_examples_with_fixture.py): real small data, the public
builder, and a profiles parquet at the end.
"""

from copy import deepcopy

import numpy as np
import pyarrow.parquet as pq
import pytest

from aliby_tpu.io.dataset import DatasetDir, DatasetZarr
from aliby_tpu.pipe import run_pipeline_and_post
from aliby_tpu.pipe_builder import build_pipeline_steps
from aliby_tpu.pipe_core import configure_logging, validate_pipeline
from aliby_tpu.test_data import get_dataset, get_dataset_path


def _cellpainting_position():
    entry = get_dataset("crop_cellpainting_256")
    ds = DatasetDir(
        get_dataset_path(entry["name"]),
        regex=entry["regex"],
        capture_order=entry["capture_order"],
    )
    return entry, ds.get_position_ids()[0]


def _stamp(pipeline, entry, position):
    pipeline = deepcopy(pipeline)
    pipeline["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": position["key"], "path": position["path"]},
        "regex": entry["regex"],
        "capture_order": entry["capture_order"],
    }
    return pipeline


def test_validate_pipeline_rejects_bad_configs():
    base = build_pipeline_steps(channels_to_segment={"cell": 0})
    validate_pipeline(base)  # well-formed
    bad = deepcopy(base)
    bad["passed_data"]["extract_cell"] = [("masks", "segment_ghost")]
    with pytest.raises(ValueError, match="segment_ghost"):
        validate_pipeline(bad)
    bad2 = deepcopy(base)
    bad2["save"] = ["nonexistent"]
    with pytest.raises(ValueError, match="nonexistent"):
        validate_pipeline(bad2)
    bad3 = deepcopy(base)
    bad3["save_interval"] = 0
    with pytest.raises(ValueError, match="save_interval"):
        validate_pipeline(bad3)
    bad4 = deepcopy(base)
    bad4["steps"]["track"] = {}
    bad4["passed_data"]["track"] = [("masks", "segment_cell")]
    bad4["retain"] = {"segment_cell": 1}
    with pytest.raises(ValueError, match="too small"):
        validate_pipeline(bad4)


def test_builder_shape():
    """Step layout matches the documented pipeline (examples/01:72-75)."""
    p = build_pipeline_steps(
        channels_to_segment={"nuclei": 0, "cell": 3},
        channels_to_extract=[0, 1, 3],
        features_to_extract=("intensity", "sizeshape"),
    )
    assert list(p["steps"]) == [
        "tile",
        "segment_nuclei",
        "segment_cell",
        "extract_nuclei",
        "extract_cell",
        "extractmulti_nuclei",
        "extractmulti_cell",
    ]
    assert p["passed_methods"]["segment_nuclei"] == ("tile", "get_fczyx")
    assert p["save"] == ["segment_nuclei", "segment_cell"]
    coloc_tree = p["steps"]["extractmulti_cell"]["tree"]
    assert set(coloc_tree) == {(0, 1), (0, 3), (1, 3)}


@pytest.fixture(scope="module")
def e2e_output(tmp_path_factory, data_dir):
    """Run the full standard pipeline once on the Cell Painting fixture."""
    entry, position = _cellpainting_position()
    base = build_pipeline_steps(
        channels_to_segment={"nuclei": 0, "cell": 3},
        channels_to_extract=[0, 3],
        features_to_extract=("intensity", "sizeshape"),
        cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
        segmenter_extra_kwargs={"kind": "threshold", "threshold_scale": 0.6},
    )
    pipeline = _stamp(base, entry, position)
    out_dir = tmp_path_factory.mktemp("e2e")
    configure_logging(out_dir / "log.txt")
    profiles, post = run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=out_dir,
        overwrite=False,
    )
    return out_dir, position, profiles


def test_e2e_profiles_parquet(e2e_output):
    out_dir, position, profiles = e2e_output
    f = out_dir / "profiles" / f"{position['key']}.parquet"
    assert f.exists()
    table = pq.read_table(f)
    assert table.num_rows > 10  # ~24 cells rendered in the fixture
    cols = table.column_names
    for c in ("metadata_tile", "metadata_label", "metadata_object", "metadata_tp"):
        assert c in cols
    assert any(c.startswith("0/max/intensity/Intensity_") for c in cols)
    assert any("sizeshape/AreaShape_Area" in c for c in cols)
    assert any("/pearson" in c for c in cols)
    # both objects present
    objs = set(table.column("metadata_object").to_pylist())
    assert objs == {"nuclei", "cell"}
    # edge_measurements disabled propagated
    assert not any("IntensityEdge" in c for c in cols)


def test_e2e_step_checkpoints(e2e_output):
    out_dir, position, _ = e2e_output
    seg_dir = out_dir / "steps" / position["key"] / "segment_nuclei"
    files = sorted(seg_dir.glob("*.npz"))
    assert files, "per-tp npz checkpoints missing"
    with np.load(files[0]) as npz:
        assert "arr_0" in npz
        stacked = npz["arr_0"]
        assert stacked.ndim == 3  # (tiles, Y, X)
        assert stacked.max() > 0


def test_e2e_skip_if_exists(e2e_output):
    out_dir, position, _ = e2e_output
    entry, pos = _cellpainting_position()
    base = build_pipeline_steps(
        channels_to_segment={"nuclei": 0},
        channels_to_extract=[0],
        features_to_extract=("intensity",),
        segmenter_extra_kwargs={"kind": "threshold"},
    )
    pipeline = _stamp(base, entry, pos)
    profiles, post = run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=out_dir,
        overwrite=False,
    )
    assert profiles is None and post is None  # skipped


def test_e2e_timeseries_with_tracking(tmp_path, data_dir):
    """Yeast zarr time-lapse with per-tp stitch tracking (ntps=3)."""
    root = get_dataset_path("yeast_zarr")
    position = DatasetZarr(root).get_position_ids()[0]
    pipeline = {
        "steps": {
            "tile": {
                "tile_size": None,
                "track_drift": True,
                "image_kwargs": {
                    "source": {"key": position["key"], "path": position["path"]},
                    "capture_order": "TCZYX",
                },
            },
            "segment_cell": {
                "segmenter_kwargs": {"kind": "threshold", "threshold_scale": 0.6},
                "channel_to_segment": 0,
            },
            "track": {"kind": "stitch"},
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}, 1: {"max": ["mean"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "track": [("masks", "segment_cell")],
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")],
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": ["segment_cell"],
        "save_interval": 1,
        "retain": {"segment_cell": 2, "tile": 1},
        "ntps": 3,
    }
    profiles, _ = run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=tmp_path,
        overwrite=True,
    )
    tps = set(profiles.column("metadata_tp").to_pylist())
    assert tps == {0, 1, 2}
    assert profiles.num_rows > 10


def test_example01_column_inventory(tmp_path, data_dir):
    """The example-01 schema anchor (reference: 26 rows x 632 columns,
    examples/01:156-163): OUR pipeline's full column inventory for the
    example-01 configuration is pinned in tests/golden/ — any schema drift
    (renamed/lost/added feature columns) fails this diff."""
    from pathlib import Path

    entry, position = _cellpainting_position()
    # the EXACT reference example-01 configuration
    # (examples/01_cell_painting_tiff.py:65-71): nuclei=DNA(0),
    # cell=AGP(3), extract ALL 5 channels, intensity+sizeshape,
    # edge_measurements off, coloc over all 10 channel pairs.
    base = build_pipeline_steps(
        channels_to_segment={"nuclei": 0, "cell": 3},
        channels_to_extract=[0, 1, 2, 3, 4],
        features_to_extract=("intensity", "sizeshape"),
        cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
        segmenter_extra_kwargs={"kind": "threshold", "threshold_scale": 0.6},
    )
    pipeline = _stamp(base, entry, position)
    profiles, _ = run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=tmp_path,
        overwrite=True,
    )
    golden = set(
        (Path(__file__).parent / "golden" / "example01_columns.txt")
        .read_text().splitlines()
    )
    got = set(profiles.column_names)
    missing = sorted(golden - got)
    extra = sorted(got - golden)
    assert not missing and not extra, (
        f"schema drift: {len(missing)} missing {missing[:5]}, "
        f"{len(extra)} extra {extra[:5]} "
        "(regenerate tests/golden/example01_columns.txt if intentional)"
    )
    # the reference's published anchor: ~26 rows x 632 columns — the
    # column COUNT must now match exactly (4 metadata + 6x78 sizeshape +
    # 5x16 intensity + 10x8 coloc)
    assert len(got) == 632, f"expected 632 columns, got {len(got)}"
    assert profiles.num_rows > 10
