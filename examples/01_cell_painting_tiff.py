"""Cell Painting profiling: TIFF directory -> segmentation -> feature bank.

The standard workflow (reference example 01): discover positions in a TIFF
plate by filename regex, build the standard pipeline (segment nuclei + cell,
per-channel intensity/sizeshape, pairwise colocalization), run every
position, inspect the profiles parquet.

Uses the bundled synthetic fixture; swap DATA_PATH/REGEX/CAPTURE_ORDER for
your plate. On a TPU host the segmentation + extraction run on-device; set
``segmenter_extra_kwargs={"kind": "threshold"}`` for a model-free run.
"""

# Allow running straight from a source checkout (no install).
import sys
from pathlib import Path

if "aliby_tpu" not in sys.modules:
    try:
        import aliby_tpu  # noqa: F401
    except ImportError:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from copy import deepcopy
from pathlib import Path
from tempfile import mkdtemp

import pyarrow.parquet as pq

from aliby_tpu.io.dataset import DatasetDir
from aliby_tpu.pipe import run_pipeline_and_post
from aliby_tpu.pipe_builder import build_pipeline_steps
from aliby_tpu.pipe_core import configure_logging
from aliby_tpu.test_data import get_dataset, get_dataset_path

# 1. Input data + filename convention -------------------------------------
ENTRY = get_dataset("crop_cellpainting_256")
DATA_PATH = get_dataset_path(ENTRY["name"])
REGEX = ENTRY["regex"]
CAPTURE_ORDER = ENTRY["capture_order"]  # "WFC": well, field, channel
CHANNELS = ENTRY["channels"]  # {"DNA": 0, "ER": 1, "RNA": 2, "AGP": 3, "Mito": 4}

# 2. Discover positions ----------------------------------------------------
positions = DatasetDir(
    DATA_PATH, regex=REGEX, capture_order=CAPTURE_ORDER
).get_position_ids()
print(f"Discovered {len(positions)} positions: {[p['key'] for p in positions]}")

# 3. Build the pipeline definition ----------------------------------------
from aliby_tpu.models.segment import BUNDLED_WEIGHTS

segmenter = (
    {"kind": "cellpose"}
    if BUNDLED_WEIGHTS.exists()
    else {"kind": "threshold", "threshold_scale": 0.6}
)
base_pipeline = build_pipeline_steps(
    channels_to_segment={"nuclei": CHANNELS["DNA"], "cell": CHANNELS["AGP"]},
    channels_to_extract=list(CHANNELS.values()),
    features_to_extract=("intensity", "sizeshape"),
    cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
    segmenter_extra_kwargs=segmenter,
)
if BUNDLED_WEIGHTS.exists():
    # one fused device program per timepoint (engine.compiled)
    base_pipeline["compiled"] = True
print("Pipeline steps:", list(base_pipeline["steps"]))


# 4. Per-position runner ---------------------------------------------------
def run_one_position(position: dict, output_path: Path) -> None:
    pipeline = deepcopy(base_pipeline)
    pipeline["io"] = {
        "input_path": {"key": position["key"], "path": position["path"]},
        "capture_order": CAPTURE_ORDER,
    }
    pipeline["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": position["key"], "path": position["path"]},
        "regex": REGEX,
        "capture_order": CAPTURE_ORDER,
    }
    configure_logging(output_path / "log.txt")
    run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=output_path,
        overwrite=False,
    )


if __name__ == "__main__":
    OUTPUT_DIR = Path(mkdtemp(prefix="aliby_tpu_cellpainting_"))
    print(f"Writing outputs under {OUTPUT_DIR}")

    # Positions share one device: run serially here; see
    # aliby_tpu.parallel.positions for the sharded multi-position runner.
    for pos in positions:
        run_one_position(pos, OUTPUT_DIR)

    files = sorted((OUTPUT_DIR / "profiles").glob("*.parquet"))
    table = pq.read_table(files[0])
    print(
        f"First profile: {files[0].name} -- {table.num_rows} rows, "
        f"{len(table.column_names)} columns"
    )
    print("Sample columns:", table.column_names[:6], "...")
