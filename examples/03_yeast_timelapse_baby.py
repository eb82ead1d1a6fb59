"""Yeast time-lapse: zarr -> BABY-class segmentation -> tracking + lineage.

The time-lapse workflow (reference example 03): each zarr position is a
(T, C, Z, Y, X) movie; the BABY-class segmenter produces layered masks
with track-consistent cell labels and mother assignments; extraction runs
the overlapping-mask path; tracking/lineage land in their own parquet.

The in-process BABY equivalent runs by default. To use a remote BABY
server, pass ``baby_address="tcp://host:port"`` (or ipc://) plus
``baby_modelset`` to the builder — that selects step kind ``nahual_baby``.
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

from aliby_tpu.io.dataset import DatasetZarr
from aliby_tpu.pipe_baby import run_pipeline_and_post
from aliby_tpu.pipe_builder_baby import build_pipeline_steps
from aliby_tpu.pipe_core import configure_logging
from aliby_tpu.test_data import get_dataset_path

DATA_PATH = get_dataset_path("yeast_zarr")
positions = DatasetZarr(DATA_PATH).get_position_ids()
print(f"Discovered {len(positions)} positions: {[p['key'] for p in positions]}")
# Each position: (T=4, C=3, Z=3, Y=293, X=293) uint16

NTPS = 4

base_pipeline = build_pipeline_steps(
    channels_to_segment={"cell": 1},
    channels_to_extract=[1, 2],
    features_to_extract=("intensity", "sizeshape"),
    tile_size=None,  # mono-tile; set 117 for ALCATRAS trap detection
    base_kind="threshold",
    threshold_scale=0.6,
)
base_pipeline["ntps"] = NTPS


def run_one_position(position: dict, output_path: Path) -> None:
    pipeline = deepcopy(base_pipeline)
    pipeline["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": position["key"], "path": position["path"]},
        "capture_order": "TCZYX",
    }
    pipeline["steps"]["tile"]["track_drift"] = True
    configure_logging(output_path / "log.txt")
    run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=output_path,
        overwrite=False,
    )


if __name__ == "__main__":
    OUTPUT_DIR = Path(mkdtemp(prefix="aliby_tpu_yeast_"))
    for pos in positions:
        run_one_position(pos, OUTPUT_DIR)

    for pos in positions:
        prof = pq.read_table(OUTPUT_DIR / "profiles" / f"{pos['key']}.parquet")
        track = pq.read_table(
            OUTPUT_DIR / "tracking" / f"{pos['key']}_segment_cell.parquet"
        )
        print(
            f"{pos['key']}: {prof.num_rows} profile rows over "
            f"{len(set(prof.column('metadata_tp').to_pylist()))} tps; "
            f"{track.num_rows} tracking rows"
        )
