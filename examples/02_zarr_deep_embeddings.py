"""Deep embeddings from a zarr store: CropTiler -> encoder -> X_* profiles.

The embedding workflow (reference example 02): positions come from a zarr
store, each frame is normalized and cut into a fixed grid, and a deep
encoder turns every crop into a feature vector, written as ``X_<i>``
columns in the profiles parquet.

The encoder here is the in-process style-vector embedder (the flagship
U-Net's bottleneck). To serve models off-slice instead, start
``aliby_tpu.net.server.ModelServer`` on another host and use step kind
``nahual_embed`` with its address — the round-robin-per-position pattern
from the reference works unchanged.
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
from aliby_tpu.pipe import run_pipeline_and_post
from aliby_tpu.pipe_core import configure_logging
from aliby_tpu.test_data import get_dataset_path

DATA_PATH = get_dataset_path("cellpainting_zarr")
positions = DatasetZarr(DATA_PATH).get_position_ids()
print(f"Discovered {len(positions)} positions: {[p['key'] for p in positions]}")

EMBED_DIM = 64

base_pipeline = {
    "steps": {
        "tile": {
            "kind": "crop",
            "tile_size": 64,
            "track_drift": False,
            "standard_scale": True,
        },
        "embed_cells": {"model": "style", "dim": EMBED_DIM},
    },
    "passed_data": {"embed_cells": [("pixels", "tile")]},
    "passed_methods": {},
    "save": [],
    "save_interval": 1,
}


def run_one_position(position: dict, output_path: Path) -> None:
    pipeline = deepcopy(base_pipeline)
    pipeline["steps"]["tile"]["image_kwargs"] = {
        "source": {"key": position["key"], "path": position["path"]},
        "capture_order": "CYX",
    }
    configure_logging(output_path / "log.txt")
    run_pipeline_and_post(
        pipeline=pipeline,
        pipeline_name=position["key"],
        output_path=output_path,
        overwrite=False,
    )


if __name__ == "__main__":
    OUTPUT_DIR = Path(mkdtemp(prefix="aliby_tpu_embeddings_"))
    for pos in positions:
        run_one_position(pos, OUTPUT_DIR)
    files = sorted((OUTPUT_DIR / "profiles").glob("*.parquet"))
    table = pq.read_table(files[0])
    x_cols = [c for c in table.column_names if c.startswith("X_")]
    print(
        f"{files[0].name}: {table.num_rows} rows, {len(x_cols)} embedding dims "
        f"(X_0..X_{len(x_cols) - 1}) + metadata columns"
    )
