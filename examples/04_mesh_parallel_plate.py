"""Mesh-parallel plate processing: every position in ONE sharded dispatch.

The reference scales by forking one OS process per position (joblib,
reference examples/01:141-144). The TPU-native equivalent is SPMD: per
timepoint, all positions' tiles are stacked into one batch whose leading
axis is sharded over the device mesh's ``dp`` axis, and the fused
whole-step program (segmentation + every feature tree, ONE executable)
runs as a single dispatch — XLA partitions it across chips.

On a single-chip or CPU host this still works (and still pays only one
dispatch per timepoint for the whole plate); on a v5e-8 the same script
scales to 8 chips without touching the pipeline definition. Profiles are
bit-identical to the per-position path (pinned by tests/test_parallel.py).

Run on CPU with 8 virtual devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_mesh_parallel_plate.py
"""

# Allow running straight from a source checkout (no install).
import sys
from pathlib import Path

if "aliby_tpu" not in sys.modules:
    try:
        import aliby_tpu  # noqa: F401
    except ImportError:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
from tempfile import mkdtemp

import jax

# Some environments force-register an accelerator plugin at interpreter
# startup; env vars alone then lose. Honor the documented invocation.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import pyarrow.parquet as pq

from aliby_tpu.io.dataset import DatasetDir
from aliby_tpu.parallel.mesh import make_mesh
from aliby_tpu.parallel.pipeline_mesh import run_positions_mesh
from aliby_tpu.pipe_builder import build_pipeline_steps
from aliby_tpu.test_data import get_dataset, get_dataset_path

# 1. Discover positions -----------------------------------------------------
ENTRY = get_dataset("crop_cellpainting_256")
positions = DatasetDir(
    get_dataset_path(ENTRY["name"]),
    regex=ENTRY["regex"],
    capture_order=ENTRY["capture_order"],
).get_position_ids()
print(f"Discovered {len(positions)} positions: {[p['key'] for p in positions]}")

# 2. The standard pipeline (cellpose + default feature bank) ----------------
CHANNELS = ENTRY["channels"]
base_pipeline = build_pipeline_steps(
    channels_to_segment={"nuclei": CHANNELS["DNA"], "cell": CHANNELS["AGP"]},
    channels_to_extract=[CHANNELS["DNA"], CHANNELS["AGP"]],
    features_to_extract=("intensity", "sizeshape"),
    cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
)

# 3. One mesh over all local devices; dp = data-parallel over positions -----
mesh = make_mesh()
print(f"Mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

out_dir = Path(mkdtemp(prefix="aliby_mesh_"))
results = run_positions_mesh(
    base_pipeline,
    positions,
    out_dir,
    regex=ENTRY["regex"],
    capture_order=ENTRY["capture_order"],
    mesh=mesh,
    overwrite=True,
)

# 4. Inspect ------------------------------------------------------------------
for key in sorted(results):
    table = pq.read_table(out_dir / "profiles" / f"{key}.parquet")
    print(f"{key}: {table.num_rows} rows x {len(table.column_names)} columns")
print(f"Profiles under {out_dir}/profiles/")
