"""Test session config: CPU JAX with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh — SURVEY.md §4's 'multi-device tests runnable on
CPU via device-count backdoors')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin; env vars alone do
# not win. The config update does.
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for the suite. It was tried (it saves
# minutes of scatter-heavy CPU recompiles on re-runs) and removed twice
# over, with evidence:
#   1. jaxlib's cache WRITE path crashed the full suite (SIGSEGV in
#      put_executable_and_time serializing a giant movie-mode executable
#      — the round-3 "195/209 then exit 139").
#   2. Worse, a cache HIT is not numerically hermetic: XLA:CPU
#      deserializes through cpu_aot_loader with DIFFERENT codegen
#      (target features +prefer-no-scatter/+prefer-no-gather) than the
#      in-memory JIT path, so a cached run computes slightly different
#      floats than a cold run — observed here as the CPnet forward
#      producing a different flow field and the dynamics-parity gates
#      flipping between pass (cold) and fail (warm). Machine-keyed cache
#      directories cannot fix that: the writer and the reader are the
#      SAME host.
# Cold-compile cost is the price of a suite whose numbers mean the same
# thing on every run.

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    from aliby_tpu.test_data import get_data_root

    return get_data_root()
