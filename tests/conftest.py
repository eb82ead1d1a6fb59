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

# Persistent compilation cache: the scatter-heavy kernels (EDT, flows,
# segment sums) take minutes to compile on the CPU backend; cache across
# test sessions so only the first run pays.
_cache_dir = Path.home() / ".cache" / "aliby_tpu" / "jax_cache"
_cache_dir.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    from aliby_tpu.test_data import get_data_root

    return get_data_root()
