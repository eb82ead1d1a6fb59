"""Multi-position execution: the reference's process fan-out, device-aware.

The reference forks a loky worker per position (``examples/01:141-144``) —
each re-imports torch, re-loads models, and owns one GPU by round-robin.
Here positions run as threads in ONE process sharing the already-compiled
jitted kernels; each worker pins its device with ``jax.default_device``
(round-robin over the local mesh — the on-slice analogue of the nahual
address round-robin). IO (TIFF/zarr decode) overlaps across threads while
the device queue serializes compute, so a single chip stays saturated and
multi-chip hosts scale linearly.
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import ThreadPoolExecutor, as_completed
from copy import deepcopy
from pathlib import Path
from typing import Callable, Sequence

import jax

logger = logging.getLogger("aliby_tpu")


def stamp_image_kwargs(
    pipeline: dict,
    position: dict,
    regex: str | None = None,
    capture_order: str | None = None,
) -> dict:
    """Deep-copy + stamp the per-position image source (the mutation
    contract callers of the reference rely on, SURVEY §5.6 hard part e)."""
    stamped = deepcopy(pipeline)
    image_kwargs: dict = {
        "source": {"key": position["key"], "path": position["path"]}
    }
    if regex is not None:
        image_kwargs["regex"] = regex
    if capture_order is not None:
        image_kwargs["capture_order"] = capture_order
    stamped["steps"]["tile"]["image_kwargs"] = image_kwargs
    stamped["io"] = {
        "input_path": {"key": position["key"], "path": position["path"]},
        "capture_order": capture_order,
    }
    return stamped


def run_positions(
    base_pipeline: dict,
    positions: Sequence[dict],
    output_path: str | Path,
    regex: str | None = None,
    capture_order: str | None = None,
    n_workers: int = 4,
    overwrite: bool = False,
    flavor: str = "standard",
    run_fn: Callable | None = None,
    devices: Sequence | None = None,
) -> dict[str, tuple]:
    """Run every position; returns {position_key: (profiles, post)}."""
    if run_fn is None:
        if flavor == "baby":
            from aliby_tpu.pipe_baby import run_pipeline_and_post as run_fn
        else:
            from aliby_tpu.pipe import run_pipeline_and_post as run_fn
    devices = list(devices if devices is not None else jax.devices())
    output_path = Path(output_path)
    results: dict[str, tuple] = {}
    lock = threading.Lock()

    def one(i: int, position: dict):
        pipeline = stamp_image_kwargs(
            base_pipeline, position, regex=regex, capture_order=capture_order
        )
        device = devices[i % len(devices)]
        with jax.default_device(device):
            out = run_fn(
                pipeline=pipeline,
                pipeline_name=position["key"],
                output_path=output_path,
                overwrite=overwrite,
            )
        with lock:
            results[position["key"]] = out
        return position["key"]

    if n_workers <= 1:
        for i, pos in enumerate(positions):
            one(i, pos)
        return results

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futures = {
            pool.submit(one, i, pos): pos["key"]
            for i, pos in enumerate(positions)
        }
        for fut in as_completed(futures):
            key = futures[fut]
            try:
                fut.result()
                logger.info("Position %s done", key)
            except Exception:
                logger.exception("Position %s failed", key)
                raise
    return results
