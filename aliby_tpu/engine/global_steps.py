"""Global (post-run, whole-movie) step dispatch.

Parity surface for the reference's ``aliby/global_steps.py:34-42``
(``dispatch_global_step``): global steps consume the full per-tp stack
fetched by ``get_step_output`` and return a pyarrow table. The in-process
``track_global`` linker replaces the remote trackastra hop for on-slice
runs; ``nahual_*`` names keep the remote client path.
"""

from __future__ import annotations

import numpy as np


def dispatch_global_step(name: str, **params):
    if name.startswith("nahual_"):
        from aliby_tpu.net.client import make_remote_global_step

        return make_remote_global_step(
            name.removeprefix("nahual_"),
            address=params.get("address"),
            parameters=params.get("parameters"),
        )
    if name.startswith("track_global") or name == "trackastra":
        from aliby_tpu.track.linker import link_tracks

        def process(stacked, **_):
            # get_step_output emits (n_fetchers, T, F, Y, X); tolerate bare
            # (T, F, Y, X) / legacy (T, Y, X) from callable fetchers
            stacked = np.asarray(stacked)
            if stacked.ndim == 5:
                stacked = stacked[0]
            masks_t = stacked  # (T, F, Y, X) or (T, Y, X) — linker handles both
            return link_tracks(masks_t, **(params.get("parameters") or {}))

        return process
    raise ValueError(f"Unknown global step {name!r}")
