"""Public surface of the BABY pipeline flavour (parity with ``aliby.pipe_baby``)."""

from aliby_tpu.engine.pipe_baby import (
    _save_baby_tracking_lineage,
    init_step,
    run_pipeline_and_post,
)

__all__ = ["init_step", "run_pipeline_and_post", "_save_baby_tracking_lineage"]
