"""Public surface of the standard builder (parity with ``aliby.pipe_builder``)."""

from aliby_tpu.engine.builders import build_pipeline_steps

__all__ = ["build_pipeline_steps"]
