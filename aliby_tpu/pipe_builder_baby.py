"""Public surface of the BABY builder (parity with ``aliby.pipe_builder_baby``)."""

from aliby_tpu.engine.builders_baby import build_pipeline_steps

__all__ = ["build_pipeline_steps"]
