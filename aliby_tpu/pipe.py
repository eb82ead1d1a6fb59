"""Public surface of the standard pipeline flavour (parity with
``aliby.pipe``)."""

from aliby_tpu.engine.pipe import init_step, run_pipeline_and_post

__all__ = ["init_step", "run_pipeline_and_post"]
