"""Parity alias for ``aliby.global_steps`` (see engine/global_steps.py)."""

from aliby_tpu.engine.global_steps import dispatch_global_step

__all__ = ["dispatch_global_step"]
