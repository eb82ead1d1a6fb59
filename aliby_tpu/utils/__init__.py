from aliby_tpu.utils.abc import ParametersABC, ProcessABC, StepABC
from aliby_tpu.utils.timer import timer

__all__ = ["ParametersABC", "ProcessABC", "StepABC", "timer"]
