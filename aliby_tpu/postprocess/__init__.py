from aliby_tpu.postprocess.cells import Cells
from aliby_tpu.postprocess.signal import Signal

__all__ = ["Cells", "Signal"]
