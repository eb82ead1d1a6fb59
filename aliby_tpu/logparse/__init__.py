from aliby_tpu.logparse.metadata import MetaData, parse_microscopy_logs
from aliby_tpu.logparse.swainlab import parse_swainlab_logs

__all__ = ["MetaData", "parse_microscopy_logs", "parse_swainlab_logs"]
