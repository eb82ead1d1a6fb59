"""Parity alias for ``aliby.global_settings`` (see utils/settings.py)."""

from aliby_tpu.utils.settings import (
    earlystop,
    fluorescence_functions,
    imaging_specifications,
    outline_functions,
    possible_imaging_channels,
)

__all__ = [
    "earlystop",
    "fluorescence_functions",
    "imaging_specifications",
    "outline_functions",
    "possible_imaging_channels",
]
