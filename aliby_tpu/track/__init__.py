from aliby_tpu.track.dispatch import dispatch_tracker

__all__ = ["dispatch_tracker"]
