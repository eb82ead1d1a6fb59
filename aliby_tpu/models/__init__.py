from aliby_tpu.models.segment import dispatch_segmenter

__all__ = ["dispatch_segmenter"]
