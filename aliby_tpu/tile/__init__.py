from aliby_tpu.tile.tiler import CropTiler, Tiler, TilerParameters, dispatch_tiler

__all__ = ["CropTiler", "Tiler", "TilerParameters", "dispatch_tiler"]
