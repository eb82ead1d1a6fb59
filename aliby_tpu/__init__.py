"""aliby-tpu: TPU-native end-to-end microscopy processing engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``aliby`` pipeline (dataset discovery -> lazy TCZYX -> tiling -> segmentation ->
tracking -> feature extraction -> Parquet profiles). See ARCHITECTURE.md.
"""

__version__ = "0.1.0"
