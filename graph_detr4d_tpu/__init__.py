"""graph_detr4d_tpu — a TPU-native (JAX/XLA/Pallas) multi-camera 3D detection
framework with the capabilities of Graph-DETR4D (reference:
/root/reference, zehuichen123/Graph-DETR4D).

Built from scratch for TPU: static shapes everywhere, channels-last conv
layouts, fused multi-scale deformable sampling, pjit/shard_map data
parallelism over a device mesh, and bf16-friendly numerics.
"""

__version__ = "0.1.0"
