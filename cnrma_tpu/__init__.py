"""CN-RMA TPU: a TPU-native (JAX/XLA/Pallas) multi-view indoor 3D detection framework.

Re-implements the capabilities of SerCharles/CN-RMA (CVPR 2024) — multi-view
RGB -> TSDF reconstruction -> ray-marching feature aggregation -> sparse-conv
anchor-free 3D detection — as an idiomatic JAX framework designed for TPU:
static shapes, gather-based kernels, MXU-friendly sparse convolution, and
`jax.sharding` data/view parallelism instead of NCCL DDP.
"""

__version__ = "0.1.0"
