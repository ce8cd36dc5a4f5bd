"""dynamicfusion_tpu — a TPU-native DynamicFusion framework.

A from-scratch JAX/XLA/Pallas implementation of real-time non-rigid 3D
reconstruction (Newcombe et al., CVPR 2015), with the capability surface of
the reference C++/CUDA implementation (mihaibujanca/dynamicfusion) but an
architecture designed for TPU hardware:

- all per-frame compute is a single jitted step (no host round-trips),
- the TSDF volume, depth pyramids and warp field are plain JAX arrays,
- the non-rigid warp-field estimation is a matrix-free Gauss-Newton/LM
  solver with PCG inner iterations (replacing Ceres and Opt/Terra),
- multi-chip scaling uses `jax.sharding`/`shard_map` over a device Mesh.

Package layout:
- ``core``      pure geometry math (quaternions, dual quaternions, SE(3), camera)
- ``ops``       image/volume compute ops (preprocessing, TSDF kernels, Pallas)
- ``models``    stateful model containers (TSDF volume, warp field)
- ``solvers``   rigid projective ICP and the non-rigid GN/LM warp solver
- ``pipeline``  the per-frame DynamicFusion pipeline (KinFu equivalent)
- ``io``        dataset loading (PNG depth sequences, synthetic scenes)
- ``parallel``  device-mesh sharding of volume/pixels/nodes
- ``utils``     metrics, checkpointing
"""

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics

__version__ = "0.1.0"

__all__ = ["DynamicFusionConfig", "Intrinsics", "__version__"]
