"""Compute ops: depth preprocessing, TSDF kernels, rendering, Pallas kernels.

The TPU-native replacement for the reference's CUDA ops layer
(/root/reference/kfusion/src/cuda/{imgproc,tsdf_volume,proj_icp}.cu). Each op
is a pure jnp function designed to fuse under jit; Pallas variants of the
hot ops live in ``ops.pallas_kernels``.
"""
