"""Compute ops: depth preprocessing, TSDF kernels, brick-sparse integration.

The TPU-native replacement for the reference's CUDA ops layer
(/root/reference/kfusion/src/cuda/{imgproc,tsdf_volume,proj_icp}.cu). Each op
is a pure jnp function designed to fuse under jit; the hot paths are shaped
for the MXU (one-hot/windowed matmuls instead of gathers — see
ops.bricks and solvers.warp_solver). Pallas was evaluated for the
gather-bound kernels but the toolchain's Mosaic lane-gather is
broken/emulated at useful widths (CLAUDE.md), so the MXU formulations win.
"""
