"""The canonical TSDF volume state.

TPU-native equivalent of the reference's ``cuda::TsdfVolume``
(/root/reference/kfusion/include/kfusion/cuda/tsdf_volume.hpp:11-100,
/root/reference/kfusion/src/tsdf_volume.cpp). Instead of a ref-counted GPU
blob of packed ``ushort2`` (half tsdf + ushort weight), the volume is two
dense ``(D, D, D)`` arrays indexed ``[x, y, z]`` — z is the innermost
(lane) axis. Packing into 16-bit is a storage option (bf16 tsdf / int16
weight) rather than a bit-twiddling scheme; XLA handles the layout.

Coordinate convention (identical to the reference): the volume frame has
voxel (0,0,0)'s *center* at the frame origin; voxel (i,j,k) sits at
``(i, j, k) * voxel_size``. The volume frame is placed in the world by a
translation ``volume_origin`` (the reference's volume_pose is also pure
translation, kinfu.cpp:27).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig


class TsdfVolume(NamedTuple):
    """tsdf in [-1, 1] (1 = free space in front of surface), weight >= 0.
    weight == 0 means never observed."""

    tsdf: jnp.ndarray    # (D, D, D) float32 (or bfloat16)
    weight: jnp.ndarray  # (D, D, D) float32


def create(cfg: DynamicFusionConfig) -> TsdfVolume:
    """Fresh volume, all zeros (clear_volume_kernel semantics,
    /root/reference/kfusion/src/cuda/tsdf_volume.cu:15-41)."""
    d = cfg.volume_dims
    dtype = jnp.bfloat16 if cfg.use_bf16_tsdf else jnp.float32
    return TsdfVolume(
        tsdf=jnp.zeros((d, d, d), dtype=dtype),
        weight=jnp.zeros((d, d, d), dtype=jnp.float32),
    )


def trunc_dist(cfg: DynamicFusionConfig) -> float:
    """Effective truncation distance: max(configured, 2.1 * voxel size)
    (TsdfVolume::setTruncDist, tsdf_volume.cpp:69-74)."""
    return max(cfg.tsdf_trunc_dist, 2.1 * cfg.voxel_size)


def origin(cfg: DynamicFusionConfig) -> jnp.ndarray:
    return jnp.asarray(cfg.volume_origin, dtype=jnp.float32)
