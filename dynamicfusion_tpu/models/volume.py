"""The canonical TSDF volume state.

TPU-native equivalent of the reference's ``cuda::TsdfVolume``
(/root/reference/kfusion/include/kfusion/cuda/tsdf_volume.hpp:11-100,
/root/reference/kfusion/src/tsdf_volume.cpp). The reference packs each
voxel as ``ushort2`` (half tsdf + ushort weight, 4 B/voxel,
tsdf_volume.cu:53-61); here the packing is two dense ``(D, D, D)`` arrays
indexed ``[x, y, z]`` (z innermost/lane axis) whose dtypes are config
knobs:

- tsdf: ``i16`` fixed-point (1/32767 — a 15-bit mantissa everywhere in
  [-1, 1], far above the trilinear-crossing precision bf16 lacked; the
  round-4 bf16 experiment measured p95 2.66 -> 5.13 mm and was rejected),
  ``f32``, or ``bf16`` (kept for the record).
- weight: ``u16`` fixed-point (1/512 — the weight is a bounded counter,
  max tsdf_max_weight=64 x quality <= 1, so 512ths are exact for its use),
  or ``f32``.

i16+u16 is 4 B/voxel — reference parity (134 -> 67 MB at 256^3), which is
what multi-chip capacity scaling is for (SCALING.md). All arithmetic runs
in f32; encode/decode happens at the store/gather boundary (the decode
multiply fuses into the gather's consumer).

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

# fixed-point scales for the 16-bit storage dtypes
TSDF_SCALE = 32767.0   # i16 in [-1, 1]
WEIGHT_SCALE = 512.0   # u16 counter in [0, 127]

_TSDF_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i16": jnp.int16}
_WEIGHT_DTYPES = {"f32": jnp.float32, "u16": jnp.uint16}


class TsdfVolume(NamedTuple):
    """tsdf in [-1, 1] (1 = free space in front of surface), weight >= 0
    — both possibly stored encoded (see decode_tsdf / decode_weight);
    weight == 0 means never observed (invariant under every encoding)."""

    tsdf: jnp.ndarray    # (D, D, D) float32 | bfloat16 | int16 (x 32767)
    weight: jnp.ndarray  # (D, D, D) float32 | uint16 (x 512)


def create(cfg: DynamicFusionConfig) -> TsdfVolume:
    """Fresh volume, all zeros (clear_volume_kernel semantics,
    /root/reference/kfusion/src/cuda/tsdf_volume.cu:15-41)."""
    d = cfg.volume_dims
    return TsdfVolume(
        tsdf=jnp.zeros((d, d, d), dtype=_TSDF_DTYPES[cfg.tsdf_dtype]),
        weight=jnp.zeros((d, d, d), dtype=_WEIGHT_DTYPES[cfg.weight_dtype]),
    )


def tsdf_decode_scale(dtype) -> float:
    """Factor that turns stored tsdf values into f32 metric tsdf — apply
    AFTER a gather (so 16-bit arrays are gathered at 2 B/elem and the
    multiply fuses into the consumer)."""
    return 1.0 / TSDF_SCALE if dtype == jnp.int16 else 1.0


def decode_tsdf(a: jnp.ndarray) -> jnp.ndarray:
    return a.astype(jnp.float32) * tsdf_decode_scale(a.dtype)


def encode_tsdf(x: jnp.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.int16:
        return jnp.round(jnp.clip(x, -1.0, 1.0) * TSDF_SCALE).astype(jnp.int16)
    return x.astype(dtype)


def decode_weight(a: jnp.ndarray) -> jnp.ndarray:
    if a.dtype == jnp.uint16:
        return a.astype(jnp.float32) * (1.0 / WEIGHT_SCALE)
    return a.astype(jnp.float32)


def encode_weight(x: jnp.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.uint16:
        return jnp.round(
            jnp.clip(x, 0.0, 65535.0 / WEIGHT_SCALE) * WEIGHT_SCALE
        ).astype(jnp.uint16)
    return x.astype(dtype)


def convert(vol: TsdfVolume, cfg: DynamicFusionConfig) -> TsdfVolume:
    """Re-encode a volume to the config's storage dtypes (checkpoint
    migration across dtype settings)."""
    return TsdfVolume(
        tsdf=encode_tsdf(decode_tsdf(vol.tsdf), _TSDF_DTYPES[cfg.tsdf_dtype]),
        weight=encode_weight(
            decode_weight(vol.weight), _WEIGHT_DTYPES[cfg.weight_dtype]
        ),
    )


def trunc_dist(cfg: DynamicFusionConfig) -> float:
    """Effective truncation distance: max(configured, 2.1 * voxel size)
    (TsdfVolume::setTruncDist, tsdf_volume.cpp:69-74)."""
    return max(cfg.tsdf_trunc_dist, 2.1 * cfg.voxel_size)


def origin(cfg: DynamicFusionConfig) -> jnp.ndarray:
    return jnp.asarray(cfg.volume_origin, dtype=jnp.float32)
