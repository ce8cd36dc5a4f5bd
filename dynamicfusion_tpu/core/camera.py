"""Pinhole projection / reprojection.

Functional equivalents of the reference's device ``Projector`` /
``Reprojector`` (/root/reference/kfusion/src/internal.hpp:51-65,
/root/reference/kfusion/src/precomp.cpp:42-61): project maps camera-space
points to pixel coordinates, backproject lifts (u, v, z) to camera space.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynamicfusion_tpu.config import Intrinsics

_EPS = 1e-12


def project(intr: Intrinsics, p: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points (..., 3) -> pixel coords (..., 2) as (u, v).

    u = x·fx/z + cx, v = y·fy/z + cy (Projector, precomp.cpp:44-49)."""
    z = p[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > _EPS, z, _EPS)
    u = p[..., 0] * intr.fx * inv_z + intr.cx
    v = p[..., 1] * intr.fy * inv_z + intr.cy
    return jnp.stack([u, v], axis=-1)


def backproject(intr: Intrinsics, u: jnp.ndarray, v: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Pixel (u, v) at depth z -> camera-space (..., 3)
    (Reprojector, precomp.cpp:55-61)."""
    x = z * (u - intr.cx) / intr.fx
    y = z * (v - intr.cy) / intr.fy
    return jnp.stack([x, y, z], axis=-1)


def pixel_grid(rows: int, cols: int, dtype=jnp.float32):
    """(u, v) coordinate grids of shape (rows, cols)."""
    v = jnp.arange(rows, dtype=dtype)[:, None] * jnp.ones((1, cols), dtype)
    u = jnp.ones((rows, 1), dtype) * jnp.arange(cols, dtype=dtype)[None, :]
    return u, v


def depth_to_points(intr: Intrinsics, depth_m: jnp.ndarray) -> jnp.ndarray:
    """Depth map (H, W) in meters -> camera-space point map (H, W, 3)."""
    rows, cols = depth_m.shape
    u, v = pixel_grid(rows, cols, depth_m.dtype)
    return backproject(intr, u, v, depth_m)


def ray_norms(intr: Intrinsics, rows: int, cols: int) -> jnp.ndarray:
    """Per-pixel ||K⁻¹ (u, v, 1)||: the factor converting z-depth to ray
    distance (compute_dists, /root/reference/kfusion/src/cuda/imgproc.cu:259-272)."""
    u, v = pixel_grid(rows, cols)
    xl = (u - intr.cx) / intr.fx
    yl = (v - intr.cy) / intr.fy
    return jnp.sqrt(xl * xl + yl * yl + 1.0)
