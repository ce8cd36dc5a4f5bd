"""Depth-frame preprocessing: bilateral filter, pyramids, point/normal maps.

TPU-native equivalents of the reference's image-processing CUDA kernels
(/root/reference/kfusion/src/cuda/imgproc.cu). Stencil windows are expressed
as static sets of shifted images so XLA fuses the whole op into one
elementwise pass over the frame (VPU-friendly, no gather).

Conventions (identical to the reference):
- raw depth: (H, W) uint16 millimeters, 0 = missing
- "dists":   (H, W) float32 meters, per-pixel ray distance = z * ||K^-1 u||
- point/normal maps: (H, W, 3) float32 camera-space meters, NaN = invalid
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import camera

NAN = jnp.nan


def _shift(img: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Image shifted so out[y, x] = img[y+dy, x+dx], border filled."""
    h, w = img.shape[:2]
    pad = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [
        (0, 0)
    ] * (img.ndim - 2)
    padded = jnp.pad(img, pad, constant_values=fill)
    return jax.lax.slice(
        padded,
        [max(dy, 0), max(dx, 0)] + [0] * (img.ndim - 2),
        [max(dy, 0) + h, max(dx, 0) + w] + list(img.shape[2:]),
    )


def bilateral_filter(
    depth_mm: jnp.ndarray,
    kernel_size: int = 7,
    sigma_spatial: float = 4.5,
    sigma_depth_m: float = 0.04,
) -> jnp.ndarray:
    """Edge-preserving bilateral filter on a uint16-mm depth map.

    Matches ``bilateral_kernel`` (imgproc.cu:11-57): weights
    exp(-(Δpx² / 2σ_s² + Δmm² / 2σ_d²)), window clamped to the image,
    output rounded to integer mm. σ_depth is given in meters and converted
    to mm like the host wrapper (imgproc.cu:47)."""
    d = depth_mm.astype(jnp.float32)
    sigma_depth_mm = sigma_depth_m * 1000.0
    inv_sp = 0.5 / (sigma_spatial * sigma_spatial)
    inv_sd = 0.5 / (sigma_depth_mm * sigma_depth_mm)
    half = kernel_size // 2

    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    h, w = d.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    for dy in range(-half, half + 1):
        for dx in range(-half, half + 1):
            nbr = _shift(d, dy, dx, 0.0)
            inb = (
                (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
            )
            space2 = float(dy * dy + dx * dx)
            color2 = (d - nbr) ** 2
            wgt = jnp.exp(-(space2 * inv_sp + color2 * inv_sd)) * inb
            num = num + nbr * wgt
            den = den + wgt
    out = jnp.round(num / jnp.maximum(den, 1e-12))
    return out.astype(depth_mm.dtype)


def truncate_depth(depth_mm: jnp.ndarray, max_dist_m: float) -> jnp.ndarray:
    """Zero out depth beyond max_dist meters (truncate_depth_kernel,
    imgproc.cu:66-85)."""
    return jnp.where(
        depth_mm.astype(jnp.float32) > max_dist_m * 1000.0,
        jnp.zeros_like(depth_mm),
        depth_mm,
    )


def depth_pyramid_down(depth_mm: jnp.ndarray, sigma_depth_m: float = 0.04) -> jnp.ndarray:
    """Depth-aware 2x downsample: mean of the 5x5 window around (2y, 2x)
    over values within 3σ of the center (pyramid_kernel, imgproc.cu:94-136).

    TPU note (round 4): the window sums are accumulated at FULL resolution
    with contiguous pad+slice shifts and subsampled ONCE at the end.
    Subsampling each of the 25 taps instead (`nbr_full[::2, ::2]`) lowers
    every tap to a stride-2 gather — measured 0.78 ms EACH at 640x480
    (~19 ms/frame across the pyramid, the single largest hidden cost in
    the frame; the isolated-phase profiler missed it because its probe let
    XLA dead-code the deeper pyramid levels). The full-res formulation is
    25 fused elementwise taps (VPU) + one strided extract."""
    d = depth_mm.astype(jnp.float32)
    h, w = d.shape
    oh, ow = h // 2, w // 2
    thresh = sigma_depth_m * 1000.0 * 3.0

    s = jnp.zeros((h, w), jnp.float32)
    cnt = jnp.zeros((h, w), jnp.float32)
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nbr = _shift(d, dy, dx, 0.0)
            inb = (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
            keep = (jnp.abs(nbr - d) < thresh) & inb
            s = s + jnp.where(keep, nbr, 0.0)
            cnt = cnt + keep
    out = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)
    out = jax.lax.slice(out, (0, 0), (2 * oh, 2 * ow), (2, 2))
    return out.astype(depth_mm.dtype)


def compute_points_normals(
    intr: Intrinsics, depth_mm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vertex map + forward-difference normal map from a depth image.

    Matches ``points_normals_kernel`` (imgproc.cu:210-250): v00/v01/v10 from
    right and down neighbors, n = -normalize((v01-v00) x (v10-v00)); a pixel
    is valid only if all three depths are nonzero (NaN otherwise)."""
    z00 = depth_mm.astype(jnp.float32) * 0.001
    z01 = _shift(z00, 0, 1, 0.0)
    z10 = _shift(z00, 1, 0, 0.0)

    h, w = z00.shape
    u, v = camera.pixel_grid(h, w)
    v00 = camera.backproject(intr, u, v, z00)
    v01 = camera.backproject(intr, u + 1.0, v, z01)
    v10 = camera.backproject(intr, u, v + 1.0, z10)

    n = jnp.cross(v01 - v00, v10 - v00)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = -n

    valid = (z00 * z01 * z10) != 0.0
    # last row/col have no forward neighbor (points_normals_kernel early-out)
    valid = valid & (u < w - 1) & (v < h - 1)
    points = jnp.where(valid[..., None], v00, NAN)
    normals = jnp.where(valid[..., None], n, NAN)
    return points, normals


def compute_normals_and_mask_depth(
    intr: Intrinsics, depth_mm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's USE_DEPTH preprocessing variant
    (computeNormalsAndMaskDepth, imgproc.cu:145-202): normal map from depth
    plus the depth image with normal-invalid pixels zeroed."""
    _, normals = compute_points_normals(intr, depth_mm)
    masked = jnp.where(jnp.isnan(normals[..., 0]), jnp.zeros_like(depth_mm), depth_mm)
    return masked, normals


def compute_dists(intr: Intrinsics, depth_mm: jnp.ndarray) -> jnp.ndarray:
    """z-depth (mm) -> ray distance (meters): d = z * ||K^-1 (u,v,1)||
    (compute_dists_kernel, imgproc.cu:259-272)."""
    lam = camera.ray_norms(intr, *depth_mm.shape)
    return depth_mm.astype(jnp.float32) * lam * 0.001


def resize_points_normals(
    points: jnp.ndarray, normals: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x downsample of point+normal maps: 2x2 block average, valid only if
    all four points are valid (resize_points_normals_kernel,
    imgproc.cu:366-414). Normals are NOT renormalized (matches reference)."""
    h, w = points.shape[:2]
    oh, ow = h // 2, w // 2
    p = points[: 2 * oh, : 2 * ow].reshape(oh, 2, ow, 2, 3)
    n = normals[: 2 * oh, : 2 * ow].reshape(oh, 2, ow, 2, 3)
    p_avg = p.mean(axis=(1, 3))
    n_avg = n.mean(axis=(1, 3))
    valid = ~jnp.isnan(p[..., 0]).any(axis=(1, 3))
    return (
        jnp.where(valid[..., None], p_avg, NAN),
        jnp.where(valid[..., None], n_avg, NAN),
    )


def cloud_to_depth(points: jnp.ndarray) -> jnp.ndarray:
    """Point map -> uint16 mm depth (cloud_to_depth_kernel, imgproc.cu:274-283)."""
    z = jnp.nan_to_num(points[..., 2], nan=0.0)
    return jnp.clip(z * 1000.0, 0, 65535).astype(jnp.uint16)


def build_frame_pyramid(
    cfg: DynamicFusionConfig, depth_mm: jnp.ndarray
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray], jnp.ndarray]:
    """The full per-frame preprocessing pass (KinFu::operator() prologue,
    /root/reference/kfusion/src/kinfu.cpp:221-242): dists, bilateral filter,
    depth pyramid, and per-level point/normal maps.

    Returns (depth_pyr, points_pyr, normals_pyr, dists)."""
    dists = compute_dists(cfg.intr, depth_mm)
    d0 = bilateral_filter(
        depth_mm,
        cfg.bilateral_kernel_size,
        cfg.bilateral_sigma_spatial,
        cfg.bilateral_sigma_depth,
    )
    if cfg.icp_truncate_depth_dist > 0:
        d0 = truncate_depth(d0, cfg.icp_truncate_depth_dist)

    depth_pyr = [d0]
    for _ in range(1, cfg.pyramid_levels):
        depth_pyr.append(depth_pyramid_down(depth_pyr[-1], cfg.bilateral_sigma_depth))

    points_pyr, normals_pyr = [], []
    for lvl, d in enumerate(depth_pyr):
        p, n = compute_points_normals(cfg.intr.level(lvl), d)
        points_pyr.append(p)
        normals_pyr.append(n)
    return depth_pyr, points_pyr, normals_pyr, dists
