"""Rendering: Phong-shaded model view and normal tangent colors.

Equivalent of the reference's render kernels
(/root/reference/kfusion/src/cuda/imgproc.cu:420-583) and
``KinFu::renderImage`` modes (/root/reference/kfusion/src/kinfu.cpp:312-337):
mode 0 = Phong shade, 2 = normal RGB, 3 = side-by-side both.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig


def phong(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    light_pose,
) -> jnp.ndarray:
    """(H, W, 3) uint8 Phong-shaded image from camera-frame point/normal
    maps (render_image_kernel, imgproc.cu:497-546; Ka=0.3, Kd=0.5, Ks=0.2,
    n=20, background = vertical gradient)."""
    h, w = points.shape[:2]
    valid = ~jnp.isnan(points[..., 0])
    p = jnp.nan_to_num(points)
    n = jnp.nan_to_num(normals)

    light = jnp.asarray(light_pose, jnp.float32)
    l = light - p
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
    v = -p
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    ndl = jnp.sum(n * l, axis=-1)
    r = 2.0 * n * ndl[..., None] - l
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)

    ka, kd, ks, spec_n = 0.3, 0.5, 0.2, 20.0
    ix = (
        ka
        + kd * jnp.maximum(0.0, ndl)
        + ks * jnp.maximum(0.0, jnp.sum(r * v, axis=-1)) ** spec_n
    )
    shaded = jnp.clip(ix, 0.0, 1.0)[..., None] * jnp.ones((1, 1, 3))

    # background: vertical gradient between the reference's two BGR colors
    wgt = (jnp.arange(h, dtype=jnp.float32) / h)[:, None, None]
    bg1 = jnp.asarray([4.0, 2.0, 2.0]) / 255.0
    bg2 = jnp.asarray([236.0, 120.0, 120.0]) / 255.0
    bg = bg1 * (1 - wgt) + bg2 * wgt
    bg = jnp.broadcast_to(bg, (h, w, 3))

    out = jnp.where(valid[..., None], shaded, bg)
    return (out * 255.0).astype(jnp.uint8)


def tangent_colors(normals: jnp.ndarray) -> jnp.ndarray:
    """Normal map -> RGB (tangent_colors_kernel, imgproc.cu:552-583):
    color = (n + 1) / 2, black where invalid."""
    valid = ~jnp.isnan(normals[..., 0])
    c = (jnp.nan_to_num(normals) * 0.5 + 0.5) * valid[..., None]
    return (jnp.clip(c, 0, 1) * 255.0).astype(jnp.uint8)


def render_maps(cfg: DynamicFusionConfig, pts, nrm, mode: int = 0) -> jnp.ndarray:
    if mode == 2:
        return tangent_colors(nrm)
    img = phong(pts, nrm, cfg.light_pose)
    if mode == 3:
        return jnp.concatenate([img, tangent_colors(nrm)], axis=1)
    return img


def overlay_nodes(
    cfg: DynamicFusionConfig,
    img,
    state,
    pose=None,
    color=(255, 64, 32),
    size: int = 1,
):
    """Draw the warp-field's LIVE node positions over a rendered image —
    the reference's `show_warp` deformation-graph view
    (/root/reference/apps/demo.cpp:65,108-114, rendering
    WarpField::getNodesAsMat). Returns a uint8 numpy copy of ``img`` with a
    (2*size+1)^2 dot per visible active node (projected with ``pose``,
    default = the state's current camera pose). Works on the mode-3
    side-by-side render too (nodes land on the left/Phong panel)."""
    import numpy as np

    from dynamicfusion_tpu.core import se3
    from dynamicfusion_tpu.models import warpfield as wf

    out = np.array(img, dtype=np.uint8, copy=True)
    if pose is None:
        pose = state.pose
    live = wf.live_node_positions(state.warp)
    cam = se3.transform_points(se3.inverse(jnp.asarray(pose)), live)
    cam = np.asarray(cam)
    active = np.asarray(state.warp.active)

    z = cam[:, 2]
    ok = active & (z > 1e-3)
    u = cfg.intr.fx * cam[:, 0] / np.where(ok, z, 1.0) + cfg.intr.cx
    v = cfg.intr.fy * cam[:, 1] / np.where(ok, z, 1.0) + cfg.intr.cy
    h, w = out.shape[0], min(out.shape[1], cfg.cols)  # left panel for mode 3
    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    ok &= (ui >= size) & (ui < w - size) & (vi >= size) & (vi < h - size)
    col = np.asarray(color, np.uint8)
    for du in range(-size, size + 1):
        for dv in range(-size, size + 1):
            out[vi[ok] + dv, ui[ok] + du] = col
    return out


def render_state(cfg: DynamicFusionConfig, state, mode: int = 0) -> jnp.ndarray:
    """Render from the last model raycast (KinFu::renderImage semantics —
    full-resolution output; the model maps live at 1/raycast_subsample
    resolution and are pixel-replicated up)."""
    s = cfg.raycast_subsample
    pts, nrm = state.prev_points[0], state.prev_normals[0]
    if s > 1:
        pts = jnp.repeat(jnp.repeat(pts, s, axis=0), s, axis=1)
        nrm = jnp.repeat(jnp.repeat(nrm, s, axis=0), s, axis=1)
    return render_maps(cfg, pts, nrm, mode)
