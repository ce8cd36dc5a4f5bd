"""Synthetic depth scenes with analytic ground truth.

The reference validates end-to-end behavior visually on the VolumeDeform
"umbrella" sequence (download_data.sh:3-13), which cannot be fetched in this
environment; these scenes provide the same role with *known* geometry:
spheres and planes rendered analytically (exact z-depth), rigid camera
trajectories, and a smoothly deforming sphere for the non-rigid path.

All depth maps are uint16 millimeters, matching sensor convention.
"""

from __future__ import annotations

import numpy as np

from dynamicfusion_tpu.config import Intrinsics


def sphere_depth(
    intr: Intrinsics,
    rows: int,
    cols: int,
    center=(0.0, 0.0, 1.0),
    radius: float = 0.3,
    pose_w2c: np.ndarray | None = None,
) -> np.ndarray:
    """Exact z-depth of a sphere seen from the camera (optionally with the
    sphere given in world frame and a world->camera pose)."""
    c = np.asarray(center, np.float64)
    if pose_w2c is not None:
        c = pose_w2c[:3, :3] @ c + pose_w2c[:3, 3]
    u, v = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    dx = (u - intr.cx) / intr.fx
    dy = (v - intr.cy) / intr.fy
    # ray p = t*(dx, dy, 1); |p - c|^2 = r^2
    a = dx * dx + dy * dy + 1.0
    b = -2.0 * (dx * c[0] + dy * c[1] + c[2])
    cc = float(c @ c) - radius * radius
    disc = b * b - 4 * a * cc
    hit = disc >= 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    z = np.where(hit & (t > 0), t, 0.0)  # z-depth = t since dir z-component is 1
    return np.clip(z * 1000.0, 0, 65535).astype(np.uint16)


def plane_depth(rows: int, cols: int, z: float = 1.0) -> np.ndarray:
    return np.full((rows, cols), int(z * 1000), np.uint16)


def deforming_sphere_depth(
    intr: Intrinsics,
    rows: int,
    cols: int,
    t: float,
    center=(0.0, 0.0, 1.0),
    radius: float = 0.3,
    amp: float = 0.03,
) -> np.ndarray:
    """A sphere with a time-varying equatorial bulge — a smooth non-rigid
    deformation: r(θ, t) = r0 * (1 + amp * sin(t) * cos(2θ)). Rendered by
    sphere-marching the implicit surface (few iterations suffice)."""
    c = np.asarray(center, np.float64)
    u, v = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    dx = (u - intr.cx) / intr.fx
    dy = (v - intr.cy) / intr.fy
    d = np.stack([dx, dy, np.ones_like(dx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    def sdf(p):
        q = p - c
        rr = np.linalg.norm(q, axis=-1)
        cos_th = np.where(rr > 1e-9, q[..., 1] / np.maximum(rr, 1e-9), 0.0)
        # cos(2θ) with θ measured from the y axis
        bulge = 1.0 + amp * np.sin(t) * (2 * cos_th * cos_th - 1.0)
        return rr - radius * bulge

    tt = np.full(dx.shape, max(c[2] - radius * (1 + abs(amp)) - 0.05, 0.05))
    for _ in range(48):
        p = d * tt[..., None]
        tt = tt + sdf(p)
    p = d * tt[..., None]
    hit = np.abs(sdf(p)) < 1e-4
    z = np.where(hit, p[..., 2], 0.0)
    return np.clip(z * 1000.0, 0, 65535).astype(np.uint16)


def scene_depth(
    intr: Intrinsics,
    rows: int,
    cols: int,
    pose_c2w: np.ndarray | None = None,
    spheres=(),
    plane_z: float | None = None,
) -> np.ndarray:
    """Composite scene: union of spheres plus an optional world plane z =
    plane_z, rendered analytically from an arbitrary camera pose. Gives a
    well-conditioned geometry for 6-dof tracking tests (spheres alone are
    rotationally ambiguous for point-to-plane ICP)."""
    if pose_c2w is None:
        pose_c2w = np.eye(4)
    pose_c2w = np.asarray(pose_c2w, np.float64)
    r, pos = pose_c2w[:3, :3], pose_c2w[:3, 3]

    u, v = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    d_cam = np.stack([(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy, np.ones_like(u)], -1)
    d_w = d_cam @ r.T  # unnormalized; depth = t for p = pos + t*d_w

    z = np.full((rows, cols), np.inf)
    for sp in spheres:
        c = np.asarray(sp["center"], np.float64) - pos
        a = np.sum(d_w * d_w, axis=-1)
        b = -2.0 * (d_w @ c)
        cc = float(c @ c) - sp["radius"] ** 2
        disc = b * b - 4 * a * cc
        t = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), np.inf)
        t = np.where(t > 0, t, np.inf)
        z = np.minimum(z, t)
    if plane_z is not None:
        t = (plane_z - pos[2]) / np.where(np.abs(d_w[..., 2]) > 1e-12, d_w[..., 2], 1e-12)
        t = np.where(t > 0, t, np.inf)
        z = np.minimum(z, t)
    z = np.where(np.isfinite(z), z, 0.0)
    return np.clip(z * 1000.0, 0, 65535).astype(np.uint16)


def orbit_pose(angle: float, target=(0.0, 0.0, 1.0), dist: float | None = None) -> np.ndarray:
    """Camera-to-world pose orbiting `target` about the world y axis, always
    looking at the target. angle=0 gives the identity pose if the camera
    starts at the origin looking down +z with dist = |target|."""
    tgt = np.asarray(target, np.float64)
    if dist is None:
        dist = float(np.linalg.norm(tgt))
    # camera position on the orbit
    pos = tgt + dist * np.array([np.sin(angle), 0.0, -np.cos(angle)])
    fwd = tgt - pos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # camera y points down (image v grows down)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)  # = camera y axis (down) in world coords
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up2, fwd, pos
    return m.astype(np.float32)
