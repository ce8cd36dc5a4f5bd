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


def bulge_depth(
    intr: Intrinsics,
    rows: int,
    cols: int,
    t: float,
    plane_z: float = 1.1,
    amp: float = 0.08,
    sigma: float = 0.06,
    x0: float = -0.1,
    speed: float = 0.01,
) -> np.ndarray:
    """A plane at ``plane_z`` with a Gaussian bulge (height ``amp``, width
    ``sigma``) whose center TRAVELS along x at ``speed`` m/frame — a
    second held-out deformation family (round 4): the bulge's motion is
    largely tangential to the surface it rides on. Heightfield rendered
    by fixed-point iteration along each ray (the map z -> z_s(z*dx, z*dy)
    is a contraction for amp/sigma * |dx| < 1)."""
    u, v = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    dx = (u - intr.cx) / intr.fx
    dy = (v - intr.cy) / intr.fy
    xc = x0 + speed * t

    def z_surf(x, y):
        return plane_z - amp * np.exp(-((x - xc) ** 2 + y * y) / (2.0 * sigma * sigma))

    z = np.full(dx.shape, plane_z)
    for _ in range(16):
        z = z_surf(z * dx, z * dy)
    return np.clip(z * 1000.0, 0, 65535).astype(np.uint16)


def bulge_surface_error_m(points: np.ndarray, plane_z=1.1, amp=0.08, sigma=0.06, x0=-0.1):
    """Distance (m) of world points to the analytic t=0 bulge surface
    (normal-projected vertical distance of the heightfield)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    g = np.exp(-((x - x0) ** 2 + y * y) / (2.0 * sigma * sigma))
    zs = plane_z - amp * g
    gx = amp * g * (x - x0) / (sigma * sigma)
    gy = amp * g * y / (sigma * sigma)
    return np.abs(z - zs) / np.sqrt(1.0 + gx * gx + gy * gy)


def bulge_surface_samples(m: int = 1600, plane_z=1.1, amp=0.08, sigma=0.06, x0=-0.1):
    """Ground-truth samples of the t=0 bulge region (within 2.5 sigma of
    the center) with per-sample |cos incidence| vs the camera-at-origin
    view ray — support for the surface-coverage metric."""
    g = int(np.sqrt(m))
    ax = np.linspace(-2.5 * sigma, 2.5 * sigma, g)
    xx, yy = np.meshgrid(x0 + ax, ax)
    x, y = xx.ravel(), yy.ravel()
    gs = np.exp(-((x - x0) ** 2 + y * y) / (2.0 * sigma * sigma))
    z = plane_z - amp * gs
    gx = amp * gs * (x - x0) / (sigma * sigma)
    gy = amp * gs * y / (sigma * sigma)
    n = np.stack([-gx, -gy, -np.ones_like(gx)], -1)  # upward-facing (toward camera)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    p = np.stack([x, y, z], -1)
    d = p / np.linalg.norm(p, axis=-1, keepdims=True)
    cos_inc = np.abs(np.sum(n * d, axis=-1))
    return p, cos_inc


CLOTH = dict(z0=1.0, x0=-0.25, x1=0.25, y0=-0.2, y1=0.2,
             amp=0.015, lam=0.3, speed=0.012, tilt=0.15, omega=0.25)


def cloth_height(x, y, t, p=CLOTH):
    """Heightfield of the cloth-like HELD-OUT scene at time t: a finite
    sheet hinged at x = x0 (articulated tilt about that edge, angle
    tilt*sin(omega*t)) carrying a ripple TRAVELING along y — the
    articulated+wave composite of VERDICT r4 #8. Returns (z, inside)."""
    th = p["tilt"] * np.sin(p["omega"] * t)
    ripple = p["amp"] * np.sin(2.0 * np.pi * (y - p["speed"] * t) / p["lam"])
    z = p["z0"] + (x - p["x0"]) * np.tan(th) + ripple
    inside = (x >= p["x0"]) & (x <= p["x1"]) & (y >= p["y0"]) & (y <= p["y1"])
    return z, inside


def cloth_depth(
    intr: Intrinsics,
    rows: int,
    cols: int,
    t: float,
    bg_z: float = 1.35,
) -> np.ndarray:
    """Depth render of the cloth scene over a background plane at bg_z.
    Heightfield rendered by fixed-point iteration along each ray (max
    surface slope * max |dx| stays well under 1)."""
    u, v = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    dx = (u - intr.cx) / intr.fx
    dy = (v - intr.cy) / intr.fy
    z = np.full(dx.shape, CLOTH["z0"])
    for _ in range(24):
        zs, _ = cloth_height(z * dx, z * dy, t)
        z = zs
    _, inside = cloth_height(z * dx, z * dy, t)
    return np.clip(np.where(inside, z, bg_z) * 1000.0, 0, 65535).astype(np.uint16)


def cloth_surface_error_m(points: np.ndarray) -> np.ndarray:
    """Distance (m) of world points to the analytic t=0 cloth surface
    (normal-projected vertical distance)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    zs, _ = cloth_height(x, y, 0.0)
    gy = CLOTH["amp"] * (2.0 * np.pi / CLOTH["lam"]) * np.cos(
        2.0 * np.pi * y / CLOTH["lam"]
    )
    return np.abs(z - zs) / np.sqrt(1.0 + gy * gy)


def cloth_surface_samples(m: int = 1600):
    """Ground-truth samples of the t=0 cloth sheet (margin inside the
    edges) with |cos incidence| vs the camera-at-origin ray."""
    p = CLOTH
    g = int(np.sqrt(m))
    mx = 0.02
    xs = np.linspace(p["x0"] + mx, p["x1"] - mx, g)
    ys = np.linspace(p["y0"] + mx, p["y1"] - mx, g)
    xx, yy = np.meshgrid(xs, ys)
    x, y = xx.ravel(), yy.ravel()
    z, _ = cloth_height(x, y, 0.0)
    gy = p["amp"] * (2.0 * np.pi / p["lam"]) * np.cos(2.0 * np.pi * y / p["lam"])
    n = np.stack([np.zeros_like(gy), -gy, -np.ones_like(gy)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    pts = np.stack([x, y, z], -1)
    d = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    cos_inc = np.abs(np.sum(n * d, axis=-1))
    return pts, cos_inc


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


def kinect_noise(
    depth_mm: np.ndarray,
    intr: Intrinsics,
    seed: int = 0,
    axial_k: float = 1.4e-3,
    lateral_sigma_px: float = 0.5,
    focal_baseline: float = 570.0 * 0.075,
    disparity_step: float = 0.125,
    grazing_start_deg: float = 70.0,
    grazing_full_deg: float = 84.0,
    speckle_dropout: float = 0.002,
    edge_dropout_px: int = 1,
) -> np.ndarray:
    """Kinect-v1-class sensor noise applied to a clean synthetic depth map.

    The reference's only end-to-end input is real Kinect data (the
    VolumeDeform umbrella sequence, /root/reference/download_data.sh:3-13);
    this models the sensor error sources that data carries so the pipeline's
    robust constants (Tukey c, ICP gates, fusion quality thresholds) are
    validated against realistic input, not noiseless analytic scenes:

    - **lateral noise**: the PrimeSense correlation window localizes edges
      to ~half a pixel; modeled by sampling the true depth at a per-pixel
      jittered coordinate (sigma ``lateral_sigma_px``) — produces the
      characteristic edge flicker around silhouettes.
    - **axial noise**: sigma_z(z) = ``axial_k`` * z^2 meters (Khoshelham &
      Elberink 2012 measure ~1.5e-3 at 575px focal); grows quadratically
      with range.
    - **disparity quantization**: Kinect depth is reconstructed from
      disparity in 1/8-px steps: z = f*b / round8(f*b / z) — ~2.3 mm steps
      at 1 m, ~9 mm at 2 m. This is the dominant mm-scale structure in real
      Kinect depth (depth "banding").
    - **grazing-incidence dropout**: the projected IR pattern smears on
      surfaces viewed obliquely; pixels whose surface normal is more than
      ~``grazing_start_deg`` from the view ray drop out with probability
      ramping to 1 at ``grazing_full_deg``.
    - **edge dropout + speckle**: pixels within ``edge_dropout_px`` of a
      depth discontinuity (shadow of the IR projector baseline) and a
      uniform ``speckle_dropout`` fraction return no data (0), producing
      the holes real frames have.

    Input/output: uint16 millimeters, 0 = invalid (sensor convention).
    Deterministic per (seed, shape)."""
    rng = np.random.RandomState(seed)
    rows, cols = depth_mm.shape
    z = depth_mm.astype(np.float64) / 1000.0
    valid = z > 0

    # ---- lateral jitter: resample at a jittered pixel coordinate ----
    if lateral_sigma_px > 0:
        ju = np.clip(
            np.arange(cols)[None, :] + rng.normal(0, lateral_sigma_px, (rows, cols)),
            0, cols - 1,
        ).round().astype(np.int32)
        jv = np.clip(
            np.arange(rows)[:, None] + rng.normal(0, lateral_sigma_px, (rows, cols)),
            0, rows - 1,
        ).round().astype(np.int32)
        z = z[jv, ju]
        valid = z > 0

    # ---- axial noise ----
    z = np.where(valid, z + rng.normal(0.0, 1.0, z.shape) * (axial_k * z * z), 0.0)

    # ---- disparity quantization ----
    if disparity_step > 0:
        with np.errstate(divide="ignore", invalid="ignore"):
            disp = np.where(valid, focal_baseline / np.maximum(z, 1e-6), 0.0)
            disp_q = np.round(disp / disparity_step) * disparity_step
            z = np.where(valid & (disp_q > 0), focal_baseline / np.maximum(disp_q, 1e-6), 0.0)

    # ---- grazing-incidence dropout (normals from the clean-ish depth) ----
    gx = np.zeros_like(z)
    gy = np.zeros_like(z)
    gx[:, 1:-1] = (z[:, 2:] - z[:, :-2]) * 0.5
    gy[1:-1, :] = (z[2:, :] - z[:-2, :]) * 0.5
    # camera-frame normal direction ~ (-fx*dz/du, -fy*dz/dv, stuff); the
    # incidence cosine against the view ray reduces (for a forward-facing
    # camera) to 1/sqrt(1 + (fx*gx/z)^2 + (fy*gy/z)^2) up to O(angle) terms
    with np.errstate(divide="ignore", invalid="ignore"):
        tx = intr.fx * gx / np.maximum(z, 1e-6)
        ty = intr.fy * gy / np.maximum(z, 1e-6)
        cos_inc = 1.0 / np.sqrt(1.0 + tx * tx + ty * ty)
    c0 = np.cos(np.radians(grazing_start_deg))
    c1 = np.cos(np.radians(grazing_full_deg))
    p_drop = np.clip((c0 - cos_inc) / max(c0 - c1, 1e-9), 0.0, 1.0)
    drop = rng.uniform(0.0, 1.0, z.shape) < p_drop

    # ---- edge dropout: dilate the discontinuity mask ----
    if edge_dropout_px > 0:
        edge = np.zeros(z.shape, bool)
        jump = 0.02  # m; discontinuity threshold
        edge[:, :-1] |= np.abs(z[:, 1:] - z[:, :-1]) > jump
        edge[:, 1:] |= np.abs(z[:, 1:] - z[:, :-1]) > jump
        edge[:-1, :] |= np.abs(z[1:, :] - z[:-1, :]) > jump
        edge[1:, :] |= np.abs(z[1:, :] - z[:-1, :]) > jump
        for _ in range(edge_dropout_px - 1):
            e2 = edge.copy()
            e2[:, :-1] |= edge[:, 1:]
            e2[:, 1:] |= edge[:, :-1]
            e2[:-1, :] |= edge[1:, :]
            e2[1:, :] |= edge[:-1, :]
            edge = e2
        drop |= edge & (rng.uniform(0.0, 1.0, z.shape) < 0.5)

    # ---- speckle ----
    drop |= rng.uniform(0.0, 1.0, z.shape) < speckle_dropout

    z = np.where(valid & ~drop, z, 0.0)
    return np.clip(z * 1000.0, 0, 65535).astype(np.uint16)


def write_dataset(
    root: str,
    frames,
    color_frames=None,
) -> None:
    """Write a VolumeDeform-layout dataset to disk: ``root/depth/*.png``
    16-bit grayscale mm (+ optional ``root/color/*.png``) — the layout the
    reference's dataset app globs (/root/reference/apps/demo.cpp:80-88) and
    io.dataset.DepthSequence reads back."""
    import os

    from PIL import Image

    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    for i, d in enumerate(frames):
        Image.fromarray(np.asarray(d, np.uint16)).save(
            os.path.join(root, "depth", f"frame_{i:05d}.png")
        )
    if color_frames is not None:
        os.makedirs(os.path.join(root, "color"), exist_ok=True)
        for i, c in enumerate(color_frames):
            Image.fromarray(np.asarray(c, np.uint8)).save(
                os.path.join(root, "color", f"frame_{i:05d}.png")
            )


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
