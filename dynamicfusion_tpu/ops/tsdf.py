"""TSDF volume ops: rigid integrate, raycast, trilinear sampling, extraction.

TPU-native redesign of /root/reference/kfusion/src/cuda/tsdf_volume.cu.
Differences from the CUDA design, driven by the hardware:

- ``integrate``: the CUDA kernel marches one thread down each z-column
  reading depth through a texture. Here every voxel is independent: voxel
  camera coordinates are built by broadcasting three iotas through the
  vol2cam rotation (no (D,D,D,3) coordinate tensor is materialized — XLA
  fuses the affine into the elementwise update), followed by one gather
  from the dists image. No atomics, no textures.
- ``raycast``: the per-pixel ray march with data-dependent trip count
  becomes a fixed-trip ``lax.fori_loop`` over the worst-case step count
  with a ``done`` mask (all pixels march in lockstep; each step is one
  nearest-neighbor gather for the whole image).
- ``extract_cloud``: the warp-scan/atomic compaction (FullScan6,
  tsdf_volume.cu:486-815) becomes a dense crossing mask + ``jnp.nonzero``
  with a static size cap.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models.volume import TsdfVolume

NAN = jnp.nan


# --------------------------------------------------------------------------
# sampling helpers
# --------------------------------------------------------------------------


def fetch_nearest(tsdf: jnp.ndarray, p_voxels: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor TSDF fetch at (possibly fractional) voxel coords
    (..., 3) (TsdfRaycaster::fetch_tsdf, tsdf_volume.cu:333-340 — round to
    nearest; indices clipped for safety where the reference relies on the
    caller staying in-bounds). Accepts the STORED array (any volume dtype
    — 16-bit arrays are gathered at 2 B/elem, decoded after the gather)."""
    d = tsdf.shape[0]
    idx = jnp.clip(jnp.round(p_voxels).astype(jnp.int32), 0, d - 1)
    flat = (idx[..., 0] * d + idx[..., 1]) * d + idx[..., 2]
    v = jnp.take(tsdf.reshape(-1), flat)
    return v.astype(jnp.float32) * volume_model.tsdf_decode_scale(tsdf.dtype)


def interpolate(tsdf: jnp.ndarray, p_voxels: jnp.ndarray) -> jnp.ndarray:
    """Trilinear TSDF interpolation at fractional voxel coords (..., 3);
    NaN outside the valid interpolation region (interpolate,
    tsdf_volume.cu:221-245)."""
    d = tsdf.shape[0]
    g = jnp.floor(p_voxels)
    gi = g.astype(jnp.int32)
    f = p_voxels - g

    oob = (
        (gi[..., 0] < 0) | (gi[..., 0] >= d - 1)
        | (gi[..., 1] < 0) | (gi[..., 1] >= d - 1)
        | (gi[..., 2] < 0) | (gi[..., 2] >= d - 1)
    )
    gi = jnp.clip(gi, 0, d - 2)

    flat_vol = tsdf.reshape(-1)
    base = (gi[..., 0] * d + gi[..., 1]) * d + gi[..., 2]
    a, b, c = f[..., 0], f[..., 1], f[..., 2]

    out = jnp.zeros(p_voxels.shape[:-1], dtype=jnp.float32)
    for dx in (0, 1):
        wx = a if dx else (1.0 - a)
        for dy in (0, 1):
            wy = b if dy else (1.0 - b)
            for dz in (0, 1):
                wz = c if dz else (1.0 - c)
                val = jnp.take(flat_vol, base + (dx * d + dy) * d + dz)
                out = out + val.astype(jnp.float32) * (wx * wy * wz)
    out = out * volume_model.tsdf_decode_scale(tsdf.dtype)
    return jnp.where(oob, NAN, out)


def interpolate_with_gradient(
    tsdf: jnp.ndarray, p_voxels: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear value AND its analytic in-cell gradient from ONE set of 8
    corner fetches.

    The reference computes the normal with six extra trilinear samples at
    +/-delta (48 gathers/pixel, TsdfRaycaster::compute_normal,
    tsdf_volume.cu:408-426); on TPU random gathers are the raycast cost, so
    the exact derivative of the trilinear interpolant (d/dx of trilinear =
    bilinear of corner differences) reuses the same 8 corners — 8 gathers
    for value + gradient together. Gradient units: tsdf per voxel."""
    d = tsdf.shape[0]
    g = jnp.floor(p_voxels)
    gi = g.astype(jnp.int32)
    f = p_voxels - g

    oob = (
        (gi[..., 0] < 0) | (gi[..., 0] >= d - 1)
        | (gi[..., 1] < 0) | (gi[..., 1] >= d - 1)
        | (gi[..., 2] < 0) | (gi[..., 2] >= d - 1)
    )
    gi = jnp.clip(gi, 0, d - 2)

    flat_vol = tsdf.reshape(-1)
    base = (gi[..., 0] * d + gi[..., 1]) * d + gi[..., 2]
    a, b, c = f[..., 0], f[..., 1], f[..., 2]

    cor = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cor[(dx, dy, dz)] = jnp.take(
                    flat_vol, base + (dx * d + dy) * d + dz
                ).astype(jnp.float32)

    wa0, wa1 = 1.0 - a, a
    wb0, wb1 = 1.0 - b, b
    wc0, wc1 = 1.0 - c, c

    val = (
        wa0 * (wb0 * (wc0 * cor[0, 0, 0] + wc1 * cor[0, 0, 1])
               + wb1 * (wc0 * cor[0, 1, 0] + wc1 * cor[0, 1, 1]))
        + wa1 * (wb0 * (wc0 * cor[1, 0, 0] + wc1 * cor[1, 0, 1])
                 + wb1 * (wc0 * cor[1, 1, 0] + wc1 * cor[1, 1, 1]))
    )
    gx = (
        wb0 * (wc0 * (cor[1, 0, 0] - cor[0, 0, 0]) + wc1 * (cor[1, 0, 1] - cor[0, 0, 1]))
        + wb1 * (wc0 * (cor[1, 1, 0] - cor[0, 1, 0]) + wc1 * (cor[1, 1, 1] - cor[0, 1, 1]))
    )
    gy = (
        wa0 * (wc0 * (cor[0, 1, 0] - cor[0, 0, 0]) + wc1 * (cor[0, 1, 1] - cor[0, 0, 1]))
        + wa1 * (wc0 * (cor[1, 1, 0] - cor[1, 0, 0]) + wc1 * (cor[1, 1, 1] - cor[1, 0, 1]))
    )
    gz = (
        wa0 * (wb0 * (cor[0, 0, 1] - cor[0, 0, 0]) + wb1 * (cor[0, 1, 1] - cor[0, 1, 0]))
        + wa1 * (wb0 * (cor[1, 0, 1] - cor[1, 0, 0]) + wb1 * (cor[1, 1, 1] - cor[1, 1, 0]))
    )
    sc = volume_model.tsdf_decode_scale(tsdf.dtype)
    grad = jnp.stack([gx, gy, gz], axis=-1) * sc
    nanv = jnp.where(oob, NAN, 0.0)
    return val * sc + nanv, grad + nanv[..., None]


def gradient(tsdf: jnp.ndarray, p_voxels: jnp.ndarray, delta_voxels: jnp.ndarray) -> jnp.ndarray:
    """Central-difference TSDF gradient (unnormalized) at voxel coords
    (TsdfRaycaster::compute_normal, tsdf_volume.cu:408-426)."""
    comps = []
    for axis in range(3):
        e = jnp.zeros(3, jnp.float32).at[axis].set(1.0) * delta_voxels[axis]
        f1 = interpolate(tsdf, p_voxels + e)
        f2 = interpolate(tsdf, p_voxels - e)
        comps.append(f1 - f2)
    return jnp.stack(comps, axis=-1)


# --------------------------------------------------------------------------
# integrate
# --------------------------------------------------------------------------


def integrate(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    dists: jnp.ndarray,
    vol2cam: jnp.ndarray,
    intr: Intrinsics,
    with_counts: bool = False,
):
    """Rigid projective TSDF fusion of one dists image
    (TsdfIntegrator, tsdf_volume.cu:51-107).

    ``vol2cam``: (4,4) mapping volume-frame meters to camera frame
    (``camera_pose.inv() * volume_pose``, tsdf_volume.cpp:112).
    Per voxel: project center into the image, nearest-fetch the ray
    distance Dp, sdf = Dp - |v_cam|, and fold min(1, sdf/trunc) into the
    running average where sdf >= -trunc.

    With cfg.integrate_mode == "brick" the update runs brick-sparse
    (ops/bricks.py): only bricks straddling the truncation band pay per-voxel
    depth lookups; the voxel positions come from exact affine prolongation of
    a stride-brick_size grid."""
    d = cfg.volume_dims
    vs = cfg.voxel_size
    trunc = volume_model.trunc_dist(cfg)
    rows, cols = dists.shape

    if cfg.integrate_mode == "brick":
        from dynamicfusion_tpu.ops import bricks

        g = cfg.brick_size
        gp = d // g + 1
        ax = jnp.arange(gp, dtype=jnp.float32) * (g * vs)
        rr = vol2cam[:3, :3]
        tt = vol2cam[:3, 3]
        i = ax[:, None, None]
        j = ax[None, :, None]
        kk = ax[None, None, :]
        cam_grid = jnp.stack(
            [rr[a, 0] * i + rr[a, 1] * j + rr[a, 2] * kk + tt[a] for a in range(3)],
            axis=-1,
        )
        return bricks.integrate_bricks(
            cfg, vol, dists, cam_grid, g, intr, with_counts=with_counts
        )

    r = vol2cam[:3, :3] * vs
    t = vol2cam[:3, 3]
    i = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    j = jnp.arange(d, dtype=jnp.float32)[None, :, None]
    k = jnp.arange(d, dtype=jnp.float32)[None, None, :]

    # camera-frame voxel centers, built without a (D,D,D,3) intermediate
    vc = [r[a, 0] * i + r[a, 1] * j + r[a, 2] * k + t[a] for a in range(3)]
    x, y, z = vc

    u = x * intr.fx / z + intr.cx
    v = y * intr.fy / z + intr.cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u < cols) & (v < rows) & (z > 0)

    flat = jnp.clip(vi, 0, rows - 1) * cols + jnp.clip(ui, 0, cols - 1)
    # The barrier isolates the gather from its large producer/consumer
    # fusions: without it XLA-TPU's fusion of the 16.7M-element gather into
    # the full voxel update makes compilation take minutes (367 s at 256^3)
    # and the kernel ~200x slower. With it: ~1 s compile, memory-bound run.
    flat = jax.lax.optimization_barrier(flat)
    dp = jnp.take(dists.reshape(-1), flat)
    dp = jax.lax.optimization_barrier(dp)

    sdf = dp - jnp.sqrt(x * x + y * y + z * z)
    update = inb & (dp != 0.0) & (sdf >= -trunc)

    tsdf_new_obs = jnp.minimum(1.0, sdf / trunc)
    w = volume_model.decode_weight(vol.weight)
    tsdf_f32 = volume_model.decode_tsdf(vol.tsdf)
    fused = (tsdf_f32 * w + tsdf_new_obs) / (w + 1.0)
    new_tsdf = volume_model.encode_tsdf(
        jnp.where(update, fused, tsdf_f32), vol.tsdf.dtype
    )
    new_w = volume_model.encode_weight(
        jnp.where(update, jnp.minimum(w + 1.0, float(cfg.tsdf_max_weight)), w),
        vol.weight.dtype,
    )
    out = TsdfVolume(new_tsdf, new_w)
    if with_counts:
        return out, jnp.zeros((3,), jnp.int32)  # dense path: nothing capped
    return out


# --------------------------------------------------------------------------
# raycast
# --------------------------------------------------------------------------


class RaycastResult(NamedTuple):
    points: jnp.ndarray   # (H, W, 3) camera-frame, NaN invalid
    normals: jnp.ndarray  # (H, W, 3) camera-frame, NaN invalid


def _ray_box(ray_org: jnp.ndarray, ray_dir: jnp.ndarray, box_max: jnp.ndarray):
    """Slab test against [0, box_max] (intersect, tsdf_volume.cu:202-218,
    including its tnear quirk of using tmin.x twice — fixed here to the
    correct max over all three axes)."""
    inv = 1.0 / jnp.where(jnp.abs(ray_dir) > 1e-12, ray_dir, 1e-12)
    tbot = inv * (0.0 - ray_org)
    ttop = inv * (box_max - ray_org)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    return jnp.max(tmin, axis=-1), jnp.min(tmax, axis=-1)


def raycast(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    cam2vol: jnp.ndarray,
    intr: Intrinsics,
    rows: int,
    cols: int,
    t_seed: jnp.ndarray | None = None,
    t_band: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> RaycastResult:
    """Per-pixel ray march for the zero crossing (TsdfRaycaster,
    tsdf_volume.cu:247-474). Returns points/normals in the *camera* frame
    (the reference converts with Rinv·(v − t) at tsdf_volume.cu:370-372).

    The march is a fixed-trip fori_loop over the worst-case step count
    (volume diagonal / step) with per-pixel done-masking; the crossing is
    refined by linear interpolation of two trilinear samples plus a Newton
    polish, the normal from the in-cell trilinear gradient (or the
    reference's six-sample central difference with
    cfg.raycast_smooth_normals).

    ``t_seed``: optional (rows, cols) expected surface distance along each
    ray (e.g. the live frame's dists map). Seeded pixels march only the
    [seed - m, seed + m] band (m = cfg.raycast_seed_margin) instead of the
    whole volume — the tracking raycast's march cost drops ~6x. Pixels with
    seed <= 0 march the full ray.

    ``t_band``: optional explicit per-pixel march interval (lo, hi), each
    (rows, cols) — e.g. from a coarse prepass (see raycast_coarse_band).
    Pixels with hi <= lo don't march at all (miss). Overrides t_seed."""
    d = cfg.volume_dims
    vs = cfg.voxel_size
    trunc = volume_model.trunc_dist(cfg)
    step = trunc * cfg.raycast_step_factor
    vol_size = vs * d
    # STORED dtype: the march's random gathers move 2 B/elem for 16-bit
    # volumes; fetch_nearest/interpolate decode after the gather
    tsdf = vol.tsdf

    r_cv = cam2vol[:3, :3]
    ray_org = cam2vol[:3, 3]

    u = jnp.arange(cols, dtype=jnp.float32)[None, :] * jnp.ones((rows, 1), jnp.float32)
    v = jnp.arange(rows, dtype=jnp.float32)[:, None] * jnp.ones((1, cols), jnp.float32)
    dirs = jnp.stack(
        [(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy, jnp.ones_like(u)], axis=-1
    )
    # HIGHEST: ray directions at bf16 default precision drift by ~1e-2 rad,
    # i.e. centimetres at 1 m range (free: K=3 contraction)
    dirs = jnp.matmul(dirs, r_cv.T, precision=jax.lax.Precision.HIGHEST)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)

    box_max = jnp.full((3,), vol_size - vs, jnp.float32)
    tmin, tmax = _ray_box(ray_org, dirs, box_max)
    tmin = jnp.maximum(tmin, 0.0)
    tmax = tmax - step

    if t_band is not None:
        lo, hi = t_band
        lo = jnp.nan_to_num(lo)
        hi = jnp.nan_to_num(hi)
        if cfg.raycast_band_cap > 0.0:
            # bound each ray's march length: silhouette-window bands span
            # [nearest fg, farthest bg] (often most of the volume) and a
            # handful of such rays set the whole march's trip count. Capped
            # rays that would only have hit PAST the cap report a miss
            # instead — acceptable for tracking maps (those are far
            # background hits behind a silhouette), not for final renders.
            hi = jnp.minimum(hi, lo + cfg.raycast_band_cap)
        tmin = jnp.maximum(tmin, lo)
        tmax = jnp.minimum(tmax, hi)
    elif t_seed is not None:
        m = cfg.raycast_seed_margin
        seeded = t_seed > 0.0
        ts0 = jnp.nan_to_num(t_seed)
        tmin = jnp.where(seeded, jnp.clip(ts0 - m, tmin, tmax), tmin)
        tmax = jnp.where(seeded, jnp.minimum(ts0 + m, tmax), tmax)

    samplers = (
        lambda p: fetch_nearest(tsdf, p),
        lambda p: interpolate(tsdf, p),
        lambda p: interpolate_with_gradient(tsdf, p),
    )
    found, ts, vertex_vol, normal_vol, _ = march_and_refine(
        cfg, samplers, ray_org, dirs, tmin, tmax, vol_size,
        adaptive_double=cfg.raycast_adaptive_step,
    )

    nn = jnp.linalg.norm(normal_vol, axis=-1, keepdims=True)
    normal_vol = normal_vol / jnp.maximum(nn, 1e-12)

    valid = found & ~jnp.isnan(normal_vol).any(axis=-1) & (nn[..., 0] > 1e-12)

    # back to camera frame (HIGHEST: metric points, see dirs above)
    hi = jax.lax.Precision.HIGHEST
    r_vc = r_cv.T
    vertex_cam = jnp.matmul(vertex_vol - ray_org, r_vc.T, precision=hi)
    normal_cam = jnp.matmul(normal_vol, r_vc.T, precision=hi)

    return RaycastResult(
        points=jnp.where(valid[..., None], vertex_cam, NAN),
        normals=jnp.where(valid[..., None], normal_cam, NAN),
    )


def march_and_refine(
    cfg: DynamicFusionConfig,
    samplers,
    ray_org: jnp.ndarray,
    dirs: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    vol_size: float,
    adaptive_double: bool = True,
):
    """The raycast core over an ABSTRACT volume sampler triple
    ``(fetch_nearest(p_vox), interpolate(p_vox),
    interpolate_with_gradient(p_vox))`` — shared by the single-device
    cubic raycast above and the slab-local sharded raycast
    (parallel/sharded_raycast.py), so the march/refine semantics cannot
    drift between them. Returns (found, ts, vertex_vol, normal_vol) in
    the volume frame; ``normal_vol`` is UNNORMALIZED."""
    vs = cfg.voxel_size
    trunc = volume_model.trunc_dist(cfg)
    step = trunc * cfg.raycast_step_factor
    fetch_n, interp, interp_grad = samplers
    rows, cols = tmin.shape

    n_steps = int(math.ceil(math.sqrt(3.0) * vol_size / step)) + 1
    inv_vs = 1.0 / vs

    def fetch(t):
        p = (ray_org + dirs * t[..., None]) * inv_vs
        return fetch_n(p)

    tsdf0 = fetch(tmin)
    state = dict(
        i=jnp.zeros((), jnp.int32),
        t=tmin,
        done=(tmin >= tmax),
        found=jnp.zeros((rows, cols), bool),
        t_hit=jnp.zeros((rows, cols), jnp.float32),
        dt_hit=jnp.full((rows, cols), step, jnp.float32),
        t_behind=jnp.full((rows, cols), jnp.inf),
        tsdf_prev=tsdf0,
    )
    if cfg.raycast_refine in ("newton8", "newton16", "hybrid16"):
        state["f0"] = jnp.ones((rows, cols), jnp.float32)
        state["f1"] = -jnp.ones((rows, cols), jnp.float32)

    def cond(st):
        return (st["i"] < n_steps) & ~jnp.all(st["done"])

    def one_step(st):
        # adaptive march: double the step deep in observed free space
        # (tsdf ~ +1 means the surface is at least one truncation away);
        # base step inside/near the band — same crossing-bracketing
        # guarantee as the reference's fixed trunc*0.75 stepping.
        if adaptive_double:
            dt = jnp.where(st["tsdf_prev"] > 0.99, 2.0 * step, step)
        else:
            dt = jnp.full_like(st["tsdf_prev"], step)
        tnext = st["t"] + dt
        active = ~st["done"] & (st["t"] < tmax)
        tsdf_next = fetch(tnext)
        crossing = (st["tsdf_prev"] > 0.0) & (tsdf_next < 0.0) & active
        behind = (st["tsdf_prev"] < 0.0) & (tsdf_next > 0.0) & active
        out = dict(
            i=st["i"] + 1,
            t=jnp.where(active, tnext, st["t"]),
            done=st["done"] | crossing | behind | (tnext >= tmax),
            found=st["found"] | crossing,
            t_hit=jnp.where(crossing, st["t"], st["t_hit"]),
            dt_hit=jnp.where(crossing, dt, st["dt_hit"]),
            # first exit-geometry event (the sharded raycast's cross-slab
            # first-event ordering needs it; single-device callers ignore)
            t_behind=jnp.where(behind, st["t"], st["t_behind"]),
            tsdf_prev=jnp.where(active, tsdf_next, st["tsdf_prev"]),
        )
        if "f0" in st:  # newton8 refine: bracket endpoint values
            out["f0"] = jnp.where(crossing, st["tsdf_prev"], st["f0"])
            out["f1"] = jnp.where(crossing, tsdf_next, st["f1"])
        return out

    def body(st):
        # 2x unrolled: per-iteration while_loop overhead (the `all(done)`
        # cond round + state churn) is comparable to one image-wide gather
        # at tracking resolution, so two march steps per trip roughly
        # halves it (measured 35 -> 28 ms fine march at 320x240)
        return one_step(one_step(st))

    st = jax.lax.while_loop(cond, body, state)
    found, t_hit, dt_hit = st["found"], st["t_hit"], st["dt_hit"]

    if cfg.raycast_refine == "hybrid16":
        # EXPERIMENTAL 16-gather refine (round 4): two fused
        # value+gradient fetches anchored on EXACT trilinear values — at
        # the march's nearest-secant point, then at the bracket-slope
        # correction — with an exact-two-point secant update and a
        # healthy-local-gradient polish. MEASURED (round 4): static
        # raycast accuracy matches the 24-gather secant at every incidence
        # band (graze med 2.79 vs 2.81 mm, p95 8.0 vs 8.4 on a 64^3
        # sphere TSDF), BUT it does NOT pass the rigid coarse-volume orbit
        # gate (3-frame 64^3: 41.3 mm pose error vs 3.5 mm secant, i.e.
        # newton8-class) — a small incidence-correlated bias survives
        # every variant tried (midpoint start, secant-point start,
        # bracket-clamped and +-dt-clamped updates, always-bracket-slope
        # polish). Rigid pipelines therefore pin the secant refine
        # structurally (kinfu.DynamicFusion.__init__); this path remains
        # for non-rigid experiments where the warp solve absorbs the
        # residual bias and the raycast is hot.
        f0, f1 = st["f0"], st["f1"]
        slope_march = jnp.minimum((f1 - f0) / dt_hit, -1e-6)  # < 0 at a crossing
        # exact evaluation 1: bracket midpoint. NOTE the crossing of the
        # TRILINEAR field may lie (fractionally) OUTSIDE the nearest-fetch
        # bracket — hard-clamping to [t_hit, t_hit+dt] re-introduces
        # exactly the grazing-incidence bias this refine exists to remove,
        # so steps are limited to +-dt around their base point instead
        # (the secant path's good2 convention).
        alpha0 = jnp.clip(
            f0 / jnp.where(jnp.abs(f0 - f1) > 1e-12, f0 - f1, 1e-12), 0.0, 1.0
        )
        t_m = t_hit + dt_hit * alpha0
        f_m, _ = interp_grad((ray_org + dirs * t_m[..., None]) * inv_vs)
        f_m0 = jnp.nan_to_num(f_m)
        d1 = jnp.clip(-f_m0 / slope_march, -dt_hit, dt_hit)
        t_c = t_m + d1
        # exact evaluation 2: the corrected point (also yields the normal)
        f_c, normal_vol = interp_grad((ray_org + dirs * t_c[..., None]) * inv_vs)
        f_c0 = jnp.nan_to_num(f_c)
        # secant slope over the TWO EXACT values — superlinear update with
        # no nearest-fetch noise; degenerate spacing falls back to the
        # march slope, a healthy local gradient takes over where available
        dt_sec = t_c - t_m
        slope_sec = jnp.where(
            jnp.abs(dt_sec) > 1e-6 * dt_hit, (f_c0 - f_m0) / dt_sec, slope_march
        )
        slope_sec = jnp.minimum(slope_sec, -1e-6)
        dfdt = jnp.sum(normal_vol * dirs, axis=-1) * inv_vs
        use_local = jnp.abs(dfdt) > 0.25 * jnp.abs(slope_sec)
        denom = jnp.where(use_local & (dfdt < -1e-12), dfdt, slope_sec)
        ts = t_c - f_c0 / denom
        good2 = jnp.isfinite(ts) & (jnp.abs(ts - t_c) < dt_hit) & ~jnp.isnan(f_c)
        ts = jnp.where(good2, ts, t_c)
        vertex_vol = ray_org + dirs * ts[..., None]
        if cfg.raycast_smooth_normals:
            grad_delta = jnp.full((3,), cfg.gradient_delta_factor, jnp.float32)
            normal_vol = _grad6(interp, vertex_vol * inv_vs, grad_delta)
    elif cfg.raycast_refine in ("newton8", "newton16"):
        # 8/16-gather refine: the NEAREST-fetched bracket endpoint values
        # from the march (free) give a secant estimate INSIDE the band;
        # fused value+gradient fetches there run clamped Newton steps (one
        # for newton8, two for newton16) and yield the normal. Differs from
        # the two REJECTED variants documented on the secant path below:
        # variant (1) used the nearest-secant POINT directly (plane bias at
        # grazing incidence); variant (2) Newton'd from the bracket START
        # (+-1 plateau, ~zero local gradient). Here Newton starts at the
        # secant's near-surface point, where the in-cell trilinear gradient
        # is the real surface slope.
        #
        # newton8 caveat (measured, round 3): the nearest-fetched f0/f1
        # carry +-half-voxel error, and at grazing incidence dfdt ~ 0 makes
        # the single Newton step clamp out — a systematic crossing bias
        # that breaks rigid tracking at coarse volumes (64^3 orbit test:
        # 37 mm pose error vs 3.5 mm secant). The SECOND fused fetch of
        # newton16 re-linearizes at the corrected point and removes the
        # bias (pose error matches secant) at 16 vs 24 gathers.
        f0, f1 = st["f0"], st["f1"]
        denom0 = f0 - f1
        alpha = jnp.clip(
            f0 / jnp.where(jnp.abs(denom0) > 1e-12, denom0, 1e-12), 0.0, 1.0
        )
        ts = t_hit + dt_hit * alpha
        n_newton = 2 if cfg.raycast_refine == "newton16" else 1
        for _ in range(n_newton):
            p0 = (ray_org + dirs * ts[..., None]) * inv_vs
            f_v, normal_vol = interp_grad(p0)
            dfdt = jnp.sum(normal_vol * dirs, axis=-1) * inv_vs
            ts2 = ts - f_v / jnp.where(jnp.abs(dfdt) > 1e-12, dfdt, 1e-12)
            good2 = (
                jnp.isfinite(ts2)
                & (jnp.abs(ts2 - ts) < dt_hit)
                & ~jnp.isnan(f_v)
            )
            ts = jnp.where(good2, ts2, ts)
        vertex_vol = ray_org + dirs * ts[..., None]
        if cfg.raycast_smooth_normals:
            grad_delta = jnp.full((3,), cfg.gradient_delta_factor, jnp.float32)
            normal_vol = _grad6(interp, vertex_vol * inv_vs, grad_delta)
    else:
        # refine: Ts = t - dt*Ft/(Ftdt - Ft) with trilinear Ft, Ftdt.
        # REJECTED cheaper variants (keep the 24-gather secant + polish):
        # (1) nearest-bracket values + Newton — grazing-incidence plane bias
        #     breaks rigid tracking (tests/test_rigid_mode.py catches it);
        # (2) one fused value+gradient fetch at the bracket start + clamped
        #     Newton (16 gathers) — the bracket start often sits on the TSDF's
        #     clamped +-1 plateau where the LOCAL in-cell gradient is ~0, so
        #     Newton clamps to the far bracket end; measured 2.14 -> 3.00 mm
        #     median on the deforming-sphere quality bench. The secant's
        #     average slope over the bracket is immune to the plateau.
        p_curr = (ray_org + dirs * t_hit[..., None]) * inv_vs
        p_next = (ray_org + dirs * (t_hit + dt_hit)[..., None]) * inv_vs
        ft = interp(p_curr)
        ftdt = interp(p_next)
        denom = ftdt - ft
        ts = t_hit - dt_hit * ft / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        ts = jnp.where(jnp.isnan(ft) | jnp.isnan(ftdt), t_hit, ts)

        vertex_vol = ray_org + dirs * ts[..., None]
        if cfg.raycast_smooth_normals:
            grad_delta = jnp.full((3,), cfg.gradient_delta_factor, jnp.float32)
            normal_vol = _grad6(interp, vertex_vol * inv_vs, grad_delta)
        else:
            # second fused fetch: Newton polish of the crossing
            # (better-than-reference sub-step accuracy for free) + the in-cell
            # gradient for the normal
            f_v, normal_vol = interp_grad(vertex_vol * inv_vs)
            dfdt = jnp.sum(normal_vol * dirs, axis=-1) * inv_vs
            ts2 = ts - f_v / jnp.where(jnp.abs(dfdt) > 1e-12, dfdt, 1e-12)
            good2 = (
                jnp.isfinite(ts2)
                & (jnp.abs(ts2 - ts) < dt_hit)
                & ~jnp.isnan(f_v)
            )
            ts = jnp.where(good2, ts2, ts)
            vertex_vol = ray_org + dirs * ts[..., None]
    return found, ts, vertex_vol, normal_vol, st["t_behind"]


def _grad6(interp, p_voxels, delta_voxels):
    """Six-sample central-difference gradient via an abstract interp
    sampler (the reference's compute_normal semantics — see gradient())."""
    comps = []
    for axis in range(3):
        e = jnp.zeros(3, jnp.float32).at[axis].set(1.0) * delta_voxels[axis]
        comps.append(interp(p_voxels + e) - interp(p_voxels - e))
    return jnp.stack(comps, axis=-1)


def raycast_coarse_band(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    cam2vol: jnp.ndarray,
    intr: Intrinsics,
    rows: int,
    cols: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine march acceleration: full march at 1/factor resolution,
    then a per-pixel (lo, hi) band from the 3x3-coarse-window min/max hit
    distance, widened by cfg.raycast_band_margin and upsampled to
    (rows, cols). Fine rays then march ~(spread+2m)/step steps instead of
    the whole volume diagonal (~58 steps at 256^3 defaults).

    Pixels whose entire coarse 3x3 neighborhood missed get an empty band
    (no march): structures thinner than ~2*factor coarse pixels can be
    lost — acceptable for the tracking/model maps (factor 4 at 320x240 =
    missing features < ~2.5 cm at 1 m); use t_band=None (full march) for
    final-quality rendering."""
    f = cfg.raycast_coarse_factor
    lvl = f.bit_length() - 1
    assert f == 1 << lvl and rows % f == 0 and cols % f == 0
    res_c = raycast(cfg, vol, cam2vol, intr.level(lvl), rows // f, cols // f)
    t = jnp.linalg.norm(res_c.points, axis=-1)  # camera-frame |p| = ray t
    hit = ~jnp.isnan(t)
    t0 = jnp.where(hit, t, jnp.inf)
    t1 = jnp.where(hit, t, -jnp.inf)
    lo_c = jax.lax.reduce_window(t0, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME")
    hi_c = jax.lax.reduce_window(t1, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    m = cfg.raycast_band_margin
    any_hit = jnp.isfinite(lo_c)
    lo_c = jnp.where(any_hit, jnp.maximum(lo_c - m, 0.0), 0.0)
    hi_c = jnp.where(any_hit, hi_c + m, 0.0)
    lo = jnp.repeat(jnp.repeat(lo_c, f, axis=0), f, axis=1)
    hi = jnp.repeat(jnp.repeat(hi_c, f, axis=0), f, axis=1)
    return lo, hi


# --------------------------------------------------------------------------
# extraction
# --------------------------------------------------------------------------


class ExtractedCloud(NamedTuple):
    points: jnp.ndarray  # (K, 3) world-frame; rows beyond count are NaN
    valid: jnp.ndarray   # (K,) bool
    count: jnp.ndarray   # scalar int32


def extract_cloud(
    cfg: DynamicFusionConfig, vol: TsdfVolume, max_points: int,
    min_weight: float | None = None,
) -> ExtractedCloud:
    """Zero-crossing surface cloud in world coordinates.

    Replaces FullScan6 (tsdf_volume.cu:486-706): for each voxel and each of
    the +x/+y/+z neighbors, where both voxels are observed and the tsdf
    changes sign, emit the linearly interpolated crossing. Compaction is
    ``jnp.nonzero(..., size=max_points)`` — static output shape, padded.

    ``min_weight`` (None -> cfg.extract_min_weight) is the minimum
    observation evidence for a voxel to claim surface. The reference
    requires weight > 0 (any single observation); grazing-incidence
    silhouette voxels observed 1-2 times carry ~3 voxels of crossing error
    and were the entire p95 tail of the quality bench (scripts/diag_tail.py:
    tail is 100%% at |cos incidence| < 0.2 and weight < 4). Callers that
    need single-observation surface (frame-0 node sampling, where every
    weight is exactly 1) pass min_weight=1."""
    d = cfg.volume_dims
    vs = cfg.voxel_size
    tsdf = volume_model.decode_tsdf(vol.tsdf)
    w = volume_model.decode_weight(vol.weight)
    mw = cfg.extract_min_weight if min_weight is None else min_weight

    pts_list = []
    valid_list = []
    for axis in range(3):
        t0 = jax.lax.slice_in_dim(tsdf, 0, d - 1, axis=axis)
        t1 = jax.lax.slice_in_dim(tsdf, 1, d, axis=axis)
        w0 = jax.lax.slice_in_dim(w, 0, d - 1, axis=axis)
        w1 = jax.lax.slice_in_dim(w, 1, d, axis=axis)
        cross = (w0 >= mw) & (w1 >= mw) & (t0 * t1 < 0)
        alpha = t0 / jnp.where(jnp.abs(t0 - t1) > 1e-12, t0 - t1, 1e-12)

        shape = cross.shape
        ii = jnp.arange(shape[0], dtype=jnp.float32)[:, None, None]
        jj = jnp.arange(shape[1], dtype=jnp.float32)[None, :, None]
        kk = jnp.arange(shape[2], dtype=jnp.float32)[None, None, :]
        idx = [jnp.broadcast_to(ii, shape), jnp.broadcast_to(jj, shape), jnp.broadcast_to(kk, shape)]
        idx[axis] = idx[axis] + alpha
        p = jnp.stack(idx, axis=-1) * vs
        pts_list.append(p.reshape(-1, 3))
        valid_list.append(cross.reshape(-1))

    pts = jnp.concatenate(pts_list, axis=0)
    valid = jnp.concatenate(valid_list, axis=0)

    (sel,) = jnp.nonzero(valid, size=max_points, fill_value=-1)
    ok = sel >= 0
    out = jnp.take(pts, jnp.maximum(sel, 0), axis=0) + volume_model.origin(cfg)
    out = jnp.where(ok[..., None], out, NAN)
    return ExtractedCloud(points=out, valid=ok, count=jnp.sum(valid.astype(jnp.int32)))


def extract_normals(
    cfg: DynamicFusionConfig, vol: TsdfVolume, points_world: jnp.ndarray
) -> jnp.ndarray:
    """Normals at extracted world-frame points via the trilinear TSDF
    gradient (ExtractNormals, tsdf_volume.cu:714-831)."""
    p_vox = (points_world - volume_model.origin(cfg)) / cfg.voxel_size
    g = gradient(
        vol.tsdf,
        p_vox,
        jnp.full((3,), cfg.gradient_delta_factor, jnp.float32),
    )
    n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    return n
