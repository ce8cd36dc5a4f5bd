"""Rigid projective point-to-plane ICP (frame-to-model camera tracking).

TPU-native redesign of the reference's ``cuda::ProjectiveICP``
(/root/reference/kfusion/src/projective_icp.cpp:169-213 and
/root/reference/kfusion/src/cuda/proj_icp.cu). The reference accumulates the
6x6 normal equations with 27 hand-written shared-memory tree reductions and
reads the system back to the host each Gauss-Newton iteration to run
``cv::solve``; here the residual rows are formed as masked (H, W, 6) arrays,
the system is one einsum (an MXU matmul), and the 6x6 solve happens on
device — the whole coarse-to-fine loop lives inside one jit with zero host
synchronization.

Correspondence and gating match find_coresp (proj_icp.cu:80-108):
projective association into the previous frame, distance gate
|s - d|^2 < dist_thres^2, normal gate |cos(n_s, n_d)| > cos(angle_thres).
Row layout matches icp_helper_kernel (proj_icp.cu:350-371):
J = [s x n_d, n_d], r = n_d . (d - s).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.ops import preprocess


class IcpResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) mapping current camera frame -> previous
    ok: jnp.ndarray         # scalar bool: system stayed well-conditioned


def _build_system(
    intr: Intrinsics,
    t_cur: jnp.ndarray,
    curr_pts: jnp.ndarray,
    curr_nrm: jnp.ndarray,
    prev_pts: jnp.ndarray,
    prev_nrm: jnp.ndarray,
    dist2_thres: float,
    min_cosine: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One linearization: masked per-pixel rows -> (A, b) of J^T J x = J^T r.

    ``curr_*`` and ``prev_*`` may differ in resolution: residual rows come
    from the CURRENT pixels (possibly a strided subset — cfg.icp_finest_
    stride), while projective association always targets the full previous/
    model maps, whose shape defines the image bounds."""
    rows, cols = prev_pts.shape[:2]

    s = se3.transform_points(t_cur, curr_pts)
    valid_s = ~jnp.isnan(curr_pts[..., 0])

    u = s[..., 0] * intr.fx / s[..., 2] + intr.cx
    v = s[..., 1] * intr.fy / s[..., 2] + intr.cy
    inb = (s[..., 2] > 0) & (u >= 0) & (v >= 0) & (u < cols) & (v < rows)

    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, cols - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, rows - 1)
    flat = vi * cols + ui
    d = jnp.take(prev_pts.reshape(-1, 3), flat, axis=0)
    nd = jnp.take(prev_nrm.reshape(-1, 3), flat, axis=0)
    valid_d = ~jnp.isnan(d[..., 0]) & ~jnp.isnan(nd[..., 0])

    dist2 = jnp.sum((s - d) ** 2, axis=-1)
    ns = se3.rotate_dirs(t_cur, curr_nrm)
    cosine = jnp.abs(jnp.sum(ns * nd, axis=-1))

    mask = valid_s & inb & valid_d & (dist2 < dist2_thres) & (cosine > min_cosine)

    s0 = jnp.nan_to_num(s)
    d0 = jnp.nan_to_num(d)
    nd0 = jnp.nan_to_num(nd)
    row = jnp.concatenate([jnp.cross(s0, nd0), nd0], axis=-1)  # (H, W, 6)
    rhs = jnp.sum(nd0 * (d0 - s0), axis=-1)                     # (H, W)

    m = mask.astype(jnp.float32)[..., None]
    row = row * m
    # HIGHEST: the 6x6 normal equations feed a near-singular solve; bf16
    # accumulation noise shifts the pose estimate by >voxel amounts
    hi = jax.lax.Precision.HIGHEST
    a = jnp.einsum("hwi,hwj->ij", row, row, precision=hi)
    b = jnp.einsum("hwi,hw->i", row, rhs, precision=hi)
    return a, b


def estimate_transform(
    cfg: DynamicFusionConfig,
    curr_pts_pyr: List[jnp.ndarray],
    curr_nrm_pyr: List[jnp.ndarray],
    prev_pts_pyr: List[jnp.ndarray],
    prev_nrm_pyr: List[jnp.ndarray],
    level_offset: int = 0,
) -> IcpResult:
    """Coarse-to-fine Gauss-Newton (estimateTransform points variant,
    projective_icp.cpp:169-213). Iteration schedule cfg.icp_iters is
    fine->coarse like the reference's {10,5,4,0}; levels run coarse->fine.

    ``level_offset``: global pyramid level of the pyramids' finest entry
    (nonzero when the model raycast runs below full resolution,
    cfg.raycast_subsample > 1) — shifts the intrinsics accordingly; the
    finest *available* level still gets the reference's finest-level
    iteration count.

    Degeneracy: where |det A| < 1e-15 or non-finite, the increment is
    skipped; ``ok`` is the health of the FINEST executed level's last
    iteration. (The reference aborts the frame and resets on any degenerate
    iteration, projective_icp.cpp:197-203 — but a singular system at a
    coarse level that the finer levels recover from is not a tracking
    failure, and a hard reset there destroys minutes of fused model; what
    decides whether the pose is trustworthy is the state of the
    finest-resolution solve at convergence.)"""
    dist2_thres = cfg.icp_dist_thres * cfg.icp_dist_thres
    min_cos = math.cos(cfg.icp_angle_thres)

    t = se3.identity()
    ok = jnp.array(True)

    levels = len(prev_pts_pyr)
    for level in reversed(range(levels)):
        iters = cfg.icp_iters[level]
        shp = prev_pts_pyr[level].shape
        if shp[0] * shp[1] < 96:
            # a 6-dof point-to-plane solve on a handful of pixels is
            # meaningless and its near-singular system would poison `ok`
            # (arises only for tiny test frames; the reference's 640x480
            # coarsest level is 80x60)
            continue
        intr_l = cfg.intr.level(level + level_offset)
        cp, cn = curr_pts_pyr[level], curr_nrm_pyr[level]
        pp, pn = prev_pts_pyr[level], prev_nrm_pyr[level]
        if level == 0 and cfg.icp_finest_stride > 1:
            # residual-row subsampling at the finest level only: the 6-dof
            # system is massively overdetermined there (~77k rows for 6
            # unknowns at the bench shape); a strided pixel subset keeps
            # the full-resolution model maps as association TARGETS (the
            # intrinsics and bounds in _build_system come from prev), so
            # only the row count drops, not the association accuracy
            st = cfg.icp_finest_stride
            cp, cn = cp[::st, ::st], cn[::st, ::st]

        def gn_iter(st, cp=cp, cn=cn, pp=pp, pn=pn, intr_l=intr_l):
            i, t, _, _ = st
            a, b = _build_system(
                intr_l, t, cp, cn, pp, pn, dist2_thres, min_cos
            )
            det = jnp.linalg.det(a)
            good = jnp.isfinite(det) & (jnp.abs(det) > 1e-15)
            a_safe = jnp.where(good, a, jnp.eye(6, dtype=a.dtype))
            b_safe = jnp.where(good, b, jnp.zeros_like(b))
            x = jnp.linalg.solve(a_safe, b_safe)
            x = jnp.where(good & jnp.isfinite(x).all(), x, jnp.zeros_like(x))
            t_inc = se3.exp_twist(x)
            t = jnp.where(good, se3.compose(t_inc, t), t)
            # degenerate iterations (good=False) keep retrying up to the
            # cap — only a small CONVERGED step ends the level early; the
            # carried `good` is the LAST iteration's health, so a recovered
            # level reports healthy
            step_norm = jnp.where(good, jnp.linalg.norm(x), jnp.inf)
            return (i + 1, t, good, step_norm)

        # NOT unrolled (unlike the raycast march): warm-started ICP levels
        # converge in 1-3 iterations, and a 2x unroll halves the early-exit
        # granularity — measured 26 -> 48 ms per frame on the phase profile
        body = gn_iter

        # the schedule (cfg.icp_iters, the reference's {10,5,4,0}) is the
        # per-level CAP; converged levels exit early on the GN step norm —
        # warm-started frames (small inter-frame motion) typically use a
        # fraction of the cap at identical pose accuracy
        def cond(st, iters=iters):
            i, _, _, step_norm = st
            return (i < iters) & (step_norm > cfg.icp_step_tol)

        if iters > 0:
            _, t, level_ok, _ = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), t, jnp.array(True), jnp.asarray(jnp.inf))
            )
            ok = level_ok  # finest executed level's final health wins
    return IcpResult(transform=t, ok=ok)


def estimate_transform_depth(
    cfg: DynamicFusionConfig,
    curr_depth_pyr: List[jnp.ndarray],
    curr_nrm_pyr: List[jnp.ndarray],
    prev_depth_pyr: List[jnp.ndarray],
    prev_nrm_pyr: List[jnp.ndarray],
    level_offset: int = 0,
) -> IcpResult:
    """The reference's DEPTH-variant ICP (the ``USE_DEPTH`` compile path,
    /root/reference/kfusion/src/projective_icp.cpp:125-167 with
    find_coresp's depth branch, proj_icp.cu:60-77): correspondence targets
    are reconstructed from the PREVIOUS FRAME's depth pyramid — i.e.
    frame-to-frame tracking — instead of the raycast model maps
    (frame-to-model, the reference's active path and this pipeline's
    default).

    On TPU the in-kernel texture reproject dissolves into building the
    per-level vertex maps from the depth pyramids once (exactly what the
    reference's reproj() does per lookup) and running the same masked-row
    einsum Gauss-Newton core. Useful when no fused model exists (bootstrap,
    model-free odometry) and for parity with the reference's compile-time
    variant."""
    curr_pts, prev_pts = [], []
    for l, (dc, dp) in enumerate(zip(curr_depth_pyr, prev_depth_pyr)):
        intr_l = cfg.intr.level(l + level_offset)
        pc, _ = preprocess.compute_points_normals(intr_l, dc)
        pp, _ = preprocess.compute_points_normals(intr_l, dp)
        curr_pts.append(pc)
        prev_pts.append(pp)
    return estimate_transform(
        cfg, curr_pts, list(curr_nrm_pyr), prev_pts, list(prev_nrm_pyr),
        level_offset=level_offset,
    )
