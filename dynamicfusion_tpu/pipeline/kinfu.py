"""The DynamicFusion frame pipeline.

TPU-native redesign of the reference's ``KinFu`` orchestration
(/root/reference/kfusion/src/kinfu.cpp: ``operator()`` :221-305 and
``dynamicfusion()`` :344-400). The reference's per-frame flow downloads
full-resolution clouds to the host and loops over pixels on the CPU each
frame (kinfu.cpp:353-381 — the reason it runs at seconds/frame); here the
whole frame step — preprocess, rigid ICP, canonical raycast, non-rigid
Gauss-Newton solve, DQB-warped fusion, node insertion, model raycast — is
ONE jitted function over an immutable state pytree. Zero host round-trips.

Intentional fixes vs the reference (SURVEY §2.9):
- the canonical cloud is transformed with the camera pose (not its inverse,
  item 11 / kinfu.cpp:358 applies inverse_pose to camera-frame points);
- live normals are real live-frame normals (the reference passes canonical
  normals as live, kinfu.cpp:387);
- the non-rigid voxel update actually runs (items 5);
- the warp field gains new nodes as the surface grows (Report.md:37-42).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.models.warpfield import WarpField
from dynamicfusion_tpu.ops import fusion, preprocess, tsdf as tsdf_ops
from dynamicfusion_tpu.solvers import icp, warp_solver


class PipelineState(NamedTuple):
    vol: TsdfVolume
    warp: WarpField
    pose: jnp.ndarray                 # (4,4) camera-to-world
    # model maps for ICP tracking (camera frame; DQB-warped into the live
    # frame when cfg.track_against_warped)
    prev_points: Tuple[jnp.ndarray, ...]
    prev_normals: Tuple[jnp.ndarray, ...]
    # full-res CANONICAL model map (camera frame) — the solver's canonical
    # surface source
    can_points: jnp.ndarray
    can_normals: jnp.ndarray
    frame_idx: jnp.ndarray            # scalar int32


class StepOutputs(NamedTuple):
    icp_ok: jnp.ndarray
    pose: jnp.ndarray
    solver_cost0: jnp.ndarray
    solver_cost1: jnp.ndarray
    node_count: jnp.ndarray
    # (3,) int32 runtime (band, wide, dropped) brick counts of this frame's
    # integrate (zeros for integrate_mode="dense"): dropped > 0 means that
    # many bricks past the static caps kept stale TSDF values this frame —
    # resize cfg.integrate_band_cap / integrate_wide_cap.
    brick_counts: jnp.ndarray
    model_points: jnp.ndarray   # (H, W, 3) raycast model, camera frame
    model_normals: jnp.ndarray


def _vol_pose(cfg: DynamicFusionConfig) -> jnp.ndarray:
    return se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))


def _pyramid_from_maps(cfg: DynamicFusionConfig, pts0, nrm0):
    pts = [pts0]
    nrm = [nrm0]
    for _ in range(1, cfg.track_levels):
        p, n = preprocess.resize_points_normals(pts[-1], nrm[-1])
        pts.append(p)
        nrm.append(n)
    return tuple(pts), tuple(nrm)


def _use_coarse_band(cfg: DynamicFusionConfig, rows_t: int, cols_t: int) -> bool:
    """Coarse-to-fine raycast only pays off (and only samples densely
    enough) when the coarse grid is still a real image — tiny test frames
    would march ~15x20 rays and miss geometry between them."""
    f = cfg.raycast_coarse_factor
    return f > 1 and (rows_t // f) * (cols_t // f) >= 2048


def _raycast_seed(cfg: DynamicFusionConfig, dists: jnp.ndarray):
    """Expected surface distance per tracking ray, from the live dists map
    (holes filled with a local positive minimum so rays next to missing
    depth still march a short band). 0 where nothing is known; None when
    seeding is disabled (raycast_seed_margin == 0)."""
    if cfg.raycast_seed_margin <= 0.0:
        return None
    s = cfg.raycast_subsample
    d = dists[::s, ::s]
    big = jnp.where(d > 0, d, jnp.inf)
    near = jax.lax.reduce_window(
        big, jnp.inf, jax.lax.min, (5, 5), (1, 1), "SAME"
    )
    return jnp.where(d > 0, d, jnp.where(jnp.isfinite(near), near, 0.0))


def _temporal_band(
    cfg: DynamicFusionConfig,
    prev_can_points: jnp.ndarray,
    dists: jnp.ndarray,
):
    """Per-pixel march band for the model raycast from the previous frame's
    canonical model map UNION the live dists (cfg.raycast_temporal_band
    docstring): [min - m, max + m] over a 5x5 pixel window of both sources'
    surface distances. The model map is in the camera frame, so |p| IS the
    ray distance; one frame of pose change (mm-scale at tracking rates) is
    absorbed by the margin."""
    s = cfg.raycast_subsample
    t_prev = jnp.linalg.norm(prev_can_points, axis=-1)  # NaN where miss
    live = dists[::s, ::s]
    lo_src = jnp.minimum(
        jnp.where(jnp.isnan(t_prev), jnp.inf, t_prev),
        jnp.where(live > 0, live, jnp.inf),
    )
    hi_src = jnp.maximum(
        jnp.where(jnp.isnan(t_prev), -jnp.inf, t_prev),
        jnp.where(live > 0, live, -jnp.inf),
    )
    lo = jax.lax.reduce_window(lo_src, jnp.inf, jax.lax.min, (5, 5), (1, 1), "SAME")
    hi = jax.lax.reduce_window(hi_src, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME")
    m = cfg.raycast_band_margin
    any_hit = jnp.isfinite(lo)
    lo = jnp.where(any_hit, jnp.maximum(lo - m, 0.0), 0.0)
    hi = jnp.where(any_hit, hi + m, 0.0)
    return lo, hi


def _model_maps(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    warp: WarpField,
    pose: jnp.ndarray,
    t_seed: jnp.ndarray | None = None,
    dq_grid: jnp.ndarray | None = None,
    t_band: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    raycast_fn=None,
):
    """Raycast the canonical model at `pose` (at 1/cfg.raycast_subsample
    resolution, seeded by the live dists when given); return (tracking
    pyramid, canonical base-level maps). When cfg.track_against_warped the
    tracking maps are DQB-warped into the live frame (the paper's
    live-surface prediction; the reference raycasts canonical only,
    kinfu.cpp:297)."""
    shift = cfg.raycast_shift
    cam2vol = se3.compose(se3.inverse(_vol_pose(cfg)), pose)
    rows_t = cfg.rows // cfg.raycast_subsample
    cols_t = cfg.cols // cfg.raycast_subsample
    if t_band is None:
        t_band = (
            tsdf_ops.raycast_coarse_band(
                cfg, vol, cam2vol, cfg.intr.level(shift), rows_t, cols_t
            )
            if _use_coarse_band(cfg, rows_t, cols_t)
            else None
        )
    res = (raycast_fn or tsdf_ops.raycast)(
        cfg,
        vol,
        cam2vol,
        cfg.intr.level(shift),
        rows_t,
        cols_t,
        t_seed=t_seed,
        t_band=t_band,
    )
    if cfg.track_against_warped and not cfg.rigid_only:
        shape = res.points.shape
        pts_w = se3.transform_points(pose, res.points).reshape(-1, 3)
        nrm_w = se3.rotate_dirs(pose, res.normals).reshape(-1, 3)
        if dq_grid is not None:
            # trilinear blend of the frame's shared coarse node-DQ grid
            # (fusion.coarse_dq_grid) — 8 row gathers/point instead of a
            # KNN over the node set
            wp, wn = fusion.warp_points_trilinear(cfg, dq_grid, pts_w, nrm_w)
        else:
            wp, wn = warpfield.warp_points(
                warp, pts_w, nrm_w, k=cfg.knn_k, method=cfg.knn_method
            )
        w2c = se3.inverse(pose)
        track_pts = se3.transform_points(w2c, wp).reshape(shape)
        track_nrm = se3.rotate_dirs(w2c, wn).reshape(shape)
    else:
        track_pts, track_nrm = res.points, res.normals
    pyr = _pyramid_from_maps(cfg, track_pts, track_nrm)
    return pyr, res.points, res.normals


def _box_sum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Separable (w x w) box-filter SUM over the leading two axes of
    (H, W, C)."""
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (w, 1, 1), (1, 1, 1), "SAME")
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, w, 1), (1, 1, 1), "SAME")


def _p2p_gate(
    cfg: DynamicFusionConfig,
    live_pts_w: jnp.ndarray,    # (Ht, Wt, 3) live surface, world frame
    live_nrm_w: jnp.ndarray,    # (Ht, Wt, 3) live normals, world frame
    prev_model_w: jnp.ndarray,  # (Ht, Wt, 3) previous warped model, world frame
    cam_z: jnp.ndarray,         # (Ht, Wt) live camera-frame depth (NaN ok)
) -> jnp.ndarray:
    """The ADAPTIVE APERTURE GATE (round 5): a per-pixel weight in [0, 1]
    for the tangential point-to-point data term, from a windowed
    translation-model fit of the apparent per-frame motion field.

    The aperture problem is motion-class-dependent (round-4 hold-out
    finding, CLAUDE.md): tangential p2p pull is RIGHT for articulated
    parts (the hinge scissor under-tracked without it) and WRONG for
    traveling deformation waves (the bulge hold-out regressed 2x with a
    uniform blend — material correspondence is ambiguous under a wave).
    Per pixel this computes, over a box window of the observable motion
    b = n . (live - W(canonical)) (the component point-to-plane sees):

    - N = sum n n^T, the normal second-moment. Its normalized
      determinant measures whether the window's geometry can OBSERVE a
      3-dof translation at all: a flat patch (bulge plane, cloth sheet)
      has det ~ 0 — any tangential "motion" there is gauge, and dragging
      material along it is how the wave failure happens. A curved patch
      (sphere faces) has det >> 0 — tangential motion is triangulated by
      the normal diversity, which is exactly when p2p is informative.
    - the fraction of the b-energy explained by the single best-fit
      translation t (solve N t = sum n b): low when the window's motion
      is incoherent (association garbage, depth-edge mixing, pure
      noise), high for a coherently translating patch.

    gate = clip(det(N/S) / cond0) * clip((explained - fit0)/(1 - fit0)).

    The window is DEPTH-BINNED (a separable approximation of a bilateral
    window): each pixel aggregates only surface within +-1 depth bin
    (~0.1 m) of its own. Without it, a window centered on an object
    mixes in the background plane behind its silhouette, which dilutes
    the object's normal diversity below the flat-scene level and kills
    the discrimination; with it, an object window sees the OBJECT's
    normals (det high) while a bump-on-plane window still sees its own
    connected flat surroundings (det low) — which is exactly the
    segment-level distinction the motion classes need. Cost: separable
    box sums over 11 x nbins channels + a batched 3x3 solve at the
    model-map resolution (sub-ms class)."""
    w = cfg.solver_p2p_gate_window
    delta = live_pts_w - prev_model_w
    n = live_nrm_w
    valid = jnp.isfinite(delta).all(-1) & jnp.isfinite(n).all(-1)
    nz = jnp.where(valid[..., None], jnp.nan_to_num(n), 0.0)
    b = jnp.where(valid, jnp.sum(nz * jnp.nan_to_num(delta), -1), 0.0)

    # channels: [S, xx, yy, zz, xy, xz, yz, bx, by, bz, bb]
    nx, ny, nzz = nz[..., 0], nz[..., 1], nz[..., 2]
    feats = jnp.stack(
        [
            valid.astype(jnp.float32),
            nx * nx, ny * ny, nzz * nzz,
            nx * ny, nx * nzz, ny * nzz,
            nx * b, ny * b, nzz * b,
            b * b,
        ],
        axis=-1,
    )
    # depth-binned sums: feats spread over nbins one-hot depth bins,
    # box-summed per bin, then each pixel gathers its own bin +-1
    nbins = 16
    z_lo, z_hi = 0.3, 1.9
    bw = (z_hi - z_lo) / nbins
    zb = jnp.clip(
        jnp.floor((jnp.nan_to_num(cam_z, nan=-1.0) - z_lo) / bw).astype(jnp.int32),
        0, nbins - 1,
    )
    oh = jax.nn.one_hot(zb, nbins, dtype=jnp.float32) * valid[..., None]
    fb = (feats[..., None, :] * oh[..., :, None]).reshape(
        *feats.shape[:2], nbins * feats.shape[-1]
    )
    sb = _box_sum(fb, w).reshape(*feats.shape[:2], nbins, feats.shape[-1])
    def gather(i):
        ok = (i >= 0) & (i < nbins)
        g = jnp.take_along_axis(
            sb, jnp.clip(i, 0, nbins - 1)[..., None, None], axis=-2
        )[..., 0, :]
        return g * ok[..., None]

    s = gather(zb - 1) + gather(zb) + gather(zb + 1)
    cnt = s[..., 0]
    g = s[..., 7:10]
    bb = s[..., 10]
    cnt1 = jnp.maximum(cnt, 1.0)

    # CLOSED-FORM symmetric 3x3 det + adjugate solve (jnp.linalg.det/
    # solve lower to batched LU — a measured ~40 ms/frame disaster for
    # 19200 tiny matrices on TPU; the explicit formulas are a handful of
    # fused VPU multiplies)
    reg = 1e-3 * cnt1
    a11 = s[..., 1] + reg
    a22 = s[..., 2] + reg
    a33 = s[..., 3] + reg
    a12, a13, a23 = s[..., 4], s[..., 5], s[..., 6]
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    det_r = a11 * c11 + a12 * c12 + a13 * c13  # det of the regularized N
    inv_det = 1.0 / jnp.maximum(det_r, 1e-30)
    g1, g2, g3 = g[..., 0], g[..., 1], g[..., 2]
    t1 = (c11 * g1 + c12 * g2 + c13 * g3) * inv_det
    t2 = (c12 * g1 + c22 * g2 + c23 * g3) * inv_det
    t3 = (c13 * g1 + c23 * g2 + c33 * g3) * inv_det
    expl = (t1 * g1 + t2 * g2 + t3 * g3) / jnp.maximum(bb, 1e-12)

    # conditioning: det of the per-sample-normalized (UNregularized)
    # second moment
    b11, b22, b33 = s[..., 1], s[..., 2], s[..., 3]
    cond = (
        b11 * (b22 * b33 - a23 * a23)
        + a12 * (a13 * a23 - a12 * b33)
        + a13 * (a12 * a23 - a13 * b22)
    ) / (cnt1 * cnt1 * cnt1)
    gate_cond = jnp.clip(cond / cfg.solver_p2p_gate_cond, 0.0, 1.0)
    f0 = cfg.solver_p2p_gate_fit
    gate_fit = jnp.clip((expl - f0) / max(1.0 - f0, 1e-6), 0.0, 1.0)
    enough = cnt > 0.15 * (w * w)
    gate = jnp.clip(cfg.solver_p2p_gate_gain * gate_cond * gate_fit, 0.0, 1.0)
    return jnp.where(enough, gate, 0.0)


def init_state(cfg: DynamicFusionConfig) -> PipelineState:
    shift = cfg.raycast_shift

    # fresh arrays per field — the jitted step donates the state, and
    # donation rejects aliased leaves
    def zero_maps():
        return tuple(
            jnp.full((cfg.rows >> (l + shift), cfg.cols >> (l + shift), 3), jnp.nan)
            for l in range(cfg.track_levels)
        )

    return PipelineState(
        vol=volume_model.create(cfg),
        warp=warpfield.create(cfg),
        pose=se3.identity(),
        prev_points=zero_maps(),
        prev_normals=zero_maps(),
        can_points=zero_maps()[0],
        can_normals=zero_maps()[0],
        frame_idx=jnp.zeros((), jnp.int32),
    )


def first_frame(cfg: DynamicFusionConfig, state: PipelineState, depth_mm: jnp.ndarray) -> PipelineState:
    """Frame 0: rigid-integrate, sample warp nodes from the extracted
    surface, raycast the model (kinfu.cpp:245-264)."""
    dists = preprocess.compute_dists(cfg.intr, depth_mm)
    vol2cam = se3.compose(se3.inverse(state.pose), _vol_pose(cfg))
    vol = tsdf_ops.integrate(cfg, state.vol, dists, vol2cam, cfg.intr)

    # min_weight=1: after the single frame-0 integrate every observed voxel
    # has weight exactly 1 — the evidence threshold would sample no nodes.
    # The cap must EXCEED the scene's crossing count: extract_cloud's
    # nonzero truncates in x-major voxel order, so an undersized cap
    # samples frame-0 nodes ONLY from the low-x surface — measured (round
    # 5, hinge hold-out): the +x sphere ends at 0.61 surface coverage vs
    # 0.92 for -x because it never gets warp support. ~250k crossings at
    # the bench scene vs the old max_nodes*node_sample_step = 51200 cap.
    cloud = tsdf_ops.extract_cloud(
        cfg,
        vol,
        max_points=max(cfg.max_nodes * cfg.node_sample_step, 1 << 20),
        min_weight=1.0,
    )
    warp = warpfield.init_from_cloud(cfg, cloud.points, cloud.valid)

    (prev_pts, prev_nrm), can_pts, can_nrm = _model_maps(
        cfg, vol, warp, state.pose, t_seed=_raycast_seed(cfg, dists)
    )
    return PipelineState(
        vol=vol,
        warp=warp,
        pose=state.pose,
        prev_points=prev_pts,
        prev_normals=prev_nrm,
        can_points=can_pts,
        can_normals=can_nrm,
        frame_idx=state.frame_idx + 1,
    )


def step(
    cfg: DynamicFusionConfig,
    state: PipelineState,
    depth_mm: jnp.ndarray,
    warp_system_fn=None,
    warp_eval_fn=None,
    integrate_fn=None,
    warp_solve_fn=None,
    raycast_fn=None,
) -> Tuple[PipelineState, StepOutputs]:
    """One full DynamicFusion frame (KinFu::operator() + dynamicfusion()).

    ``warp_system_fn``: optional normal-equation assembly override for the
    warp solve (warp_solver.solve's system_fn) — the sharded pipeline step
    passes parallel.distributed_gn.make_system_fn here so the GN assembly
    runs through the explicit shard_map+psum Schur reduction instead of
    whatever GSPMD infers. ``warp_eval_fn``: its lagged-JtJ companion
    (distributed_gn.make_eval_fn). ``integrate_fn``: optional non-rigid
    fusion override (parallel.sharded_fusion.make_sharded_integrate —
    per-shard brick lists, zero collectives); it receives the fusion gate
    as ``enabled`` and masks internally instead of the lax.cond below
    (shard_map under lax.cond is SPMD-partitioner poison, CLAUDE.md).
    ``warp_solve_fn(field, inputs) -> (field, stats)``: full override of
    the warp solve (parallel.distributed_gn.make_sharded_solve — the
    distributed-PCG mode whose whole LM loop runs in one shard_map);
    takes precedence over warp_system_fn/warp_eval_fn."""
    shift = cfg.raycast_shift
    stride = max(1, cfg.solver_point_stride // cfg.raycast_subsample)

    # ---- 1. preprocess ----
    _, pts_pyr, nrm_pyr, dists = preprocess.build_frame_pyramid(cfg, depth_mm)

    # ---- 2. rigid camera tracking (frame-to-model) ----
    # the model maps live at pyramid level `shift`; track on levels
    # shift..end with the matching live pyramid slices
    icp_res = icp.estimate_transform(
        cfg,
        list(pts_pyr[shift:]),
        list(nrm_pyr[shift:]),
        list(state.prev_points),
        list(state.prev_normals),
        level_offset=shift,
    )
    pose = se3.compose(state.pose, icp_res.transform)  # poses_.back() * affine
    # on ICP failure the reference resets; here we keep the old pose and
    # flag it (the driver can reset)
    pose = jnp.where(icp_res.ok, pose, state.pose)

    if cfg.rigid_only:
        # plain KinectFusion: rigid integrate + raycast, identity warp.
        # Integration is gated on ICP health like the non-rigid path (the
        # reference aborts the frame before fusing, kinfu.cpp:276-277).
        vol2cam = se3.compose(se3.inverse(pose), _vol_pose(cfg))
        vol, bcounts = jax.lax.cond(
            icp_res.ok,
            lambda: tsdf_ops.integrate(
                cfg, state.vol, dists, vol2cam, cfg.intr, with_counts=True
            ),
            lambda: (state.vol, jnp.zeros((3,), jnp.int32)),
        )
        (prev_pts, prev_nrm), can_pts, can_nrm = _model_maps(
            cfg, vol, state.warp, pose, t_seed=_raycast_seed(cfg, dists),
            t_band=(
                _temporal_band(cfg, state.can_points, dists)
                if cfg.raycast_temporal_band
                else None
            ),
            raycast_fn=raycast_fn,
        )
        new_state = PipelineState(
            vol=vol,
            warp=state.warp,
            pose=pose,
            prev_points=prev_pts,
            prev_normals=prev_nrm,
            can_points=can_pts,
            can_normals=can_nrm,
            frame_idx=state.frame_idx + 1,
        )
        zero = jnp.zeros(())
        outputs = StepOutputs(
            icp_ok=icp_res.ok,
            pose=pose,
            solver_cost0=zero,
            solver_cost1=zero,
            node_count=state.warp.count,
            brick_counts=bcounts,
            model_points=prev_pts[0],
            model_normals=prev_nrm[0],
        )
        return new_state, outputs

    # ---- 3. canonical model surface seen from the new pose ----
    if cfg.reuse_model_raycast:
        # the previous frame's canonical model raycast (camera frame at the
        # OLD pose) is the canonical surface — saves a full-volume raycast;
        # the association error is one frame of camera motion
        can_pts_w = se3.transform_points(state.pose, state.can_points)
        can_nrm_w = se3.rotate_dirs(state.pose, state.can_normals)
    else:
        cam2vol = se3.compose(se3.inverse(_vol_pose(cfg)), pose)
        rows_t = cfg.rows // cfg.raycast_subsample
        cols_t = cfg.cols // cfg.raycast_subsample
        if cfg.raycast_temporal_band:
            band = _temporal_band(cfg, state.can_points, dists)
        else:
            band = (
                tsdf_ops.raycast_coarse_band(
                    cfg, state.vol, cam2vol, cfg.intr.level(shift), rows_t, cols_t
                )
                if _use_coarse_band(cfg, rows_t, cols_t)
                else None
            )
        model = (raycast_fn or tsdf_ops.raycast)(
            cfg,
            state.vol,
            cam2vol,
            cfg.intr.level(shift),
            rows_t,
            cols_t,
            t_seed=_raycast_seed(cfg, dists),
            t_band=band,
        )
        can_pts_w = se3.transform_points(pose, model.points)
        can_nrm_w = se3.rotate_dirs(pose, model.normals)
    # live surface in world frame (at the model-map resolution). The
    # SOLVER's live points come from the RAW depth — the same source fusion
    # integrates. Using the bilateral-FILTERED pyramid here leaves a
    # persistent mm-scale discrepancy between the (raw-integrated)
    # canonical model and the solve's targets, which the solver dutifully
    # absorbs as phantom deformation, growing every frame (measured
    # ~0.8 mm/frame on a static scene until tracking failed). Normals stay
    # filtered (they only set the point-to-plane residual direction and
    # raw normals are noisy).
    if cfg.solver_live_raw:
        sub = cfg.raycast_subsample
        raw_pts, _ = preprocess.compute_points_normals(
            cfg.intr.level(shift), depth_mm[::sub, ::sub]
        )
    else:
        raw_pts = pts_pyr[shift]
    live_pts_w = se3.transform_points(pose, raw_pts)
    live_nrm_w = se3.rotate_dirs(pose, nrm_pyr[shift])

    sub = lambda a: a[::stride, ::stride].reshape(-1, 3)
    if cfg.solver_p2p_weight > 0.0 and cfg.solver_p2p_adaptive:
        # adaptive aperture gate for the tangential p2p term, computed
        # against the PREVIOUS warped model map (the field's current
        # live-surface prediction, pixel-associated like ICP); uses the
        # bilateral-FILTERED live surface — the gate wants the motion
        # field's structure, not raw sensor noise
        prev_model_w = se3.transform_points(state.pose, state.prev_points[0])
        gate = _p2p_gate(
            cfg,
            se3.transform_points(pose, pts_pyr[shift]),
            live_nrm_w,
            prev_model_w,
            pts_pyr[shift][..., 2],
        )
        gate_sub = gate[::stride, ::stride].reshape(-1, 1)
    else:
        gate_sub = None
    inputs = warp_solver.WarpSolveInputs(
        p_can=sub(can_pts_w),
        n_can=sub(can_nrm_w),
        p_live=sub(live_pts_w),
        n_live=sub(live_nrm_w),
        p2p_gate=gate_sub,
    )

    # ---- 4a. rigid pre-alignment (two-step optimization) ----
    # residual camera-pose error is claimed by the pose HERE, so the warp
    # solve below only sees true deformation — without this the field
    # absorbs pose error and ICP loses its restoring force (drift
    # random-walks to tracking failure; see warp_solver.rigid_prealign)
    if cfg.solver_rigid_prealign:
        t_pre = warp_solver.rigid_prealign(cfg, state.warp, inputs)
        pose = jnp.where(icp_res.ok, se3.compose(t_pre, pose), pose)
        inputs = inputs._replace(
            p_live=se3.transform_points(t_pre, inputs.p_live),
            n_live=se3.rotate_dirs(t_pre, inputs.n_live),
        )

    # ---- 4. non-rigid warp-field solve ----
    if warp_solve_fn is not None:
        warp, stats = warp_solve_fn(state.warp, inputs)
    else:
        warp, stats = warp_solver.solve(
            cfg, state.warp, inputs, system_fn=warp_system_fn, eval_fn=warp_eval_fn
        )
    if cfg.solver_remove_net_rigid:
        # optional belt-and-suspenders gauge anchor (off by default: the
        # rigid prealign above prevents absorption at the source, and full
        # removal distorts deformations whose VISIBLE part has a net rigid
        # component — e.g. the camera-facing side of a breathing sphere)
        warp = warpfield.remove_net_rigid(
            state.warp, warp, alpha=cfg.solver_net_rigid_alpha
        )
    # ---- 4b. ICP-health gate ----
    # A frame whose rigid tracking failed must leave the model UNTOUCHED —
    # the on-device equivalent of the reference's frame abort
    # (kinfu.cpp:276-277, which resets before any fusion). The solve above
    # still executed (its system_fn may be a shard_map, which cannot sit
    # inside lax.cond without pathological SPMD compiles — see CLAUDE.md),
    # but its result is discarded; fusion and node insertion below are
    # predicated on icp_ok, so the volume and warp field carry over
    # bit-identical and the driver's explicit-reset contract still holds.
    warp = jax.tree_util.tree_map(
        lambda new, old: jnp.where(icp_res.ok, new, old), warp, state.warp
    )

    # the frame's ONE exact KNN+DQB evaluation of the solved field, shared
    # by fusion (voxel warp + observation quality) and the model-map warp
    # (insertion-seeded nodes below barely perturb the blended field —
    # their dq is seeded FROM it)
    full_scale = inputs.p_can.shape[0] > 8192
    if full_scale or cfg.fusion_quality_weight:
        dq_grid, q_grid = fusion.coarse_field(cfg, warp)
    else:
        dq_grid, q_grid = None, None

    # ---- 5. non-rigid fusion into the canonical volume ----
    # gated on ICP health (see 4b) and the fusion interval; lax.cond
    # executes only the taken branch. With fusion_phase_split = S, fusion
    # fires every interval/S frames on 1/S of the brick x-planes (phase
    # rotates), so each voxel keeps its every-interval cadence while the
    # per-frame fusion spike divides by ~S (config docstring).
    fsplit = cfg.fusion_phase_split
    sub_interval = max(cfg.fusion_interval // fsplit, 1)
    fuse_now = icp_res.ok & (state.frame_idx % sub_interval == 0)
    fuse_phase = (state.frame_idx // sub_interval) % fsplit
    if cfg.fusion_incidence_weight:
        # per-pixel RAW |cos| of the live normal against the viewing ray,
        # at the full-res pixels fusion looks up (config flag docstring);
        # invalid pixels carry 0. The weight floor
        # (fusion_incidence_floor) and the optional projective-SDF scale
        # (fusion_sdf_incidence_scale) are applied at the fuse site
        # (bricks._fuse_rows / fusion.integrate_nonrigid), which needs
        # the unfloored cosine.
        p0, n0 = pts_pyr[0], nrm_pyr[0]
        pn = p0 / jnp.maximum(jnp.linalg.norm(p0, axis=-1, keepdims=True), 1e-9)
        conf = jnp.nan_to_num(jnp.abs(jnp.sum(n0 * pn, axis=-1)))
    else:
        conf = None
    if integrate_fn is not None:
        vol, bcounts = integrate_fn(
            cfg, state.vol, warp, dists, se3.inverse(pose), cfg.intr,
            with_counts=True, dq_grid=dq_grid, q_grid=q_grid,
            enabled=fuse_now, conf=conf, phase=fuse_phase,
        )
    else:
        vol, bcounts = jax.lax.cond(
            fuse_now,
            lambda: fusion.integrate_nonrigid(
                cfg, state.vol, warp, dists, se3.inverse(pose), cfg.intr,
                with_counts=True, dq_grid=dq_grid, q_grid=q_grid, conf=conf,
                phase=fuse_phase, split=fsplit,
            ),
            lambda: (state.vol, jnp.zeros((3,), jnp.int32)),
        )

    # ---- 6. warp-field extension (unsupported surface -> new nodes) ----
    # candidates come from a failed frame's stale association — masked out
    # wholesale when ICP failed (see 4b)
    ins = cfg.node_insert_stride if full_scale else 1
    warp = warpfield.insert_nodes(
        cfg, warp, inputs.p_can[::ins],
        icp_res.ok & ~jnp.isnan(sub(can_pts_w)[::ins, 0]),
        frame_idx=state.frame_idx,
    )

    # ---- 7. model raycast for display and next-frame tracking ----
    # (grid-based map warp only at full scale — tiny test volumes have too
    # few coarse cells for the trilinear blend to track the exact warp)
    (prev_pts, prev_nrm), can_pts, can_nrm = _model_maps(
        cfg, vol, warp, pose, t_seed=_raycast_seed(cfg, dists),
        dq_grid=dq_grid if full_scale else None,
        t_band=(
            _temporal_band(cfg, state.can_points, dists)
            if cfg.raycast_temporal_band
            else None
        ),
        raycast_fn=raycast_fn,
    )

    new_state = PipelineState(
        vol=vol,
        warp=warp,
        pose=pose,
        prev_points=prev_pts,
        prev_normals=prev_nrm,
        can_points=can_pts,
        can_normals=can_nrm,
        frame_idx=state.frame_idx + 1,
    )
    outputs = StepOutputs(
        icp_ok=icp_res.ok,
        pose=pose,
        solver_cost0=stats.initial_cost,
        solver_cost1=stats.final_cost,
        node_count=warp.count,
        brick_counts=bcounts,
        model_points=prev_pts[0],
        model_normals=prev_nrm[0],
    )
    return new_state, outputs


@functools.lru_cache(maxsize=64)
def _jitted_first(cfg: DynamicFusionConfig):
    # donate_argnums=0: the pre-frame state's buffers (the ~134 MB volume
    # included) are reused for the output instead of copied — callers never
    # touch the previous state object after a step (and device snapshots
    # must np.asarray BEFORE stepping, which tests already do)
    return jax.jit(lambda s, d: first_frame(cfg, s, d), donate_argnums=0)


@functools.lru_cache(maxsize=64)
def _jitted_step(cfg: DynamicFusionConfig):
    return jax.jit(lambda s, d: step(cfg, s, d), donate_argnums=0)


class DynamicFusion:
    """Host-side driver: owns the jitted step functions and the state.

    Mirrors the reference's ``KinFu`` public surface: call it per frame with
    a uint16-mm depth image; ``get_pose``, ``render`` etc. — but the whole
    per-frame computation stays on device."""

    def __init__(self, cfg: DynamicFusionConfig):
        if cfg.rigid_only and cfg.raycast_refine in ("newton8", "newton16"):
            # structural de-mine (round 4): the Newton refines carry a
            # measured grazing-incidence crossing bias that breaks RIGID
            # tracking at coarse volumes (64^3 3-frame orbit: 37-44 mm pose
            # error vs 3.5 mm secant — config.raycast_refine); the warp
            # solve that absorbs it in non-rigid mode doesn't exist here.
            # Five cheaper hybrid variants were tried and none passed the
            # orbit gate (ops/tsdf.py "hybrid16"), so rigid mode pins the
            # secant refine instead of trusting preset discipline.
            import dataclasses

            cfg = dataclasses.replace(cfg, raycast_refine="secant")
        self.cfg = cfg
        self._state = init_state(cfg)
        self._first = _jitted_first(cfg)
        self._step = _jitted_step(cfg)
        self.last_outputs: StepOutputs | None = None
        self._started = False
        self.poses = [jnp.eye(4)]  # trajectory (KinFu::poses_, kinfu.hpp:86)

    @property
    def state(self) -> PipelineState:
        return self._state

    @state.setter
    def state(self, s: PipelineState):
        """Direct assignment (checkpoint restore without restore(), tests)
        re-syncs the host-side first-frame flag from the state's frame_idx
        so a mid-sequence state can never route through first_frame again.
        The int() fetch blocks on the device scalar — fine for the rare
        external assignment; the per-frame loop writes self._state
        directly and never pays it (the round-4 dispatch-bubble fix)."""
        self._state = s
        self._started = int(s.frame_idx) > 0
        self.last_outputs = None

    def __call__(self, depth_mm, block: bool = True) -> bool:
        """Process one frame. With block=False the call only dispatches
        (JAX async) and returns True — consecutive frames then pipeline on
        device with no host sync in the loop (the streaming mode of
        BASELINE config 4); read ``last_ok`` / ``last_outputs`` to sync.

        The first-frame branch runs off a HOST flag, not the device
        frame_idx: fetching a scalar from the previous step's state here
        would block dispatch on the previous frame's completion every
        frame — a measured ~20 ms/frame pipeline bubble through the axon
        tunnel (round 4). Restoring a mid-sequence state from a
        checkpoint goes through ``restore()``, which sets the flag."""
        depth_mm = jnp.asarray(depth_mm, jnp.uint16)
        if not self._started:
            self._state = self._first(self._state, depth_mm)
            self._started = True
            return False
        self._state, self.last_outputs = self._step(self._state, depth_mm)
        self.poses.append(self.last_outputs.pose)
        return self.last_ok if block else True

    def restore(self, state: PipelineState):
        """Adopt a (checkpoint-loaded) state; subsequent calls run full
        steps unless the state is a frame-0 init state. (Equivalent to
        assigning ``self.state`` — kept for API clarity.)"""
        self.state = state

    @property
    def last_ok(self) -> bool:
        return bool(self.last_outputs.icp_ok) if self.last_outputs is not None else False

    def reset(self):
        self._state = init_state(self.cfg)
        self._started = False
        self.last_outputs = None
        self.poses = [jnp.eye(4)]

    def get_pose(self, time: int = -1):
        """Camera pose at frame `time` (KinFu::getCameraPose,
        kinfu.cpp:215-221; out-of-range -> latest)."""
        if not (-len(self.poses) <= time < len(self.poses)):
            time = -1
        return self.poses[time]

    def extract_mesh(self, live: bool = False):
        """Triangle mesh of the canonical surface (marching tetrahedra over
        the TSDF zero crossing). With live=True the vertices are DQB-warped
        by the current field into the live frame — the deformed surface.
        New capability vs the reference (Report.md:57 lists mesh export as
        future work)."""
        from dynamicfusion_tpu.io import export as export_mod
        from dynamicfusion_tpu.models import warpfield as wf

        mesh = export_mod.extract_mesh(self.cfg, self.state.vol)
        if live and len(mesh.vertices):
            v, n = wf.warp_points(
                self.state.warp,
                jnp.asarray(mesh.vertices),
                jnp.asarray(mesh.normals),
                k=self.cfg.knn_k,
                method=self.cfg.knn_method,
            )
            import numpy as np

            mesh = mesh._replace(
                vertices=np.asarray(v, np.float32),
                normals=np.asarray(n, np.float32),
            )
        return mesh

    def save_mesh(self, path: str, live: bool = False):
        """Extract and write the surface mesh (.ply binary / .obj)."""
        from dynamicfusion_tpu.io import export as export_mod

        export_mod.save_mesh(path, self.extract_mesh(live=live))

    def save_cloud(self, path: str):
        """Write the extracted canonical surface point cloud
        (fetchCloud/fetchNormals equivalent, tsdf_volume.cpp:181-218)."""
        from dynamicfusion_tpu.io import export as export_mod
        from dynamicfusion_tpu.ops import tsdf as tsdf_ops_mod

        cloud = tsdf_ops_mod.extract_cloud(
            self.cfg, self.state.vol, max_points=1 << 20
        )
        export_mod.save_ply(path, cloud.points)

    def render(self, mode: int = 0, pose=None):
        """Render the model: from the last raycast (KinFu::renderImage,
        kinfu.cpp:312-337) or, with `pose`, from an arbitrary viewpoint via
        a fresh raycast (kinfu.cpp:408-436)."""
        from dynamicfusion_tpu.pipeline import render as render_mod

        if pose is None:
            return render_mod.render_state(self.cfg, self.state, mode)
        cfg = self.cfg
        cam2vol = se3.compose(se3.inverse(_vol_pose(cfg)), jnp.asarray(pose))
        res = tsdf_ops.raycast(cfg, self.state.vol, cam2vol, cfg.intr, cfg.rows, cfg.cols)
        return render_mod.render_maps(cfg, res.points, res.normals, mode)
