"""Pipeline configuration.

Mirrors the reference's ``KinFuParams`` knob set (see
/root/reference/kfusion/include/kfusion/kinfu.hpp:15-47 and the two presets in
/root/reference/kfusion/src/kinfu.cpp:14-89) as a frozen dataclass that is
hashable, so a config can be a static argument to ``jax.jit``.

All distances are meters, angles radians, image sizes pixels. Depth input is
uint16 millimeters (the Kinect convention the reference uses throughout).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Pinhole camera intrinsics.

    Equivalent of the reference's ``kfusion::Intr``
    (/root/reference/kfusion/include/kfusion/types.hpp:20-29); ``level``
    reproduces ``Intr::operator()(int)``
    (/root/reference/kfusion/src/precomp.cpp:10-14): all four parameters are
    divided by ``2**level_index`` for pyramid levels.
    """

    fx: float
    fy: float
    cx: float
    cy: float

    def level(self, level_index: int) -> "Intrinsics":
        div = float(1 << level_index)
        return Intrinsics(self.fx / div, self.fy / div, self.cx / div, self.cy / div)


@dataclasses.dataclass(frozen=True)
class DynamicFusionConfig:
    """All pipeline knobs, defaulting to the reference's dynamicfusion preset
    (/root/reference/kfusion/src/kinfu.cpp:14-49)."""

    # Frame geometry
    rows: int = 480
    cols: int = 640
    intr: Intrinsics = Intrinsics(570.342, 570.342, 320.0, 240.0)

    # TSDF volume: cubic grid of volume_dims voxels spanning volume_size meters,
    # positioned with its (0,0,0) voxel at volume_origin in world coordinates
    # (the reference's volume_pose translate(-s/2, -s/2, 0.5)).
    volume_dims: int = 256
    volume_size: float = 1.0
    volume_origin: Tuple[float, float, float] = (-0.5, -0.5, 0.5)

    # Depth preprocessing
    bilateral_sigma_depth: float = 0.04      # meters
    bilateral_sigma_spatial: float = 4.5     # pixels
    bilateral_kernel_size: int = 7           # pixels
    icp_truncate_depth_dist: float = 0.0     # meters; 0 = disabled
    pyramid_levels: int = 4

    # Rigid ICP
    icp_dist_thres: float = 0.1                          # meters
    icp_angle_thres: float = math.radians(30.0)          # radians
    icp_iters: Tuple[int, ...] = (10, 5, 4, 0)           # fine -> coarse
    # early exit: a level stops iterating once the GN twist-step norm falls
    # below this (the schedule above is the cap; warm-started frames
    # typically converge in a fraction of it). 0 disables.
    icp_step_tol: float = 1e-5
    # Residual-row stride at the FINEST ICP level (1 = every pixel, the
    # reference's behavior). The finest level's 6x6 system is built from
    # ~77k rows for 6 dof at the bench shape; stride 2 keeps ~19k rows and
    # full-resolution association targets (solvers/icp.py) — the
    # level's per-iteration cost drops ~4x.
    icp_finest_stride: int = 1

    # TSDF integration
    tsdf_trunc_dist: float = 0.04    # meters
    tsdf_max_weight: int = 64        # frames
    tsdf_min_camera_movement: float = 0.0
    # "brick" = sparse skip/front/band brick classification (ops/bricks.py;
    # ~6x faster at 256^3 — the depth image only constrains the truncation
    # band); "dense" = one random image gather per voxel (reference-shaped).
    integrate_mode: str = "brick"
    brick_size: int = 16             # voxels per brick axis
    # Static caps on per-class brick counts (processing cost is the cap, not
    # the runtime count; overflowing bricks keep stale values one frame —
    # size with scripts/profile_phases.py / bricks.brick_counts).
    integrate_band_cap: int = 2048
    # wide-brick fallback cap: the wide path pays cap*B^3 random gathers
    # UNCONDITIONALLY (static shapes), ~4.6 ms at 128; bench scenes have 0
    # wide bricks (objects >= 0.56 m put every footprint inside rect=64)
    integrate_wide_cap: int = 128
    # band depth-lookup window (pixels): must cover a brick's image
    # footprint at its nearest scene distance (brick_size * voxel_size *
    # fx / z); 128 px covers a 16-voxel brick beyond ~0.28 m. Window cost
    # scales ~linearly in rect with the row-gather + bf16-split lookup
    # (ops/bricks._rect_lookup); bricks whose footprint exceeds it fall
    # back to the wide path (counted, capped — rect 64 measured overflowing
    # the wide cap at the bench scene: stale voxels).
    integrate_rect: int = 128

    # Raycasting
    raycast_step_factor: float = 0.75     # in truncation distances
    gradient_delta_factor: float = 0.5    # in voxel sizes
    # Tracking/model raycast resolution divisor: rays marched at
    # (rows/s, cols/s). Random volume gathers are the raycast cost on TPU;
    # the model maps feed ICP (which gains a matching level shift) and the
    # warp solver (which subsamples anyway). 1 = reference-exact.
    # Measured (v5e, bench shape, round 3): s=4 is 44 ms/frame faster than
    # s=2 with BETTER quality on the deforming-sphere bench (noise on,
    # median 1.14 vs 1.34 mm, p95 3.7 vs 4.1 at 10 frames; p95 13.4 vs
    # 20.4 mm on the 25-frame noiseless tail run) — the solver's residual
    # set is stride-subsampled to the same ~19k points either way, and
    # ICP at 160x120 still has ~3000x redundancy for 6 dof.
    raycast_subsample: int = 4
    # Seed the tracking raycast's march from the live frame's dists map:
    # seeded rays march only [seed - m, seed + m] instead of the whole
    # volume (~30% fewer march gathers). 0 disables (default): rays whose
    # in-band march misses the model return nothing where a full march
    # would find the background — measurably worse tracking on
    # weakly-conditioned scenes (silhouette-ring constraints lost). Enable
    # for feature-rich scenes where raycast cost matters.
    raycast_seed_margin: float = 0.0
    # Coarse-to-fine march for the tracking/model raycast: a full march at
    # 1/factor resolution bounds each fine ray's march to the coarse 3x3
    # window's [min, max] hit band (ops/tsdf.raycast_coarse_band). 1
    # disables (full march). Unlike live-depth seeding this derives the
    # band from the MODEL surface itself, so silhouette rays keep their
    # constraints; the cost is losing structures thinner than ~2*factor
    # coarse pixels.
    raycast_coarse_factor: int = 4
    # band widening, meters: must cover surface variation inside a coarse
    # window plus a couple of march steps of free-space approach
    raycast_band_margin: float = 0.06
    # Cap on a ray's banded march length, meters (0 = off). Silhouette-
    # window bands span [nearest foreground, farthest background] and a few
    # such rays set the whole march's trip count; capped rays that would
    # only hit past the cap miss instead (background behind a silhouette).
    # NOTE: render_state reuses the (capped) tracking model maps, so an
    # enabled cap shows in the default renders too; render(pose=...) does a
    # fresh full march with no band and is unaffected. Measured -15 ms at
    # bench shape with raycast_subsample=2 (quality-neutral); only active
    # when the coarse-band prepass runs. Scaled to the scene: 0.25 m suits
    # the 1 m dynamicfusion volume; default_kinfu (3 m) disables it.
    raycast_band_cap: float = 0.25
    # Temporal march band: bound each frame's model raycast to the
    # per-pixel [min, max] surface distance of a 5x5 window over the UNION
    # of (a) the previous frame's model map and (b) the live dists map,
    # widened by raycast_band_margin (and capped by raycast_band_cap).
    # (a) keeps every surface the model knows — including background
    # behind silhouettes, the constraint live-depth seeding loses; (b)
    # covers surface that fusion added THIS frame before the model map
    # existed. Pixels where both sources miss don't march at all: the
    # model raycast there would all-but-certainly miss too (nothing was
    # there last frame and nothing is observed now) — the residual risk is
    # fast motion onto never-seen geometry, which the next frame's live
    # band recovers. Replaces the coarse-band prepass wherever active
    # (which self-disables at raycast_subsample=4 anyway; kinfu.step).
    # Off in the base default; default_dynamicfusion enables it
    # (quality-gated round 4).
    raycast_temporal_band: bool = False
    # Crossing refine: "secant" = two trilinear fetches bracketing + fused
    # Newton polish (24 gathers/pixel); "newton16" = nearest-value secant
    # start + TWO fused value/gradient fetches with clamped Newton steps
    # (16 gathers); "newton8" = one such fetch (8 gathers).
    # Measured (v5e, round 3): newton8 is 23 ms/frame faster than secant
    # at bench shape with raycast_subsample=2 (~6 ms at the default
    # subsample=4) and quality-neutral on the noise-on NON-rigid
    # deforming-sphere bench — but both Newton variants inherit a
    # grazing-incidence crossing bias from relying on the LOCAL in-cell
    # gradient (nearly zero along shallow rays), which breaks RIGID
    # tracking at coarse volumes: 64^3 orbit test pose error 37 mm
    # (newton8) / 44 mm (newton16) vs 3.5 mm secant. The secant's
    # average-slope-over-the-bracket is immune. Default stays secant;
    # the Newton variants are for non-rigid fine-volume runs where the
    # raycast is hot and the warp solve absorbs the residual bias —
    # rigid_only pipelines PIN secant structurally (kinfu.DynamicFusion).
    # "hybrid16" (round 4, experimental): 16-gather exact-two-point secant
    # — static accuracy equal to secant, but still 41 mm on the rigid
    # orbit gate; see the measured record in ops/tsdf.py.
    raycast_refine: str = "secant"
    # Adaptive march-step doubling in observed deep free space (2x the
    # base step where tsdf ~ +1). True is the single-chip default (a
    # measured march win); the sharded slab-local raycast always marches
    # FIXED steps on a globally aligned t-grid so every device samples
    # the same points (parallel/sharded_raycast.py) — set False to make
    # a single-device raycast bitwise-comparable to it.
    raycast_adaptive_step: bool = True
    # True = the reference's six-sample central-difference normals
    # (tsdf_volume.cu:408-426, 48 extra gathers/pixel); False = exact
    # in-cell gradient of the trilinear interpolant (8 gathers, shared with
    # the refine fetch).
    raycast_smooth_normals: bool = False

    # Warp field. KNN k matches the reference's KNN_NEIGHBOURS=8
    # (/root/reference/kfusion/include/kfusion/warp_field.hpp:10). node_radius
    # is dg_w; the reference hardcodes 3.0 via a FIXME
    # (/root/reference/kfusion/src/warp_field.cpp:44-48) — that value makes
    # every node cover the whole 1 m scene and is measurably unstable as a
    # default; it lives in the reference_parity() preset. The default here
    # is 2x node_coverage (the paper ties dg_w to the sampling resolution).
    knn_k: int = 8
    knn_method: str = "approx"  # "approx" (lax.approx_max_k, ~10x faster) | "exact"
    max_nodes: int = 1024          # static node capacity (padded+masked)
    node_sample_step: int = 50     # sample every Nth surface vertex as a node
    node_radius: float = 0.05      # dg_w, meters
    node_coverage: float = 0.025   # meters; insertion radius for new nodes
    # Adaptive per-node radius dg_w from local sampling density (paper
    # §3.4; the reference stores a per-node weight but FIXME-hardcodes
    # it, warp_field.cpp:44-48): radius = node_radius_scale x distance
    # to the node_radius_knn-th nearest node, clipped to
    # [node_radius_min, node_radius_max]. Uniform radius (False)
    # over-smooths dense regions and under-covers sparse ones.
    node_radius_adaptive: bool = False
    node_radius_knn: int = 4
    node_radius_scale: float = 1.0
    node_radius_min: float = 0.03
    node_radius_max: float = 0.1
    # Capacity lifecycle: when the node set is FULL, retire nodes with no
    # visible canonical surface within node_support_radius for more than
    # node_retire_after frames, freeing slots for new surface regions
    # (models/warpfield.insert_nodes). 0 disables retirement.
    node_retire_after: int = 60
    node_support_radius: float = 0.06
    # Insertion-candidate subsampling: the coverage test (1-NN over the
    # whole model map) doesn't need every pixel — a stride-s subset still
    # offers ~P/s candidates for <= max_nodes slots per frame; applied only
    # at full scale (P > 8192), like solver_hessian_stride.
    node_insert_stride: int = 4

    # Non-rigid Gauss-Newton / LM solver (replaces Ceres + Opt/Terra; the
    # reference's schedule is nonLinearIter=5, linearIter=100 PCG, LM
    # (/root/reference/kfusion/src/kinfu.cpp:114-121)).
    # The reference runs 5 nonlinear iterations (kinfu.cpp:116) on a
    # cold-started Opt solve; here the field warm-starts from the previous
    # frame and measured reconstruction error is identical at 3 (1.89 mm vs
    # 1.91 mm median on the deforming-sphere quality bench) for ~25% less
    # frame time.
    solver_nonlinear_iters: int = 3
    # PCG cap: LM tolerates inexact steps (accept/reject is on the true
    # cost), so 32 block-Jacobi iterations beat the reference Opt's 100
    # (kinfu.cpp:117) at equal reconstruction quality.
    solver_linear_iters: int = 32
    solver_lm_lambda_init: float = 1e-4
    solver_function_tolerance: float = 1e-6
    solver_point_stride: int = 2        # pixel subsampling for solver data term
    # Extra stride applied ONCE in prepare() to the whole solve data term
    # (cost, gradient, Hessian — one consistent objective): with P >> 6N the
    # surface is heavily oversampled; stride 6 leaves ~12.8k residuals for
    # 6k dof at the bench shape (measured quality-neutral vs 4, ~8 ms/frame
    # less A^T A assembly). Applied only when P > 8192; 1 = exact.
    solver_hessian_stride: int = 6
    # Linear solver inside each LM step: "pcg" = block-Jacobi-preconditioned
    # conjugate gradients (the reference Opt solver's GN+PCG structure,
    # kinfu.cpp:116-117; distributes via psum over node shards),
    # "direct" = dense Cholesky of the (6N, 6N) system. Measured on v5e at
    # N=1024: Cholesky 9.2 ms vs pcg32 21.3 ms (32 sequential matvecs lose
    # to one well-tiled factorization at this size), identical
    # reconstruction quality — direct is the single-chip default; pcg is
    # the scaling path (its matvec shards, Cholesky doesn't).
    solver_linear: str = "direct"
    solver_linear_tol: float = 1e-3     # PCG relative-residual stop
    # The solve's live targets come from the RAW depth (the source fusion
    # integrates) instead of the bilateral-filtered tracking pyramid: the
    # filter's mm-scale smoothing otherwise accumulates into the warp field
    # as phantom deformation (~0.8 mm/frame measured on a static scene).
    solver_live_raw: bool = True
    # Two-step optimization: robust 6-dof rigid fit of the live surface to
    # the warped canonical model, folded into the POSE before the non-rigid
    # solve (warp_solver.rigid_prealign; structure of arXiv:1906.08477).
    # Prevents the warp field from absorbing camera-pose error — which
    # otherwise removes ICP's restoring force and lets drift random-walk to
    # tracking failure (measured: static-scene blow-up by frame 5).
    solver_rigid_prealign: bool = True
    # Alternative/additional gauge anchor: project the net rigid component
    # out of each frame's warp increment (warpfield.remove_net_rigid).
    # OFF by default: full removal distorts deformations whose visible part
    # has a net rigid component (measured 1.71 -> 2.90 mm on the breathing
    # sphere), and the prealign above prevents absorption at the source.
    solver_remove_net_rigid: bool = False
    # fraction removed per frame (leaky gauge anchor) when enabled
    solver_net_rigid_alpha: float = 1.0
    # Tukey c: the paper's 0.01 m assumes noiseless association; with
    # point-to-plane residuals over a deforming surface the per-frame NEW
    # deformation itself reaches ~1 cm, so 0.01 rejects genuine motion as
    # outliers (measured tracking collapse on the deforming-sphere bench).
    # 0.05 keeps real motion in the quadratic regime while still rejecting
    # gross association errors. Paper values: reference_parity().
    solver_tukey_c: float = 0.05        # Tukey robust constant, meters
    solver_huber_delta: float = 1e-4    # Huber constant for ARAP edges
    solver_arap_weight: float = 10.0    # lambda for the regularization term
    solver_max_step: float = 0.5        # per-node twist-norm clamp per LM step
    # LM damping floor, as a fraction of the mean active diagonal: weakly
    # observed (silhouette) node blocks get at least this much relative
    # damping. Measured on a static stress scene: with the floor, field
    # displacement saturates (~15 mm) instead of creeping; tightening
    # solver_max_step instead HURTS (truncated steps leave persistent
    # misfit that accumulates into tracking failure).
    solver_damping_floor: float = 0.05
    point_to_plane: bool = True         # paper data term; False = point-to-point
    # Blend a sqrt(w)-weighted point-to-POINT component into the
    # point-to-plane data term (residual becomes (4,): [n.(Wv - l),
    # sqrt(w) (Wv - l)]). Point-to-plane alone cannot observe motion
    # TANGENTIAL to a smooth surface (the aperture problem) — the
    # hold-out hinge scene's scissor rotation exposed exactly this
    # (CLAUDE.md round-4 diagnosis: frontal coverage holes on the moving
    # sphere). The Tukey weight runs on the JOINT residual norm, so
    # gross projective-association errors still reject. 0 = off
    # (paper-pure).
    # MEASURED at 0.25 (v5e bench shape, 20 noise-on frames): hold-out
    # hinge med 1.45 -> 0.78 mm, p95 3.70 -> 2.37, coverage 0.75 -> 0.81;
    # sphere battery equal error with coverage 0.95 -> 0.97; noiseless
    # tail p95 9.3 -> 6.9. Cost: the 4-dim residual quadruples the PCG
    # row matrix -> 28.1 -> 43.1 ms/frame (23 fps). The flagship preset
    # keeps 0 (the >= 30 fps headline); set 0.25 for tangentially-rich
    # motion where the extra 15 ms buys real tracking.
    solver_p2p_weight: float = 0.0
    # Adaptive aperture gate for the tangential p2p term: scale the
    # per-point weight by a windowed translation-model fit of the
    # apparent motion field (kinfu._p2p_gate) — tangential pull applies
    # on coherently-translating CURVED patches (articulated parts, where
    # round 4 measured it fixing the hinge hold-out) and shuts off on
    # flat/ambiguous ones (traveling waves, where the same term dragged
    # the bulge hold-out 2x worse). False = uniform weight (the round-4
    # blend behavior, now in the cheaper tangential formulation).
    solver_p2p_adaptive: bool = False
    # Row-matrix subsampling for the TANGENTIAL p2p rows only: the PCG
    # row matrix takes every k-th point's tangential rows scaled by
    # sqrt(k) (an unbiased estimate of the tangential Gram — the same
    # statistical argument as solver_hessian_stride, applied to the
    # term that tripled the matvec bandwidth); plane rows, gradient,
    # cost, and preconditioner blocks stay exact. 1 = exact rows.
    solver_p2p_hessian_stride: int = 1
    # EXPERIMENTAL (measured DUD, round 5 — keep False): keep the
    # tangential p2p rows OUT of the PCG row matrix (gradient/cost/
    # preconditioner still see them). Motivation was the rows' ~11
    # ms/frame matvec bandwidth; MEASURED at the bench shape the
    # mis-scaled steps cause LM rejection churn that makes it BOTH
    # slower (41.7 vs 35.0 ms at LM3 with the adaptive gate) and worse
    # (sphere med 1.39 vs 0.83 mm) than carrying the exact rows. The
    # step metric needs the tangential curvature where the gate is
    # spatially varying; lagging the WHOLE Hessian across iterations
    # (solver_lagged_jtj) remains fine because it is exact at the
    # linearization point.
    solver_p2p_lag_hessian: bool = False
    # gate box window, px at the model-map resolution (~0.26 m at 0.9 m
    # with the default intrinsics /4): must exceed the node-radius scale
    # so the fit sees supra-node coherence
    solver_p2p_gate_window: int = 41
    # det(sum nn^T / S) at which the observability factor saturates
    # (flat patch ~ 1e-4 class, curved patch ~ 1e-2..1e-1 class)
    solver_p2p_gate_cond: float = 0.01
    # explained-fraction floor of the translation fit (ramps to 1)
    solver_p2p_gate_fit: float = 0.35
    # output gain: gate = clip(gain * cond_term * fit_term). Measured
    # on-object gate levels (8-frame noise-on diag, round 5): hinge
    # ~0.55, bulge bump ~0.16 — the separation is right but articulated
    # surfaces should saturate to FULL tangential weight; gain 2 maps
    # hinge -> ~1.0 while the bulge stays ~0.3.
    solver_p2p_gate_gain: float = 2.0
    # Assemble the data-term JtJ from int8-quantized Jacobian rows with
    # per-COLUMN scales (A = Q diag(c) factors EXACTLY through the syrk:
    # A^T A = diag(c) Q^T Q diag(c), so the only error is the <=0.4%
    # per-entry rounding of Q). The int8 MXU path runs the syrk ~5x faster
    # than bf16 (measured 2.7 vs 14.4 ms at the bench shape). Jtr stays
    # f32-exact — the gradient sets the solution; the Hessian only shapes
    # the step, and LM accept/reject uses the exact cost.
    solver_jtj_int8: bool = True
    # Carry ONE Cholesky factor across the LM iterations of a solve
    # (direct linear solver + lagged JtJ only): the lagged Hessian is
    # constant within a solve, so the damped matrix changes only through
    # lm_lambda — which only matters after a REJECTED step (x8), where the
    # factor IS rebuilt. Accepted steps halve a lambda that is already
    # <= 1e-4 of the diagonal; reusing the factor there changes the step
    # negligibly while LM accept/reject stays exact-cost.
    solver_chol_reuse: bool = True
    # Lagged-JtJ (Shamanskii/chord) LM: assemble the full Hessian only at
    # the first iteration of each solve; later iterations reuse it while
    # the candidate-evaluation pass returns BOTH the exact cost (for
    # accept/reject) and a fresh exact gradient (which becomes the next
    # Jtr) — so fixed points are unchanged, only the step metric is stale.
    # Saves the one-hot row expansion + int8 syrk + edge-block placement
    # (~15 ms/iteration at bench shape) on iterations after the first.
    solver_lagged_jtj: bool = True
    # Reuse the previous frame's model raycast as the solver's canonical
    # surface (saves a full 256^3 raycast per frame; the pixel association
    # then carries one frame of camera motion — negligible at tracking
    # frame rates). False re-raycasts at the new pose like the reference.
    reuse_model_raycast: bool = True
    # Plain rigid KinectFusion mode (identity warp): skips the non-rigid
    # solve and DQB fusion, using rigid projective integration — the
    # reference's kinfu preset behavior / BASELINE config 1.
    rigid_only: bool = False
    # Track the camera against the DQB-warped model surface (the live-frame
    # prediction) instead of the canonical raycast. The reference tracks
    # against canonical geometry (kinfu.cpp:297), which biases ICP wherever
    # the scene deforms; warping the model maps fixes that (paper §3.1).
    track_against_warped: bool = True

    # KNN field for voxel-space DQB: computed on a coarse grid of
    # volume_dims // knn_field_stride cells and prolonged to full
    # resolution. 8 (3.1 cm cells at 256^3/1m^3) measured
    # quality-neutral vs 4 on the deforming-sphere bench (1.97 vs 1.90 mm
    # median) for ~8x fewer coarse KNN+DQB points in the fusion phase —
    # the warp field is Gaussian-smooth at node_coverage (2.5 cm) scale.
    knn_field_stride: int = 8

    # Non-rigid fusion observation weight = DQB blend quality (the paper's
    # w(x), eq. in §3.3; the reference defined-but-broke this, SURVEY
    # §2.9.5). False restores unit weights (rigid-integrate behavior).
    fusion_quality_weight: bool = True
    # voxels whose mean Gaussian blend weight is below this are NOT fused:
    # their DQB blend is a normalized near-zero sum (garbage transform) and
    # fusing through it smears the canonical model.
    fusion_quality_min: float = 0.01
    # Weight each fused observation by |cos| of the live surface normal
    # against the viewing ray (the KinectFusion-family incidence weight;
    # the reference and the paper use uniform weights). Grazing-incidence
    # depth carries large along-ray error — exactly the silhouette-ring
    # voxels diag_tail attributed the p95 tail to — so down-weighting it
    # lets frontal evidence dominate. Fetched at zero extra lookup cost by
    # packing confidence into the depth image's integer f32 values
    # (ops/bricks.pack_depth_conf; 0.25 mm depth quantization).
    fusion_incidence_weight: bool = False
    # Floor on the incidence weight (valid pixels only): grazing
    # observations keep at least this much evidence per fusion, so
    # silhouette-ring voxels seen ONLY at grazing incidence still
    # accumulate toward extract_min_weight instead of never claiming
    # surface (the surface-coverage metric of bench.py guards this
    # trade; round 4).
    fusion_incidence_floor: float = 0.0
    # Projective-SDF correction: psdf = dists(u) - |p| measures distance
    # ALONG THE RAY; the true signed distance is ~psdf * |cos incidence|.
    # Storing the uncorrected value stretches the field along grazing
    # rays, which skews the trilinear crossing between voxels — the
    # residual error source of the silhouette ring once it is extracted
    # at all. With this flag the STORED observation is scaled by the
    # per-pixel |cos| (clamped to >= 0.25 so near-tangent pixels don't
    # collapse the band); the update gate keeps the UNCOLLECTED psdf
    # band, so exactly the same voxel set updates as before (and brick
    # classification stays consistent). Needs fusion_incidence_weight
    # (the |cos| image rides the same packed lookup).
    fusion_sdf_incidence_scale: bool = False

    # Split each fusion event into S brick-phases processed on S
    # consecutive sub-events (fusion runs every fusion_interval/S frames
    # on bricks with brick_x % S == phase): every voxel still integrates
    # every fusion_interval frames, but the per-frame fusion cost — and
    # the static band-cap processing budget, which follows the cap —
    # drops ~S-fold, flattening the every-Nth-frame latency SPIKE.
    # MEASURED (round 4, v5e bench shape, interval 4): split 1 = ~28 ms
    # steady with ~60 ms fusion frames (28.1 ms avg); split 4 = FLAT
    # ~48 ms-class frames, no spikes, but 39.1 ms avg — fusion's FIXED
    # costs (classification, to/from_bricks, coarse warp grid) are paid
    # every frame while only the window lookups divide by S. Quality
    # battery unchanged (phases compose bitwise on a single frame —
    # tests/test_fusion.py). Default 1 (best average); set S for
    # latency-uniformity-sensitive deployments. Must divide
    # fusion_interval; band/wide caps are divided by S internally.
    fusion_phase_split: int = 1
    # Fuse depth into the volume only every Nth frame (1 = every frame).
    # Tracking and the warp solve still run per frame against the existing
    # model; skipped frames' observations are simply not integrated —
    # measured -16 ms/frame average at interval 2 (v5e bench shape) at the
    # price of half the observation count (slower weight saturation, more
    # per-observation noise retained — quality measured neutral at 10 and
    # 20 noise-on bench frames).
    fusion_interval: int = 2

    # Minimum observation evidence (summed fusion weight) for a voxel to
    # claim surface in extraction/meshing (ops/tsdf.extract_cloud,
    # io/export.extract_mesh). The reference extracts at weight > 0;
    # grazing-incidence silhouette voxels observed once or twice carry
    # multi-voxel crossing error and were the ENTIRE p95 tail of the
    # quality bench (diag_tail round 3: tail 100% at |cos incidence|<0.2,
    # weight<4). 2.0 keeps anything confirmed by a second observation.
    extract_min_weight: float = 2.0

    # Light for Phong rendering (reference light_pose, kinfu.cpp:46).
    light_pose: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # Volume storage (models/volume.py codecs; all arithmetic is f32).
    # tsdf: "i16" = fixed-point 1/32767 (15-bit mantissa in [-1,1] — the
    # precision class the REJECTED round-4 bf16 experiment lacked: bf16's
    # 8-bit mantissa corrupted the trilinear crossing, p95 2.66 -> 5.13
    # mm); "f32"; "bf16" (kept for the record, known-bad quality).
    # weight: "u16" = fixed-point 1/512 (the weight is a bounded counter,
    # max 64 x quality <= 1 — 512ths are exact for its use); "f32".
    # i16+u16 = 4 B/voxel, the reference's ushort2 packing parity
    # (tsdf_volume.cu:53-61): 67 MB at 256^3 instead of 134, and every
    # march gather / brick transpose moves half the bytes.
    # MEASURED (round 5, v5e bench shape): quality battery within noise
    # of f32 on all scene families (see the preset docstring), frame time
    # equal-or-better — default ON.
    tsdf_dtype: str = "i16"
    weight_dtype: str = "u16"

    def __post_init__(self):
        assert self.volume_dims % 32 == 0, "volume_dims must be divisible by 32"
        assert self.volume_dims % self.brick_size == 0
        assert self.brick_size % self.knn_field_stride == 0, (
            "bricks must align with the coarse warp grid"
        )
        assert len(self.icp_iters) == self.pyramid_levels
        assert self.fusion_interval % self.fusion_phase_split == 0, (
            "fusion_phase_split must divide fusion_interval"
        )
        assert self.raycast_subsample in (1, 2, 4)
        assert self.tsdf_dtype in ("f32", "bf16", "i16")
        assert self.weight_dtype in ("f32", "u16")
        assert not self.fusion_sdf_incidence_scale or self.fusion_incidence_weight, (
            "fusion_sdf_incidence_scale needs fusion_incidence_weight: the "
            "|cos| image rides the packed depth lookup — without the weight "
            "flag the scale silently no-ops"
        )
        assert 2 ** (self.pyramid_levels - 1) > self.raycast_subsample, (
            "need at least one pyramid level below the raycast resolution"
        )

    @property
    def voxel_size(self) -> float:
        return self.volume_size / self.volume_dims

    @property
    def raycast_shift(self) -> int:
        """Pyramid-level index of the model/tracking raycast resolution
        (log2 of raycast_subsample)."""
        return self.raycast_subsample.bit_length() - 1

    @property
    def track_levels(self) -> int:
        """Number of pyramid levels the model maps (and ICP) run at."""
        return self.pyramid_levels - self.raycast_shift

    @classmethod
    def default_dynamicfusion(cls) -> "DynamicFusionConfig":
        """The reference's dynamicfusion preset (kinfu.cpp:14-49).

        Non-rigid-preset choices beyond the base defaults (each
        quality-gated on the noise-on seed battery + the noiseless
        25-frame tail, round 3):

        - newton8 raycast refine: 41 ms/frame faster than secant at the
          bench shape (130.4 vs 171.9 ms — mostly downstream: its model
          maps agree better with the raw-depth solve targets, so the
          warm-started LM/ICP loops exit earlier). Rigid pipelines keep
          the secant default — see raycast_refine.
        - fusion_interval=4: 120.2 ms (-10 vs interval 2) AND better
          quality everywhere (battery med 0.75-0.95 / p95 2.0-2.6 mm vs
          0.87-1.28 / 2.2-3.7; noiseless tail p95 7.85 vs 10.45 mm) —
          fewer integrations bake in fewer grazing observations between
          warp-settled states.
        - fusion_incidence_weight: grazing observations down-weighted by
          |cos incidence| (see the flag's docstring).

        Round-4 additions (measured on the v5e bench):
        - raycast_temporal_band: -6.3 ms/frame (117.1 -> 110.8), quality
          battery unchanged.
        - fusion_incidence_floor=0.35 + extract_min_weight=0.25 (0.3
          measured cov 0.9448 on seed 0 — just under the gate; 0.25 is
          >= 0.953 on every seed at p95 2.7-3.8): the
          COVERAGE operating point. Round 3's extract_min_weight=2.0
          scored its error only on confidently-observed voxels — surface
          coverage (bench.py metric, sensor-observable support) was 55%
          at 20 noise-on frames because the whole grazing silhouette ring
          was suppressed. These values hit the >=95% coverage gate
          (0.95-0.96 across seeds) while the error battery stays at
          med 0.74-0.86 / p95 2.0-2.7 mm (round 3: 0.75-0.95 / 2.0-2.6 on
          ~half the surface). The cost is honest: the noiseless 25-frame
          tail p95 is 10.1 mm (was 3.05 with the ring suppressed) — the
          ring's grazing-incidence crossing error is now REPORTED instead
          of hidden; at matched coverage round 3's figure was worse
          (weight>0 extraction: p95 3.21 noise-on vs 2.58 here, sweep
          record in CLAUDE.md).
        - fusion_sdf_incidence_scale (round 4): store psdf * |cos|
          (true-distance estimate) instead of the along-ray psdf.
          Measured: noiseless 25-frame tail med 1.25 -> 0.98 / p95 10.1
          -> 9.3 mm, noise-on battery equal-or-better (s0 0.84/2.51,
          s1 0.84/2.75), hold-out hinge better on all three numbers
          (1.45/3.70/0.755 vs 1.63/3.93/0.73, not tuned against).
        - solver_linear="pcg" x 12 iterations (round 4): the FACTORED
          matrix-free LM linear solve — bf16 row-matrix matvecs + per-edge
          blocks + block-Jacobi PCG — replaces the dense-Gram pipeline
          whose syrk + edge placement (12.4 ms layout copy) + Cholesky
          (11.4 ms) dominated the solver. 60.2 -> 32.9 ms/frame measured;
          solver cost and the whole quality battery are unchanged (med
          0.80-0.89 / p95 2.0-2.7 / cov 0.94-0.96 across seeds; 50-frame
          med 1.04 / p95 3.08 / cov 0.98). Single-chip and multi-chip now
          run the SAME solver structure (the distributed solve psums the
          row-matvec products).
        - fusion_interval=6 (round 4, re-swept once fusion dropped from
          the dominant phase to the dominant REMAINING phase): 28.1 ->
          23.6 ms/frame; 20-frame battery equal-or-better on every seed
          (med 0.82-0.88 / p95 2.3-2.7 / cov 0.953-0.957), 50-frame
          1.06/2.99/0.987, BOTH hold-outs better than interval 4 (hinge
          1.32/3.73/0.79, bulge 0.92/2.66/0.76); only the noiseless
          25-frame tail worsens slightly (p95 9.3 -> 10.5). interval=8
          fails the coverage gate (0.944) — the gate is the backstop.
        """
        return cls(
            raycast_refine="newton8",
            fusion_interval=6,
            fusion_incidence_weight=True,
            raycast_temporal_band=True,
            fusion_incidence_floor=0.35,
            extract_min_weight=0.25,
            fusion_sdf_incidence_scale=True,
            solver_linear="pcg",
            solver_linear_iters=12,
        )

    @classmethod
    def quality_dynamicfusion(cls) -> "DynamicFusionConfig":
        """The ARTICULATED-motion operating point (round 4):
        default_dynamicfusion plus the blended point-to-plane +
        point-to-point data term (solver_p2p_weight=0.25 — restores
        tangential observability, see the flag's measured record). ~23
        fps instead of 31-36 at the bench shape.

        MOTION-CLASS DEPENDENT — measured on the two hold-out families:
        articulated rigid-ish parts (hinge scissor) improve dramatically
        (med 1.45 -> 0.78 mm, coverage 0.75 -> 0.81) because the parts
        really do translate tangentially; a traveling deformation WAVE
        (bulge-on-plane) gets WORSE (med 0.97 -> 1.90, coverage 0.76 ->
        0.68) because there the material correspondence is ambiguous and
        the point term drags the canonical surface along with the wave.
        The default preset (p2pl-only) remains the general-purpose
        choice; pick this one when the subject is an articulated body
        (the reference's primary use case — hands, people, objects)."""
        return dataclasses.replace(
            cls.default_dynamicfusion(), solver_p2p_weight=0.25
        )

    @classmethod
    def reference_parity(cls) -> "DynamicFusionConfig":
        """The reference's literal parameter values where they differ from
        the tuned defaults: the FIXME-hardcoded dg_w = 3.0 m
        (/root/reference/kfusion/src/warp_field.cpp:44-48), the paper-quoted
        robust constants the reference defines but never applies
        (optimisation.hpp:84-88,142-146), and the heavy ARAP lambda. These
        are known-unstable as a running configuration (scripts/
        scaling_check.py); use for oracle tests and parity studies only.

        Also pins every TPU throughput lever back to reference-faithful
        behavior (the reference integrates every frame, extracts at
        weight > 0, raycasts every pixel with no band cap): the tuned base
        defaults would otherwise silently drop observations/surface from a
        preset whose whole point is faithfulness."""
        return cls(
            node_radius=3.0,
            solver_tukey_c=0.01,
            solver_huber_delta=1e-4,
            solver_arap_weight=200.0,
            fusion_interval=1,
            extract_min_weight=1e-6,
            raycast_band_cap=0.0,
            raycast_subsample=1,
        )

    @classmethod
    def default_kinfu(cls) -> "DynamicFusionConfig":
        """The reference's plain-KinectFusion preset (kinfu.cpp:56-89)."""
        return cls(
            intr=Intrinsics(525.0, 525.0, 640 / 2 - 0.5, 480 / 2 - 0.5),
            volume_dims=512,
            volume_size=3.0,
            volume_origin=(-1.5, -1.5, 0.5),
            # 3 m scenes: a 0.25 m band cap would clip legitimate background
            raycast_band_cap=0.0,
        )

    @classmethod
    def small(cls, dims: int = 64, rows: int = 120, cols: int = 160) -> "DynamicFusionConfig":
        """A scaled-down preset for tests: same structure, tiny shapes.

        Pins the resolution/caching levers the full-scale defaults tune for
        throughput (raycast_subsample, fusion_interval, band cap, evidence
        threshold): at test shapes those would change what the tests
        measure, not how fast; tests that target a lever set it
        explicitly."""
        scale = cols / 640.0
        return cls(
            rows=rows,
            cols=cols,
            intr=Intrinsics(570.342 * scale, 570.342 * scale, cols / 2.0, rows / 2.0),
            volume_dims=dims,
            max_nodes=128,
            node_sample_step=11,
            solver_linear_iters=32,
            knn_field_stride=2,
            raycast_subsample=2,
            raycast_band_cap=0.0,
            fusion_interval=1,
            extract_min_weight=1e-6,
        )
