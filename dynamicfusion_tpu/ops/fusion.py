"""Non-rigid TSDF fusion: DQB-warped projective integration.

Completes the capability the reference left unfinished: its
``TsdfVolume::surface_fusion`` computes psdf on the CPU per frame and the
actual non-rigid voxel update is commented out, falling back to rigid
integrate (/root/reference/kfusion/src/tsdf_volume.cpp:228-255, dead block
at :241-254). Here the full paper semantics (Newcombe et al. §3.3) run on
device: every canonical voxel center is warped by the current field into
the live frame, projected, and the psdf observation is fused with a
blending-quality weight.

TPU design — the voxel-space warp without per-voxel KNN:
per-voxel KNN+DQB over 256^3 voxels would be ~134M random gathers/frame
(TPU-pathological). Instead the warp is evaluated exactly on a coarse
corner grid ((D/stride+1)^3 points; KNN + DQB like any point set) and
*prolonged* to full resolution by separable trilinear interpolation
expressed as three small dense matmuls (no gathers at all — the
interpolation weights along each axis form a static (D, Dc+1) band
matrix). The warp field is smooth by construction (Gaussian-blended RBF
nodes), so piecewise-trilinear prolongation at stride 4 (1.5 cm cells) is
well within the truncation band's tolerance. This mirrors the paper's own
coarse KNN-field caching, but in a form the MXU executes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import dualquat
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.models.warpfield import WarpField


def _prolong_matrix(d: int, stride: int) -> jnp.ndarray:
    """(d, d//stride + 1) linear-interpolation weights from a corner-aligned
    coarse axis to the full axis: fine index i = c*stride + r interpolates
    corners c, c+1 with weights (1 - r/s, r/s)."""
    dc = d // stride + 1
    i = jnp.arange(d)
    c = i // stride
    r = (i % stride).astype(jnp.float32) / stride
    w = jnp.zeros((d, dc), jnp.float32)
    w = w.at[i, c].set(1.0 - r)
    w = w.at[i, jnp.minimum(c + 1, dc - 1)].add(r)
    return w


def _coarse_corner_points(cfg: DynamicFusionConfig) -> jnp.ndarray:
    """World positions of the (D/stride + 1)^3 coarse voxel corners,
    flattened (Dc^3, 3)."""
    d = cfg.volume_dims
    s = cfg.knn_field_stride
    vs = cfg.voxel_size
    dc = d // s + 1

    ax = jnp.arange(dc, dtype=jnp.float32) * (s * vs)
    org = volume_model.origin(cfg)
    cx = ax[:, None, None] + org[0]
    cy = ax[None, :, None] + org[1]
    cz = ax[None, None, :] + org[2]
    return jnp.stack(
        [
            jnp.broadcast_to(cx, (dc, dc, dc)),
            jnp.broadcast_to(cy, (dc, dc, dc)),
            jnp.broadcast_to(cz, (dc, dc, dc)),
        ],
        axis=-1,
    ).reshape(-1, 3)


def coarse_field(
    cfg: DynamicFusionConfig, field: WarpField
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blended field dual quaternion AND blend quality at each coarse voxel
    corner: ONE exact KNN+DQB evaluation per frame, shared by the non-rigid
    fusion (voxel warp + observation weight) and the model-map warp
    (warp_points_trilinear) — the warp field is Gaussian-smooth at
    node_coverage scale, so trilinear prolongation is within the same
    tolerance as the fusion grid itself.

    Returns (dq_grid (Dc,Dc,Dc,8), q_grid (Dc,Dc,Dc)). Quality is the
    paper's w(x) = (1/k) sum_i exp(-|x - dg_v_i|^2 / (2 dg_w_i^2))
    (Newcombe et al. §3.3) — the reference's `weighting()` averaged raw
    DISTANCES instead, an unbounded increment that grows with distance
    from the nodes (tsdf_volume.cpp:300-306, SURVEY §2.9.5)."""
    d = cfg.volume_dims
    s = cfg.knn_field_stride
    dc = d // s + 1
    coarse = _coarse_corner_points(cfg)
    d2, idx = warpfield.knn(field, coarse, cfg.knn_k, method=cfg.knn_method)
    w = warpfield.weights_from_dist2(field, d2, idx)
    dq = dualquat.blend(w, jnp.take(field.dq, idx, axis=0))
    q = jnp.clip(jnp.mean(w, axis=-1), 0.0, 1.0)
    return dq.reshape(dc, dc, dc, 8), q.reshape(dc, dc, dc)


def coarse_dq_grid(cfg: DynamicFusionConfig, field: WarpField) -> jnp.ndarray:
    """Blended field dual quaternion at each coarse voxel corner
    (Dc, Dc, Dc, 8) — see coarse_field."""
    return coarse_field(cfg, field)[0]


def warp_points_trilinear(
    cfg: DynamicFusionConfig,
    dq_grid: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray | None = None,
):
    """DQB-warp world-space points by trilinear blending of the coarse
    node-DQ grid (8 row gathers + a DQB-style normalized blend per point)
    instead of a per-point KNN over the node set. NaN inputs pass through."""
    dc = dq_grid.shape[0]
    cell = cfg.knn_field_stride * cfg.voxel_size
    org = volume_model.origin(cfg)

    g = (jnp.nan_to_num(points) - org) / cell
    gi = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, dc - 2)
    f = jnp.clip(g - gi, 0.0, 1.0)

    base = (gi[..., 0] * dc + gi[..., 1]) * dc + gi[..., 2]
    flat = dq_grid.reshape(-1, 8)
    corners = []
    weights = []
    a, b, c = f[..., 0], f[..., 1], f[..., 2]
    for dx in (0, 1):
        wx = a if dx else 1.0 - a
        for dy in (0, 1):
            wy = b if dy else 1.0 - b
            for dz in (0, 1):
                wz = c if dz else 1.0 - c
                corners.append(jnp.take(flat, base + (dx * dc + dy) * dc + dz, axis=0))
                weights.append(wx * wy * wz)
    dqs = jnp.stack(corners, axis=-2)      # (P, 8, 8)
    w = jnp.stack(weights, axis=-1)        # (P, 8)
    blended = dualquat.blend(w, dqs)

    nan_mask = jnp.isnan(points[..., 0])
    warped = dualquat.transform(blended, jnp.nan_to_num(points))
    warped = jnp.where(nan_mask[..., None], jnp.nan, warped)
    if normals is None:
        return warped
    wn = dualquat.rotate(blended, jnp.nan_to_num(normals))
    wn = jnp.where(jnp.isnan(normals[..., 0])[..., None], jnp.nan, wn)
    return warped, wn


def warp_coarse_grid(
    cfg: DynamicFusionConfig,
    field: WarpField,
    dq_grid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact DQB warp of the coarse (D/stride + 1)^3 voxel corner grid;
    returns warped world positions (Dc, Dc, Dc, 3). Reuses a precomputed
    coarse_dq_grid when given."""
    d = cfg.volume_dims
    s = cfg.knn_field_stride
    dc = d // s + 1
    coarse = _coarse_corner_points(cfg)
    if dq_grid is not None:
        return dualquat.transform(dq_grid.reshape(-1, 8), coarse).reshape(
            dc, dc, dc, 3
        )
    return warpfield.warp_points(
        field, coarse, k=cfg.knn_k, method=cfg.knn_method
    ).reshape(dc, dc, dc, 3)


def warp_voxel_field(
    cfg: DynamicFusionConfig,
    field: WarpField,
    dq_grid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warped world-space positions of every voxel center, as three
    (D, D, D) arrays (x, y, z channels kept separate to avoid a
    (D,D,D,3) layout).

    Exact DQB on the coarse corner grid + matmul prolongation."""
    d = cfg.volume_dims
    s = cfg.knn_field_stride
    warped = warp_coarse_grid(cfg, field, dq_grid)

    w = _prolong_matrix(d, s)  # (D, Dc)
    # separable prolongation: contract each spatial axis with w.
    # HIGHEST: metric positions — the TPU default bf16 matmul precision
    # injects ~1 cm noise (wrong depth pixels downstream).
    hi = jax.lax.Precision.HIGHEST
    f = jnp.einsum("ia,abcn->ibcn", w, warped, precision=hi)
    f = jnp.einsum("jb,ibcn->ijcn", w, f, precision=hi)
    f = jnp.einsum("kc,ijcn->ijkn", w, f, precision=hi)
    return f[..., 0], f[..., 1], f[..., 2]


def integrate_nonrigid(
    cfg: DynamicFusionConfig,
    vol: TsdfVolume,
    field: WarpField,
    dists: jnp.ndarray,
    world2cam: jnp.ndarray,
    intr: Intrinsics,
    with_counts: bool = False,
    dq_grid: jnp.ndarray | None = None,
    q_grid: jnp.ndarray | None = None,
    conf: jnp.ndarray | None = None,
    phase: jnp.ndarray | int | None = None,
    split: int = 1,
):
    """Fuse one live depth frame into the canonical volume through the
    warp field (paper §3.3; the completed form of surface_fusion +
    psdf, tsdf_volume.cpp:228-292).

    ``conf``: optional (H, W) per-pixel observation confidence in [0, 1]
    (cfg.fusion_incidence_weight: |cos| of the live normal vs the viewing
    ray) — scales each observation's weight so grazing-incidence
    observations, whose depth carries large along-ray error, contribute
    proportionally little; frontal evidence then dominates the silhouette
    ring. Looked up through the same window matmuls as the depth
    (bricks.pack_depth_conf).

    Per voxel: x_w = W(x) (DQB-warped center, world frame);
    x_c = world2cam * x_w; psdf = dists(proj(x_c)) - |x_c|;
    where psdf >= -trunc: fold min(1, psdf/trunc) into the running
    average with the paper's observation weight w(x) = mean Gaussian
    blending quality of the voxel's node neighborhood (bounded [0, 1];
    voxels essentially unsupported by the warp field — q below
    cfg.fusion_quality_min — are NOT updated: their DQB blend is a
    normalized near-zero sum, i.e. garbage, and fusing through it smears
    the canonical model. The reference's `weighting()` averaged raw
    distances instead — an unbounded increment that *grows* with distance
    from the nodes, inverted from the paper's intent;
    tsdf_volume.cpp:300-306). cfg.fusion_quality_weight=False restores
    unit observation weights (the rigid-integrate-equivalent behavior)."""
    from dynamicfusion_tpu.ops import bricks as bricks_mod

    d = cfg.volume_dims
    trunc = volume_model.trunc_dist(cfg)
    rows, cols = dists.shape

    use_q = cfg.fusion_quality_weight
    if use_q and (dq_grid is None or q_grid is None):
        dq_grid, q_grid = coarse_field(cfg, field)

    if cfg.integrate_mode == "brick":
        from dynamicfusion_tpu.ops import bricks

        warped = warp_coarse_grid(cfg, field, dq_grid)  # (Dc, Dc, Dc, 3) world
        r = world2cam[:3, :3]
        t = world2cam[:3, 3]
        cam_grid = (
            jnp.dot(warped, r.T, precision=jax.lax.Precision.HIGHEST) + t
        )
        return bricks.integrate_bricks(
            cfg, vol, dists, cam_grid, cfg.knn_field_stride, intr,
            with_counts=with_counts, q_grid=q_grid if use_q else None,
            conf=conf, phase=phase, split=split,
        )

    wx, wy, wz = warp_voxel_field(cfg, field, dq_grid)

    r = world2cam[:3, :3]
    t = world2cam[:3, 3]
    x = r[0, 0] * wx + r[0, 1] * wy + r[0, 2] * wz + t[0]
    y = r[1, 0] * wx + r[1, 1] * wy + r[1, 2] * wz + t[1]
    z = r[2, 0] * wx + r[2, 1] * wy + r[2, 2] * wz + t[2]

    u = x * intr.fx / z + intr.cx
    v = y * intr.fy / z + intr.cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u < cols) & (v < rows) & (z > 0)

    flat = jnp.clip(vi, 0, rows - 1) * cols + jnp.clip(ui, 0, cols - 1)
    flat = jax.lax.optimization_barrier(flat)
    lookup = dists if conf is None else bricks_mod.pack_depth_conf(dists, conf)
    dp = jnp.take(lookup.reshape(-1), flat)
    dp = jax.lax.optimization_barrier(dp)
    if conf is None:
        cv = None
    else:
        dp, cv = bricks_mod.unpack_depth_conf(dp)
    obs_w, sdf_scale = bricks_mod.incidence_weight_scale(cfg, cv)

    psdf = dp - jnp.sqrt(x * x + y * y + z * z)
    update = inb & (dp != 0.0) & (psdf >= -trunc)
    if split > 1:
        # dense-mode phase split: same brick-x-plane semantics as the
        # brick path (cfg.fusion_phase_split)
        bx = (jnp.arange(d, dtype=jnp.int32) // cfg.brick_size) % split
        update = update & (bx == phase)[:, None, None]

    if use_q:
        # observation weight: blend quality prolonged from the coarse grid
        # like the positions (one more separable-prolongation channel)
        pm = _prolong_matrix(d, cfg.knn_field_stride)
        q = jnp.einsum("ia,abc->ibc", pm, q_grid)
        q = jnp.einsum("jb,ibc->ijc", pm, q)
        q = jnp.einsum("kc,ijc->ijk", pm, q)
        update = update & (q > cfg.fusion_quality_min)
    else:
        q = 1.0

    q = q * obs_w
    tsdf_obs = jnp.minimum(1.0, psdf * sdf_scale / trunc)
    w = volume_model.decode_weight(vol.weight)
    tsdf_f32 = volume_model.decode_tsdf(vol.tsdf)
    fused = (tsdf_f32 * w + tsdf_obs * q) / jnp.maximum(w + q, 1e-12)
    new_tsdf = volume_model.encode_tsdf(
        jnp.where(update & (w + q > 1e-12), fused, tsdf_f32), vol.tsdf.dtype
    )
    new_w = volume_model.encode_weight(
        jnp.where(update, jnp.minimum(w + q, float(cfg.tsdf_max_weight)), w),
        vol.weight.dtype,
    )
    out = TsdfVolume(new_tsdf, new_w)
    if with_counts:
        return out, jnp.zeros((3,), jnp.int32)  # dense path: nothing capped
    return out
