"""Non-rigid warp-field estimation: Gauss-Newton / Levenberg-Marquardt over
per-node 6-dof twists — entirely on device.

This replaces BOTH of the reference's solver backends:

- the Ceres CPU solver (translation-only point-to-point data term,
  /root/reference/kfusion/include/kfusion/optimisation.hpp:36-69,
  SPARSE_SCHUR, invoked from warp_field.cpp:117-163), and
- the Opt/Terra GPU solver (same energy declared symbolically,
  /root/reference/kfusion/solvers/dynamicfusion.t:26-52, GN/LM with
  nonLinearIter=5 x linearIter=100 PCG, kinfu.cpp:114-121),

and completes what both left unfinished (SURVEY §2.9 item 8): the paper's
*point-to-plane* data term, Tukey robust weighting of the data term, and the
as-rigid-as-possible (ARAP) regularizer over the node graph with Huber
weighting — all of which the reference defines but never wires in.

Design (TPU-first):
- Unknowns: delta twists eps = (r, t) in R^{N x 6} applied multiplicatively,
  dq_i <- from_twist(eps_i) * dq_i, re-linearized every outer iteration.
- The per-point Jacobian w.r.t. its K=8 neighbor nodes' twists is built
  explicitly with vmap(jacrev) (the point-to-plane residual is scalar, so
  ONE backward pass yields all 48 partials). With J explicit, the normal
  equations assemble as chunked one-hot-expanded A^T A matmuls on the MXU.
- Robustness by IRLS: sqrt-Tukey weights on data residuals, sqrt-Huber on
  ARAP edge residuals, recomputed at each re-linearization.
- LM damping with accept/reject on the true cost; the whole nonlinear loop
  is a static unroll inside one jit, no host sync.

The stages are module-level functions over an explicit ``SolveStructure``
(the per-solve constants: KNN graph, weights, validity, edge graph) so they
can be profiled standalone and sharded independently (the distributed GN in
parallel/ psums the per-shard JtJ/Jtr contributions).

Distribution note: residuals (pixels) shard naturally; JtJ/Jtr and the
block diagonal are segment-sums over nodes, so a multi-device solve psums
the per-shard (6N,6N)/(6N,) contributions — see parallel/.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import dualquat, quat
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.models.warpfield import WarpField


class SolveStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    accepted_steps: jnp.ndarray


# --------------------------------------------------------------------------
# residuals
# --------------------------------------------------------------------------


def _warp_one(eps_k, dq_k, w_k, p):
    """Warp a single point by DQB of its K neighbors with delta twists
    applied: blend(w, from_twist(eps) * dq). eps_k (K,6), dq_k (K,8),
    w_k (K,), p (3,)."""
    delta = dualquat.from_twist(eps_k[:, :3], eps_k[:, 3:])
    node_dq = dualquat.mul(delta, dq_k)
    blended = dualquat.blend(w_k, node_dq)
    return dualquat.transform(blended, p)


def _data_residual_p2p(eps_k, dq_k, w_k, p_can, p_live):
    """Point-to-point 3-residual (the reference's data term,
    optimisation.hpp:61-66 / dynamicfusion.t:52): warp(v_c) - v_live."""
    return _warp_one(eps_k, dq_k, w_k, p_can) - p_live


def _data_residual_p2pl(eps_k, dq_k, w_k, p_can, p_live, n_live):
    """Point-to-plane scalar residual (the paper's Data term, eq. 3):
    n_live . (warp(v_c) - v_live)."""
    return jnp.sum(n_live * (_warp_one(eps_k, dq_k, w_k, p_can) - p_live), keepdims=True)


def _data_residual_tangential(eps_k, dq_k, w_k, p_can, p_live, n_live, t1, t2, sw):
    """Point-to-plane PLUS per-point-weighted TANGENTIAL point terms, (3,):
    [n.d, sw*(t1.d), sw*(t2.d)] with (t1, t2) an orthonormal tangent basis
    of the live normal — the cfg.solver_p2p_weight data term.

    Point-to-plane alone cannot observe motion tangential to a smooth
    surface (the aperture problem — the hold-out hinge's round-4
    finding); the tangential point terms restore that observability.
    This supersedes the round-4 4-dim [n.d, sqrt(w)*d] blend: the point
    term's normal component only duplicated the plane row, so projecting
    it out keeps the same constraint content at 3/4 of the PCG
    row-matrix bandwidth; and the weight ``sw`` is PER-POINT — the
    adaptive aperture gate (cfg.solver_p2p_adaptive, kinfu._p2p_gate)
    rides in it, so tangential pull applies only where the local motion
    field actually supports a translation model."""
    d = _warp_one(eps_k, dq_k, w_k, p_can) - p_live
    return jnp.stack([
        jnp.sum(n_live * d),
        sw * jnp.sum(t1 * d),
        sw * jnp.sum(t2 * d),
    ])


def tangent_basis(n: jnp.ndarray):
    """(P, 3) unit normals -> orthonormal (t1, t2) tangent frames.
    Branch-free: pick the world axis least aligned with n as the helper."""
    ax = jnp.argmin(jnp.abs(n), axis=-1)
    helper = jax.nn.one_hot(ax, 3, dtype=n.dtype)
    t1 = jnp.cross(n, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def tangent_basis(n: jnp.ndarray):
    """(P, 3) unit normals -> orthonormal (t1, t2) tangent frames.
    Branch-free: pick the world axis least aligned with n as the helper."""
    ax = jnp.argmin(jnp.abs(n), axis=-1)
    helper = jax.nn.one_hot(ax, 3, dtype=n.dtype)
    t1 = jnp.cross(n, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _edge_residual(eps_i, dq_i, eps_j, dq_j, v_j):
    """ARAP edge residual (paper eq. 6): T_i(v_j) - T_j(v_j)."""
    di = dualquat.mul(dualquat.from_twist(eps_i[:3], eps_i[3:]), dq_i)
    dj = dualquat.mul(dualquat.from_twist(eps_j[:3], eps_j[3:]), dq_j)
    return dualquat.transform(di, v_j) - dualquat.transform(dj, v_j)


def tukey_sqrt_weight(r_norm: jnp.ndarray, c: float) -> jnp.ndarray:
    """sqrt of the Tukey biweight IRLS weight: w = (1 - (r/c)^2)^2 inside,
    0 outside (the robust penalty both reference solvers define but never
    apply, optimisation.hpp:84-88, dynamicfusion.t:42-49)."""
    x = r_norm / c
    return jnp.where(jnp.abs(x) <= 1.0, (1.0 - x * x), 0.0)  # sqrt(w) = 1-x^2


def huber_sqrt_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt of the Huber IRLS weight: 1 inside, sqrt(delta/|r|) outside."""
    a = jnp.abs(r_norm)
    return jnp.where(a <= delta, 1.0, jnp.sqrt(delta / jnp.maximum(a, 1e-20)))


# --------------------------------------------------------------------------
# edge graph
# --------------------------------------------------------------------------


def build_edges(
    field: WarpField, k_edge: int = 4, method: str = "exact"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-NN node graph for the ARAP term. Returns (src (E,), dst (E,),
    valid (E,)) with E = N * k_edge. Self-edges and inactive endpoints are
    masked out. ``method``: see warpfield.knn — the exact top_k here
    measured 4.8 ms/frame at 1024 nodes on v5e (trace round 4) vs ~0.6 ms
    approx; a ~0.95-recall edge graph only perturbs which of the
    nearest-5 nodes regularize each other (quality-gated on the bench
    battery), so prepare() passes cfg.knn_method."""
    n = field.positions.shape[0]
    d2, idx = warpfield.knn(field, field.positions, k_edge + 1, method=method)
    # drop the self column (distance 0); keep next k_edge
    idx = idx[:, 1 : k_edge + 1]
    src = jnp.repeat(jnp.arange(n), k_edge)
    dst = idx.reshape(-1)
    valid = (
        jnp.repeat(field.active, k_edge)
        & jnp.take(field.active, dst)
        & (src != dst)
    )
    return src, dst, valid


# --------------------------------------------------------------------------
# per-solve structure (KNN graph, weights, validity, edges)
# --------------------------------------------------------------------------


class SolveStructure(NamedTuple):
    """Per-solve constants, fixed across LM iterations."""

    p_can: jnp.ndarray    # (P, 3) canonical points, NaNs zeroed
    p_live: jnp.ndarray   # (P, 3) live targets, NaNs zeroed
    n_live: jnp.ndarray   # (P, 3) live normals, NaNs zeroed
    valid: jnp.ndarray    # (P,) bool
    knn_idx: jnp.ndarray  # (P, K) node ids
    w_knn: jnp.ndarray    # (P, K) Gaussian blending weights
    p2p_sw: jnp.ndarray   # (P,) sqrt per-point tangential p2p weight (0 = off)
    e_src: jnp.ndarray    # (E,)
    e_dst: jnp.ndarray    # (E,)
    e_valid: jnp.ndarray  # (E,) bool
    v_dst: jnp.ndarray    # (E, 3) dst node positions
    alpha: jnp.ndarray    # (E,) ARAP edge weights


class WarpSolveInputs(NamedTuple):
    p_can: jnp.ndarray    # (P, 3) canonical points (NaN = invalid)
    n_can: jnp.ndarray    # (P, 3) canonical normals
    p_live: jnp.ndarray   # (P, 3) live targets (NaN = invalid)
    n_live: jnp.ndarray   # (P, 3) live normals
    # (P, 1) per-point gate in [0, 1] scaling the tangential p2p weight
    # (cfg.solver_p2p_weight * gate; kinfu passes the adaptive aperture
    # gate or ones). Kept (P, 1) so every field of this tuple is 2-D —
    # the padding/sharding helpers treat the fields uniformly. None
    # (the default) means ones — prepare()/the distributed pad
    # normalize it to an array before any tuple iteration.
    p2p_gate: jnp.ndarray | None = None


def _with_gate(inputs: WarpSolveInputs) -> WarpSolveInputs:
    """Normalize p2p_gate=None to ones so the tuple can be iterated
    uniformly (strided subsample, padding, sharding)."""
    if inputs.p2p_gate is None:
        inputs = inputs._replace(
            p2p_gate=jnp.ones((inputs.p_can.shape[0], 1), jnp.float32)
        )
    return inputs


def prepare(
    cfg: DynamicFusionConfig,
    field: WarpField,
    inputs: WarpSolveInputs,
    point_to_plane: bool,
    global_points: int | None = None,
) -> SolveStructure:
    """Build the per-solve structure: data-term KNN + weights + validity and
    the ARAP edge graph (fixed for all LM iterations of one solve).

    Large point sets are subsampled ONCE here by cfg.solver_hessian_stride
    (a strided pixel subset of an already-dense surface sampling); the
    whole solve — cost, gradient, Hessian — then runs on the same
    consistent, hs-importance-weighted objective. P >> 6*N_nodes survives
    comfortably (e.g. 19200 residuals for 6144 dof at the bench shape).

    ``global_points``: the WHOLE solve's point count when `inputs` is one
    shard of it (solve's axis_name mode runs prepare per shard) — the
    full-scale/hs decisions must match the single-device solve for
    cross-mesh behavioral equivalence."""
    k = cfg.knn_k
    gp = global_points if global_points is not None else inputs.p_can.shape[0]
    hs = cfg.solver_hessian_stride if gp > 8192 else 1
    inputs = WarpSolveInputs(*(a[::hs] for a in _with_gate(inputs)))
    valid = (
        ~jnp.isnan(inputs.p_can[:, 0])
        & ~jnp.isnan(inputs.p_live[:, 0])
        & (~jnp.isnan(inputs.n_live[:, 0]) if point_to_plane else True)
    )
    p_can = jnp.nan_to_num(inputs.p_can)
    p_live = jnp.nan_to_num(inputs.p_live)
    n_live = jnp.nan_to_num(inputs.n_live)
    # sqrt of the effective per-point tangential p2p weight (0 when the
    # term is off): cfg.solver_p2p_weight x the caller's gate
    p2p_sw = jnp.sqrt(
        cfg.solver_p2p_weight
        * jnp.clip(jnp.nan_to_num(inputs.p2p_gate[:, 0]), 0.0, 1.0)
    )

    d2, knn_idx = warpfield.knn(field, p_can, k, method=cfg.knn_method)
    w_knn = warpfield.weights_from_dist2(field, d2, knn_idx)
    # points with no nearby node contribute nothing
    valid = valid & (jnp.sum(w_knn, axis=-1) > 1e-8)

    e_src, e_dst, e_valid = build_edges(field, method=cfg.knn_method)
    v_dst = jnp.take(field.positions, e_dst, axis=0)
    # alpha_ij = max(dg_w_i, dg_w_j)-based edge weight (paper eq. 7 uses
    # max of the blending weights; radius-scale is the natural proxy here).
    # The 1/hs keeps the data/ARAP balance of the full-resolution objective
    # after the stride-hs data subsampling above (objective / hs overall).
    alpha = jnp.maximum(
        jnp.take(field.radius, e_src), jnp.take(field.radius, e_dst)
    ) * (1.0 / hs)

    return SolveStructure(
        p_can=p_can,
        p_live=p_live,
        n_live=n_live,
        valid=valid,
        knn_idx=knn_idx,
        w_knn=w_knn,
        p2p_sw=p2p_sw,
        e_src=e_src,
        e_dst=e_dst,
        e_valid=e_valid,
        v_dst=v_dst,
        alpha=alpha,
    )


def data_residual_and_jac(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    point_to_plane: bool,
):
    """Data-term residuals and explicit per-point Jacobians at eps=0, IRLS
    Tukey sqrt-weights folded in — plus the TRUE robust data cost (Tukey
    rho of the raw residuals) at the linearization point, for free from the
    residuals already in hand. Touches only the point fields of ``s``
    (so it runs unchanged on a point shard inside shard_map — the basis of
    the distributed GN in parallel/distributed_gn.py). Returns
    (r (P, rd), jac (P, rd, K, 6), cost ())."""
    k = cfg.knn_k
    fn, args = _data_fn_args(cfg, s, dqs, point_to_plane)

    # TOOLCHAIN NOTE: the zero linearization point must be derived from a
    # sharded operand. A literal jnp.zeros((P, k, 6)) created inside a
    # shard_map body silently corrupts the vmap(jacrev) result on this jax
    # version (values ~5x off; primal unaffected) — anchoring the constant
    # to s.p_can keeps its sharding consistent with the batch.
    zero_p = s.p_can[:, :1, None] * 0.0                   # (P, 1, 1)
    eps_k0 = jnp.broadcast_to(zero_p, (s.p_can.shape[0], k, 6)) + 0.0
    r = jax.vmap(fn)(eps_k0, *args)                       # (P, res_dim)
    # reverse mode: res_dim (1 for point-to-plane) backward passes
    # instead of K*6 = 48 forward tangents — ~10x cheaper Jacobians
    jac = jax.vmap(jax.jacrev(fn))(eps_k0, *args)         # (P, res_dim, K, 6)

    rn = jnp.linalg.norm(r, axis=-1)
    sw = tukey_sqrt_weight(rn, cfg.solver_tukey_c) * s.valid
    # true robust cost at the linearization point (Tukey rho, cost_at math)
    c = cfg.solver_tukey_c
    x2 = (rn / c) ** 2
    rho = jnp.where(
        x2 <= 1.0, (c * c / 6.0) * (1.0 - (1.0 - x2) ** 3), c * c / 6.0
    )
    cost = jnp.sum(rho * s.valid)
    r = r * sw[:, None]
    jac = jac * sw[:, None, None, None]
    return r, jac, cost


def edge_residual_and_jac(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
):
    """ARAP edge residuals and Jacobians at eps=0, Huber sqrt-weights and
    edge weights folded in — plus the true robust edge cost (Huber rho,
    lambda*alpha-weighted) at the linearization point. Returns
    (re (E,3), je_i (E,3,6), je_j (E,3,6), cost ())."""
    lam = cfg.solver_arap_weight
    # anchored zeros — see the toolchain note in data_residual_and_jac
    e_zero = jnp.broadcast_to(
        s.v_dst[:, :1] * 0.0, (s.e_src.shape[0], 6)
    ) + 0.0
    dq_i = jnp.take(dqs, s.e_src, axis=0)
    dq_j = jnp.take(dqs, s.e_dst, axis=0)
    re = jax.vmap(_edge_residual)(e_zero, dq_i, e_zero, dq_j, s.v_dst)  # (E, 3)
    je = jax.vmap(jax.jacrev(_edge_residual, argnums=(0, 2)))(
        e_zero, dq_i, e_zero, dq_j, s.v_dst
    )  # tuple of (E, 3, 6)

    ren = jnp.linalg.norm(re, axis=-1)
    swe = (
        huber_sqrt_weight(ren, cfg.solver_huber_delta)
        * s.e_valid
        * jnp.sqrt(lam * s.alpha)
    )
    d = cfg.solver_huber_delta
    rho_e = jnp.where(ren <= d, 0.5 * ren * ren, d * (ren - 0.5 * d))
    cost = jnp.sum(rho_e * s.e_valid * lam * s.alpha)
    re = re * swe[:, None]
    je_i = je[0] * swe[:, None, None]
    je_j = je[1] * swe[:, None, None]
    return re, je_i, je_j, cost


def _data_fn_args(cfg: DynamicFusionConfig, s: SolveStructure, dqs, point_to_plane):
    """(residual fn, args) for the configured data term (shared by the
    explicit-Jacobian and vjp paths)."""
    dq_k = jnp.take(dqs, s.knn_idx, axis=0)
    if point_to_plane and cfg.solver_p2p_weight > 0.0:
        t1, t2 = tangent_basis(s.n_live)
        return _data_residual_tangential, (
            dq_k, s.w_knn, s.p_can, s.p_live, s.n_live, t1, t2, s.p2p_sw
        )
    if point_to_plane:
        return _data_residual_p2pl, (dq_k, s.w_knn, s.p_can, s.p_live, s.n_live)
    return _data_residual_p2p, (dq_k, s.w_knn, s.p_can, s.p_live)


def _scatter_jtr(s: SolveStructure, jr: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """(P, K, 6) per-point gradient contributions -> (6N,) via bf16-split
    one-hot matmuls (exact to ~2^-16 relative; see data_jtr)."""
    oh = jax.nn.one_hot(s.knn_idx, n_nodes, dtype=jnp.bfloat16)  # (P,K,N)
    hi = jr.astype(jnp.bfloat16)
    lo = (jr - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.einsum("pkn,pkd->nd", oh, hi, preferred_element_type=jnp.float32)
        + jnp.einsum("pkn,pkd->nd", oh, lo, preferred_element_type=jnp.float32)
    ).reshape(-1)


def data_grad_cost(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    n_nodes: int,
    point_to_plane: bool,
):
    """Data-term gradient J^T r (Tukey-weighted) + true robust cost via ONE
    vjp pass — independent of the residual dimension. The explicit-Jacobian
    route (data_residual_and_jac) runs res_dim backward passes, which the
    blended 4-dim data term (solver_p2p_weight) turns into 4x eval cost;
    J^T r only needs the vjp applied to the cotangent sw^2 * r (both the
    residual and the Jacobian carry one sqrt-weight each). Used by the
    lagged-JtJ LM loop's per-candidate evaluation."""
    k = cfg.knn_k
    fn, args = _data_fn_args(cfg, s, dqs, point_to_plane)
    zero_p = s.p_can[:, :1, None] * 0.0
    eps_k0 = jnp.broadcast_to(zero_p, (s.p_can.shape[0], k, 6)) + 0.0

    batched = lambda e: jax.vmap(fn)(e, *args)
    r, vjp_fn = jax.vjp(batched, eps_k0)

    rn = jnp.linalg.norm(r, axis=-1)
    sw = tukey_sqrt_weight(rn, cfg.solver_tukey_c) * s.valid
    c = cfg.solver_tukey_c
    x2 = (rn / c) ** 2
    rho = jnp.where(
        x2 <= 1.0, (c * c / 6.0) * (1.0 - (1.0 - x2) ** 3), c * c / 6.0
    )
    cost = jnp.sum(rho * s.valid)
    (jr,) = vjp_fn((sw * sw)[:, None] * r)  # (P, K, 6)
    return _scatter_jtr(s, jr, n_nodes), cost


def residual_and_jac(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    point_to_plane: bool,
):
    """Residuals and Jacobians for both terms (back-compat wrapper)."""
    r, jac, _ = data_residual_and_jac(cfg, s, dqs, point_to_plane)
    re, je_i, je_j, _ = edge_residual_and_jac(cfg, s, dqs)
    return r, jac, re, je_i, je_j


def cost_at(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    point_to_plane: bool,
) -> jnp.ndarray:
    """True robust cost (Tukey rho for data, Huber rho for edges) at eps=0,
    over the (already prepare-subsampled) solve point set."""
    fn, args = _data_fn_args(cfg, s, dqs, point_to_plane)
    eps_k = jnp.zeros((s.knn_idx.shape[0], cfg.knn_k, 6), jnp.float32)
    r = jax.vmap(fn)(eps_k, *args)
    rn = jnp.linalg.norm(r, axis=-1)
    c = cfg.solver_tukey_c
    x2 = (rn / c) ** 2
    rho = jnp.where(
        x2 <= 1.0, (c * c / 6.0) * (1.0 - (1.0 - x2) ** 3), c * c / 6.0
    )
    data_cost = jnp.sum(rho * s.valid)

    e_zero = jnp.zeros((s.e_src.shape[0], 6), jnp.float32)
    dq_i = jnp.take(dqs, s.e_src, axis=0)
    dq_j = jnp.take(dqs, s.e_dst, axis=0)
    re = jax.vmap(_edge_residual)(e_zero, dq_i, e_zero, dq_j, s.v_dst)
    ren = jnp.linalg.norm(re, axis=-1)
    d = cfg.solver_huber_delta
    rho_e = jnp.where(ren <= d, 0.5 * ren * ren, d * (ren - 0.5 * d))
    reg_cost = jnp.sum(rho_e * s.e_valid * cfg.solver_arap_weight * s.alpha)
    return data_cost + reg_cost


def gn_system_dense(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    n_nodes: int,
    point_to_plane: bool,
):
    """Linearize at eps=0 and assemble the DENSE normal equations
    JtJ (6N, 6N), Jtr (6N), plus the true robust cost at the linearization
    point (so the LM loop never pays a separate cost_at for a point it has
    already linearized).

    TPU note: scatter-add over node ids (the CUDA-natural assembly) is
    pathologically slow on TPU (serialized on duplicate indices), so the
    sparse-row Jacobians are expanded to dense rows with one-hot
    einsums and JtJ is ONE bf16 A^T A syrk on the MXU (f32 accumulation)
    over the concatenated data+edge rows — the "JtJ-build at
    speed-of-light" kernel. 400s -> sub-second solve vs the scatter/PCG
    formulation measured on TPU v5e. Materializing the full row matrix
    (P/hs + 3E, 6N) bf16 once beats the earlier chunked lax.scan, whose
    (6N,6N) f32 carry paid 151 MB of read+write per chunk."""
    jtj, jtr, cost_d = data_system(cfg, s, dqs, n_nodes, point_to_plane)
    jtj_e, jtr_e, cost_e = edge_system(cfg, s, dqs, n_nodes)
    return jtj + jtj_e, jtr + jtr_e, cost_d + cost_e


def data_jtj(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    jac: jnp.ndarray,
    n_nodes: int,
    col_scale_reduce=None,
):
    """Data-term JtJ from the (sqrt-weighted) per-point Jacobians: one syrk
    over bf16 one-hot-expanded rows. The Hessian is only a step model — LM
    accept/reject uses the exact cost — so bf16 rows don't affect
    correctness."""
    dof = 6 * n_nodes
    oh = jax.nn.one_hot(s.knn_idx, n_nodes, dtype=jnp.bfloat16)  # (P,K,N)
    a = jnp.einsum(
        "pkn,prkd->prnd", oh, jac.astype(jnp.bfloat16)
    ).reshape(-1, dof)
    if cfg.solver_jtj_int8:
        # int8 rows with per-COLUMN scales: A = Q diag(c) factors exactly
        # through the syrk (A^T A = diag(c) Q^T Q diag(c)); the int8 MXU
        # path is ~5x the bf16 rate (2.7 vs 14.4 ms at bench shape).
        # Column scales absorb the rot-vs-trans dof magnitude split; the
        # only approximation is <= (0.5/127) of column max per entry.
        # Overflow note: the int32 Gram accumulates at most n_rows*127^2
        # per entry (2^31 at ~133k saturated rows), but the one-hot rows
        # are K-sparse per node so any column pair shares << n_rows
        # non-zero products; at the bench shape (<=20k rows) even the
        # dense bound is ~40x under the limit.
        af = a.astype(jnp.float32)
        cmax = jnp.max(jnp.abs(af), axis=0)
        if col_scale_reduce is not None:
            cmax = col_scale_reduce(cmax)
        c = jnp.maximum(cmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(af / c), -127.0, 127.0).astype(jnp.int8)
        g = jnp.dot(q.T, q, preferred_element_type=jnp.int32)
        jtj = g.astype(jnp.float32) * (c[:, None] * c[None, :])
    else:
        jtj = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
    return jtj


def data_jtr(
    s: SolveStructure,
    jac: jnp.ndarray,
    r: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    """Data-term gradient J^T r from (sqrt-weighted) Jacobians+residuals.
    jac^T r needs better than bf16 — _scatter_jtr's bf16 hi+lo split is
    exact to ~2^-16 relative with no f32 one-hot materialization."""
    jr = jnp.einsum("prkd,pr->pkd", jac, r)  # (P, K, 6) f32
    return _scatter_jtr(s, jr, n_nodes)


def data_system(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    n_nodes: int,
    point_to_plane: bool,
    col_scale_reduce=None,
):
    """Data-term contribution to the normal equations. Touches only the
    point fields of ``s`` — on a point shard inside shard_map this is the
    per-device partial whose psum is the distributed GN reduction.

    ``col_scale_reduce`` (optional, (6N,) -> (6N,)) reduces the per-column
    |A| maxima across shards BEFORE int8 quantization — the distributed
    assembly passes a pmax so every shard quantizes with the same global
    scales and the psum of shard Grams equals the single-device int8
    assembly exactly (diag(c) (sum_s Qs^T Qs) diag(c)).

    Returns (jtj, jtr, cost): the data-term robust cost at the
    linearization point rides along (shards psum it like jtr)."""
    r, jac, cost = data_residual_and_jac(cfg, s, dqs, point_to_plane)
    jtj = data_jtj(cfg, s, jac, n_nodes, col_scale_reduce)
    jtr = data_jtr(s, jac, r, n_nodes)
    return jtj, jtr, cost


def edge_system(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    n_nodes: int,
):
    """ARAP edge contribution to the normal equations (small: E = N*k_edge
    edges; replicated in the distributed solve), assembled BLOCKWISE in f32.

    Each edge (i, j) contributes exactly four 6x6 blocks to JtJ:
    (i,i) += Ji^T Ji, (i,j) += Ji^T Jj, (j,i) += its transpose,
    (j,j) += Jj^T Jj. The per-edge blocks are ~5 MFLOP of small batched
    matmuls; block PLACEMENT into the (6N, 6N) matrix is where naive
    formulations die on TPU, so every placement is an einsum whose OUTPUT
    index order is already the final (n, a, m, b) layout — the (j,i)
    transpose and the diagonal embed included — so XLA emits no separate
    transpose or scatter of the 151 MB full matrix. Measured on v5e at
    N=1024/E=4096: ~2 ms vs 22 ms for the int8 expanded-row syrk of the
    (3E, 6N) row matrix (whose expansion materializes ~1 GB of one-hot
    outer products; int8 only pays off for the data term's P >> E rows)
    and ~16 ms for the transpose+at[].add blockwise variant.

    Returns (jtj, jtr, cost) like data_system."""
    re, je_i, je_j, cost = edge_residual_and_jac(cfg, s, dqs)
    jtj = edge_jtj(s, je_i, je_j, n_nodes)
    jtr = edge_jtr(s, je_i, je_j, re, n_nodes)
    return jtj, jtr, cost


def edge_jtj(
    s: SolveStructure,
    je_i: jnp.ndarray,
    je_j: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    dof = 6 * n_nodes
    e = s.e_src.shape[0]
    c = e // n_nodes  # k_edge: e_src = repeat(arange(N), c) by construction
    oh_d = jax.nn.one_hot(s.e_dst, n_nodes, dtype=jnp.float32)  # (E, N)

    hi = jax.lax.Precision.HIGHEST  # f32-exact one-hot placement (cheap)
    h_ii = jnp.einsum("era,erb->eab", je_i, je_i, precision=hi)  # (E, 6, 6)
    h_jj = jnp.einsum("era,erb->eab", je_j, je_j, precision=hi)
    h_ij = jnp.einsum("era,erb->eab", je_i, je_j, precision=hi)

    # diagonal blocks: ii lands on the (static) source rows; jj scatters
    # to dst via a one-hot matmul (302 MFLOP at bench shape)
    diag = h_ii.reshape(n_nodes, c, 6, 6).sum(axis=1)
    diag = diag + jnp.einsum(
        "en,eab->nab", oh_d, h_jj, precision=hi,
        preferred_element_type=jnp.float32,
    )

    # off-diagonal blocks, placed DIRECTLY in the final (n, a, m, b)
    # layout: (i,j) and its (j,i) transpose are the same einsum with
    # permuted output indices; the diagonal embeds via an eye one-hot.
    # REJECTED round-3 variant (measured, do not revisit): one placement
    # einsum + `off + off.T` + a unique-index diagonal scatter-add looks
    # like 1/3 of the 151 MB writes on paper but measured +40 ms on the
    # whole frame (171.9 vs 131.7 ms) — the (6144,6144) transpose-add and
    # the advanced-index scatter both break XLA's fusion of the placement
    # into the downstream add, while the three pure einsums below fuse.
    oh_dr = oh_d.reshape(n_nodes, c, n_nodes)
    hij_r = h_ij.reshape(n_nodes, c, 6, 6)
    full = jnp.einsum(
        "ncm,ncab->namb", oh_dr, hij_r, precision=hi,
        preferred_element_type=jnp.float32,
    )
    full = full + jnp.einsum(
        "ncm,ncab->mbna", oh_dr, hij_r, precision=hi,
        preferred_element_type=jnp.float32,
    )
    full = full + jnp.einsum(
        "nm,nab->namb", jnp.eye(n_nodes, dtype=jnp.float32), diag,
        precision=hi,
    )
    return full.reshape(dof, dof)


def edge_jtr(
    s: SolveStructure,
    je_i: jnp.ndarray,
    je_j: jnp.ndarray,
    re: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    """Edge gradient in f32: source side static-structured, dst via
    one-hot."""
    e = s.e_src.shape[0]
    c = e // n_nodes
    oh_d = jax.nn.one_hot(s.e_dst, n_nodes, dtype=jnp.float32)
    g_i = jnp.einsum("erd,er->ed", je_i, re)  # (E, 6)
    g_j = jnp.einsum("erd,er->ed", je_j, re)
    return (
        g_i.reshape(n_nodes, c, 6).sum(axis=1)
        + jnp.einsum(
            "en,ed->nd", oh_d, g_j, precision=jax.lax.Precision.HIGHEST
        )
    ).reshape(-1)


def edge_blocks(
    s: SolveStructure,
    je_i: jnp.ndarray,
    je_j: jnp.ndarray,
    n_nodes: int,
):
    """FACTORED ARAP edge system for the matrix-free PCG path: the four
    per-edge 6x6 blocks are kept as (E,6,6) batches instead of being
    placed into the dense (6N,6N) matrix. The dense placement
    (edge_jtj) costs ~2 ms of einsums PLUS a measured 12.4 ms/frame
    layout-transpose copy of the 151 MB result on v5e (XLA materializes
    the (n,a,m,b) einsum output in a transposed layout and pays a full
    copy before the reshape — trace round 4); the factored form feeds
    edge_matvec at ~zero cost per PCG iteration. Returns a dict with the
    blocks, the dst one-hot, and the summed per-node diagonal blocks
    (the edge share of the block-Jacobi preconditioner)."""
    hi = jax.lax.Precision.HIGHEST
    e = s.e_src.shape[0]
    c = e // n_nodes
    h_ii = jnp.einsum("era,erb->eab", je_i, je_i, precision=hi)
    h_jj = jnp.einsum("era,erb->eab", je_j, je_j, precision=hi)
    h_ij = jnp.einsum("era,erb->eab", je_i, je_j, precision=hi)
    oh_d = jax.nn.one_hot(s.e_dst, n_nodes, dtype=jnp.float32)
    diag = h_ii.reshape(n_nodes, c, 6, 6).sum(axis=1) + jnp.einsum(
        "en,eab->nab", oh_d, h_jj, precision=hi
    )
    return dict(h_ii=h_ii, h_jj=h_jj, h_ij=h_ij, oh_d=oh_d, diag_blocks=diag)


def edge_matvec(
    s: SolveStructure,
    eb: dict,
    p: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    """(6N,) matvec of the factored ARAP system: row-gather p at each
    edge's endpoints, batched 6x6 block products, src side placed by the
    static repeat structure (reshape-sum, no scatter), dst side by one
    small one-hot matmul."""
    hi = jax.lax.Precision.HIGHEST
    pm = p.reshape(n_nodes, 6)
    p_i = jnp.take(pm, s.e_src, axis=0)
    p_j = jnp.take(pm, s.e_dst, axis=0)
    q_i = (
        jnp.einsum("eab,eb->ea", eb["h_ii"], p_i, precision=hi)
        + jnp.einsum("eab,eb->ea", eb["h_ij"], p_j, precision=hi)
    )
    q_j = (
        jnp.einsum("eba,eb->ea", eb["h_ij"], p_i, precision=hi)
        + jnp.einsum("eab,eb->ea", eb["h_jj"], p_j, precision=hi)
    )
    out = q_i.reshape(n_nodes, -1, 6).sum(axis=1) + jnp.einsum(
        "en,ea->na", eb["oh_d"], q_j, precision=hi
    )
    return out.reshape(-1)


def gn_eval(
    cfg: DynamicFusionConfig,
    s: SolveStructure,
    dqs: jnp.ndarray,
    n_nodes: int,
    point_to_plane: bool,
):
    """Gradient + true robust cost at ``dqs`` WITHOUT the Hessian — the
    lagged-JtJ LM loop's per-candidate evaluation (see solve). ONE vjp
    pass for the data gradient (data_grad_cost — independent of the
    residual dimension, which matters for the 4-dim blended data term) +
    the small edge system. Returns (jtr, cost)."""
    jtr, cost_d = data_grad_cost(cfg, s, dqs, n_nodes, point_to_plane)
    re, je_i, je_j, cost_e = edge_residual_and_jac(cfg, s, dqs)
    jtr_e = edge_jtr(s, je_i, je_j, re, n_nodes)
    return jtr + jtr_e, cost_d + cost_e


# --------------------------------------------------------------------------
# linear solvers
# --------------------------------------------------------------------------


def _diag_blocks(a: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """(N, 6, 6) per-node diagonal blocks of a (6N, 6N) matrix."""
    blocks = a.reshape(n_nodes, 6, n_nodes, 6)
    ar = jnp.arange(n_nodes)
    return blocks[ar, :, ar, :]


def _sym3_inv(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (...,3,3) symmetric positive-definite
    matrices (adjugate / det) — a handful of fused VPU multiplies."""
    a11, a12, a13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a22, a23, a33 = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    det = a11 * c11 + a12 * c12 + a13 * c13
    s = jnp.sign(det)
    inv_det = s / jnp.maximum(jnp.abs(det), 1e-30)
    row0 = jnp.stack([c11, c12, c13], -1)
    row1 = jnp.stack([c12, c22, c23], -1)
    row2 = jnp.stack([c13, c23, c33], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


def spd6_inv(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (N, 6, 6) SPD matrices via the 2x2-block
    Schur complement with symmetric 3x3 adjugate inverses. Replaces
    jnp.linalg.inv here because XLA lowers the batched inverse to LU —
    a measured ~3 ms per preconditioner rebuild at N=1024 on v5e, vs
    a few fused einsums for this closed form. These are LM-damped
    diagonal blocks (floor-regularized), well inside f32 range."""
    hi = jax.lax.Precision.HIGHEST
    a = m[..., :3, :3]
    b = m[..., :3, 3:]
    c = m[..., 3:, 3:]
    a_inv = _sym3_inv(a)
    a_inv_b = jnp.einsum("nij,njk->nik", a_inv, b, precision=hi)
    schur = c - jnp.einsum("nji,njk->nik", b, a_inv_b, precision=hi)
    s_inv = _sym3_inv(0.5 * (schur + jnp.swapaxes(schur, -1, -2)))
    tl = a_inv + jnp.einsum(
        "nij,njk,nlk->nil", a_inv_b, s_inv, a_inv_b, precision=hi
    )
    tr = -jnp.einsum("nij,njk->nik", a_inv_b, s_inv, precision=hi)
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(tr, -1, -2), s_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _block_diag_inv(a: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """(N, 6, 6) inverses of the per-node diagonal blocks of a (6N, 6N)
    SPD matrix — the block-Jacobi preconditioner (the same per-node Schur
    block the distributed GN reduces over)."""
    return spd6_inv(_diag_blocks(a, n_nodes))


def _pcg(matvec, minv: jnp.ndarray, b: jnp.ndarray, n_nodes: int, iters: int, rtol: float) -> jnp.ndarray:
    """Preconditioned conjugate gradients over an abstract SPD ``matvec``
    with the block-Jacobi (per-node 6x6) preconditioner ``minv`` (N, 6, 6).
    Under a sharded mesh the matvec psums a per-shard partial product
    (24.6 KB/iteration at 1024 nodes) — the distributed linear solve of
    SCALING.md §4."""

    def apply_m(v):
        return jnp.einsum("nij,nj->ni", minv, v.reshape(n_nodes, 6)).reshape(-1)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_m(r0)
    p0 = z0
    stop2 = (rtol * rtol) * jnp.dot(b, b)

    def cond(st):
        i, _, r, _, _ = st
        return (i < iters) & (jnp.dot(r, r) > stop2)

    def body(st):
        i, x, r, p, rz = st
        ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.dot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_m(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return (i + 1, x, r, z + beta * p, rz_new)

    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x0, r0, p0, jnp.dot(r0, z0))
    )
    return x


def _pcg_solve(
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_nodes: int,
    iters: int,
    rtol: float,
) -> jnp.ndarray:
    """Dense-matrix PCG (the reference Opt solver's GN+PCG structure,
    kinfu.cpp:116-117) — single-device convenience wrapper of _pcg."""
    return _pcg(lambda p: a @ p, _block_diag_inv(a, n_nodes), b, n_nodes, iters, rtol)


def _solve_linear(cfg: DynamicFusionConfig, damped: jnp.ndarray, jtr: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    if cfg.solver_linear == "pcg":
        return -_pcg_solve(
            damped, jtr, n_nodes, cfg.solver_linear_iters, cfg.solver_linear_tol
        )
    return -jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(damped, lower=True), jtr
    )


def _should_reuse_chol(cfg: DynamicFusionConfig, use_lagged: bool) -> bool:
    """Whether the LM loop can carry ONE Cholesky factor across iterations
    (cfg.solver_chol_reuse): valid only with the lagged-JtJ Hessian (jtj is
    constant within a solve, so the damped matrix changes ONLY through the
    LM lambda) and the direct linear solver."""
    return cfg.solver_chol_reuse and use_lagged and cfg.solver_linear == "direct"


# --------------------------------------------------------------------------
# rigid pre-alignment (two-step optimization)
# --------------------------------------------------------------------------


def rigid_prealign(
    cfg: DynamicFusionConfig,
    field: WarpField,
    inputs: WarpSolveInputs,
    stride: int = 4,
    iters: int = 3,
) -> jnp.ndarray:
    """Robust 6-dof rigid fit of the live surface to the warped canonical
    model, to be folded into the camera pose BEFORE the non-rigid solve.

    Without it, residual camera-pose error is representable by (and gets
    absorbed into) the warp field, which removes ICP's restoring force —
    pose drift then random-walks to tracking failure (measured on a static
    scene). With the warp's current prediction W(canonical) as the target,
    the misfit seen here is pose error + one frame of NEW deformation; the
    deformation is local while pose error moves every (Tukey-inlier) point
    rigidly, so the robust fit recovers the pose error. Two-step
    (rigid-then-nonrigid) optimization of embedded deformation graphs is
    the structure of arXiv:1906.08477.

    Returns T (4, 4): apply as pose <- T @ pose; live world points as
    p <- T p (the caller re-derives them from the corrected pose)."""
    k = cfg.knn_k
    p_can = inputs.p_can[::stride]
    p_live = inputs.p_live[::stride]
    n_live = inputs.n_live[::stride]
    valid = (
        ~jnp.isnan(p_can[:, 0])
        & ~jnp.isnan(p_live[:, 0])
        & ~jnp.isnan(n_live[:, 0])
    )
    p_can = jnp.nan_to_num(p_can)
    p_live = jnp.nan_to_num(p_live)
    n_live = jnp.nan_to_num(n_live)

    # current field's live-surface prediction of the canonical samples
    w_can = warpfield.warp_points(
        field, p_can, k=k, method=cfg.knn_method
    )
    valid = valid & jnp.isfinite(w_can).all(axis=-1)
    w_can = jnp.nan_to_num(w_can)

    from dynamicfusion_tpu.core import se3

    t_acc = jnp.eye(4)
    for _ in range(iters):
        pl = se3.transform_points(t_acc, p_live)
        nl = se3.rotate_dirs(t_acc, n_live)
        r = jnp.sum(nl * (w_can - pl), axis=-1)          # (P,)
        sw = tukey_sqrt_weight(r, cfg.solver_tukey_c) * valid
        row = jnp.concatenate([jnp.cross(pl, nl), nl], axis=-1) * sw[:, None]
        rhs = r * sw
        hi = jax.lax.Precision.HIGHEST
        a = jnp.einsum("pi,pj->ij", row, row, precision=hi)
        b = jnp.einsum("pi,p->i", row, rhs, precision=hi)
        good = jnp.isfinite(jnp.linalg.det(a)) & (jnp.abs(jnp.linalg.det(a)) > 1e-15)
        a_safe = jnp.where(good, a, jnp.eye(6))
        x = jnp.linalg.solve(a_safe, jnp.where(good, b, jnp.zeros(6)))
        x = jnp.where(good & jnp.isfinite(x).all(), x, jnp.zeros(6))
        t_acc = jnp.where(good, se3.compose(se3.exp_twist(x), t_acc), t_acc)
    return t_acc


# --------------------------------------------------------------------------
# the solver
# --------------------------------------------------------------------------


def solve(
    cfg: DynamicFusionConfig,
    field: WarpField,
    inputs: WarpSolveInputs,
    point_to_plane: Optional[bool] = None,
    system_fn=None,
    eval_fn=None,
    axis_name: Optional[str] = None,
    axis_size: int = 1,
    global_points: int | None = None,
) -> Tuple[WarpField, SolveStats]:
    """Estimate the warp field for the current frame.

    Equivalent pipeline role to WarpFieldOptimiser::optimiseWarpData
    (/root/reference/kfusion/src/warp_field_optimiser.cpp:7-17) with the
    solver schedule of kinfu.cpp:114-121 (cfg.solver_nonlinear_iters outer
    LM steps).

    ``system_fn(s, dqs) -> (jtj, jtr, cost)`` overrides the normal-equation
    assembly (the distributed shard_map+psum assembly in
    parallel/distributed_gn.py plugs in here); ``cost`` is the true robust
    cost at the linearization point (the relinearization's residuals make
    it free — no separate initial cost_at).

    ``eval_fn(s, dqs) -> (jtr, cost)`` enables the LAGGED-JtJ loop (see
    below; built automatically from cfg.solver_lagged_jtj for the local
    path, or pass distributed_gn.make_eval_fn for the sharded one).

    ``axis_name`` (with static mesh size ``axis_size``): fully-distributed
    mode — the WHOLE solve body runs inside a shard_map over a point shard
    of `inputs` with nodes replicated (parallel.distributed_gn.
    make_sharded_solve wraps it). The data-term Gram stays UNSUMMED
    per-shard; only (6N,)-sized reductions ever cross the wire: the psum'd
    gradient/cost, the pmax'd int8 column scales, the once-per-solve psum
    of the diagonal + (N,6,6) preconditioner blocks, and one 24.6 KB psum
    per PCG matvec — ~0.9 MB per solve at 1024 nodes vs the 151 MB Schur
    all-reduce of the summed assembly (SCALING.md §4). Requires
    solver_lagged_jtj and solver_linear == "pcg"."""
    if point_to_plane is None:
        point_to_plane = cfg.point_to_plane
    n_nodes = field.positions.shape[0]
    dof = 6 * n_nodes

    if axis_name is not None:
        assert cfg.solver_lagged_jtj and cfg.solver_linear == "pcg", (
            "distributed-PCG solve mode needs the lagged-JtJ loop and the "
            "pcg linear solver (cfg.solver_lagged_jtj, solver_linear)"
        )
        assert system_fn is None and eval_fn is None

    # FACTORED-PCG path (single-chip AND distributed): the data Gram is a
    # dense (6N,6N) matrix (one int8 syrk) but the ARAP edge system stays
    # as per-edge 6x6 blocks — never placed into a dense matrix (a
    # measured 12.4 ms/frame layout-copy on v5e, see edge_blocks) and
    # never Cholesky-factored (11.4 ms/frame): the linear solve is
    # block-Jacobi PCG over matvecs of (data Gram + edge blocks + damping).
    factored = (
        cfg.solver_linear == "pcg" and cfg.solver_lagged_jtj and system_fn is None
    )
    if factored:

        def system_fn(s_, dqs_):
            r, jac, cost_d = data_residual_and_jac(cfg, s_, dqs_, point_to_plane)
            # LAGGED TANGENTIAL HESSIAN (round 5): with the tangential p2p
            # term on, the PCG row matrix keeps ONLY the plane rows —
            # the tangential residuals still drive the gradient, the
            # exact cost, and the (N,6,6) preconditioner/damping blocks
            # below, but not the matvec. The Hessian is a step metric
            # (accept/reject is exact-cost; same argument as the lagged
            # JtJ itself), and the measured alternative — 3x the rows —
            # is ~11 ms/frame of pure matvec bandwidth at the bench
            # shape. Quality-gated on the full battery.
            jac_rows = (
                jac[:, :1]
                if point_to_plane
                and cfg.solver_p2p_weight > 0.0
                and cfg.solver_p2p_lag_hessian
                else jac
            )
            tang_stride = (
                cfg.solver_p2p_hessian_stride
                if point_to_plane
                and cfg.solver_p2p_weight > 0.0
                and not cfg.solver_p2p_lag_hessian
                else 1
            )
            # MATRIX-FREE data term: keep the (P, 6N) bf16 one-hot-expanded
            # row matrix (39 MB at bench shape) instead of its dense
            # (6N,6N) Gram (151 MB + an int8 syrk) — each PCG matvec is
            # two skinny bf16 matmuls (~0.1 ms) instead of a 151 MB dense
            # read, and the relinearization skips the syrk entirely. The
            # Hessian is only the step metric (accept/reject is on the
            # exact cost), so bf16 rows are as valid here as they were
            # inside the syrk. Exact-jac per-node diagonal blocks ride
            # along for the block-Jacobi preconditioner + damping diagonal.
            hi = jax.lax.Precision.HIGHEST
            oh16 = jax.nn.one_hot(s_.knn_idx, n_nodes, dtype=jnp.bfloat16)
            # rows in the einsum's NATURAL (p, r, d, n) output layout —
            # i.e. with D-MAJOR columns (dof index d*N + n). Forcing
            # node-major columns ("->prnd") makes XLA materialize a
            # transposed copy of the whole row matrix (measured 19 ms at
            # the 4-dim blended data term); instead the matvec permutes
            # its (6N,) VECTOR between node-major and d-major (free).
            # Row ORDER never matters for the Gram.
            if tang_stride > 1:
                # plane rows exact; tangential rows every tang_stride-th
                # point, sqrt-rescaled (cfg.solver_p2p_hessian_stride)
                rows_p = jnp.einsum(
                    "prkd,pkn->prdn",
                    jac[:, :1].astype(jnp.bfloat16), oh16,
                ).reshape(-1, 6 * n_nodes)
                rows_t = jnp.einsum(
                    "prkd,pkn->prdn",
                    (jac[::tang_stride, 1:] * math.sqrt(tang_stride)).astype(
                        jnp.bfloat16
                    ),
                    oh16[::tang_stride],
                ).reshape(-1, 6 * n_nodes)
                rows = jnp.concatenate([rows_p, rows_t], axis=0)
            else:
                rows = jnp.einsum(
                    "prkd,pkn->prdn", jac_rows.astype(jnp.bfloat16), oh16
                ).reshape(-1, 6 * n_nodes)
            h_p = jnp.einsum("prkd,prke->pkde", jac, jac, precision=hi)
            oh32 = jax.nn.one_hot(s_.knn_idx, n_nodes, dtype=jnp.float32)
            blocks_d = jnp.einsum("pkn,pkde->nde", oh32, h_p, precision=hi)
            jtr_d = data_jtr(s_, jac, r, n_nodes)
            if axis_name is not None:
                jtr_d, cost_d = jax.lax.psum((jtr_d, cost_d), axis_name)
            re, je_i, je_j, cost_e = edge_residual_and_jac(cfg, s_, dqs_)
            eb = edge_blocks(s_, je_i, je_j, n_nodes)
            jtr_e = edge_jtr(s_, je_i, je_j, re, n_nodes)
            # under axis_name the row matrix stays the UNSUMMED local shard
            # (the PCG matvec psums its product); the edge system is
            # replicated node-space work applied once AFTER the psum
            return (rows, blocks_d, eb), jtr_d + jtr_e, cost_d + cost_e

        if axis_name is not None:

            def eval_fn(s_, dqs_):
                jtr_d, cost_d = data_grad_cost(cfg, s_, dqs_, n_nodes, point_to_plane)
                jtr_d, cost_d = jax.lax.psum((jtr_d, cost_d), axis_name)
                re, je_i, je_j, cost_e = edge_residual_and_jac(cfg, s_, dqs_)
                jtr_e = edge_jtr(s_, je_i, je_j, re, n_nodes)
                return jtr_d + jtr_e, cost_d + cost_e

        elif eval_fn is None:
            eval_fn = lambda s_, dqs_: gn_eval(cfg, s_, dqs_, n_nodes, point_to_plane)

    if global_points is None and axis_name is not None:
        # fallback: the padded global count (callers that care about exact
        # cross-mesh threshold equivalence — make_sharded_solve — pass the
        # UNPADDED count, so the P > 8192 / hessian-stride decisions match
        # the single-device solve even when NaN padding crosses a threshold)
        global_points = inputs.p_can.shape[0] * axis_size
    s = prepare(cfg, field, inputs, point_to_plane, global_points=global_points)

    # ---- outer LM loop ----
    dqs = field.dq
    lm_lambda = jnp.asarray(cfg.solver_lm_lambda_init, jnp.float32)
    accepted = jnp.zeros((), jnp.int32)

    active_dof = jnp.repeat(field.active, 6)

    # After a REJECTED LM step the linearization point is unchanged, so the
    # system (jtj, jtr) can be reused with a larger damping — only accepted
    # steps pay for re-linearization + assembly (classic LM bookkeeping the
    # naive unroll would waste ~110 ms/iteration on). Once the relative
    # cost improvement falls below solver_function_tolerance (the Opt
    # solver's fn-tolerance semantics, CombinedSolver.h:88), remaining
    # iterations are skipped entirely via lax.cond — warm-started frames
    # with little new deformation converge in 1-2 iterations.
    #
    # LAGGED-JtJ mode (cfg.solver_lagged_jtj / eval_fn given): the FULL
    # system (Hessian) is assembled only at iteration 0; afterwards each
    # candidate is evaluated by ``eval_fn``, whose cost decides
    # accept/reject (exact, like cost_at) and whose FRESH gradient becomes
    # the next iteration's Jtr when accepted — the Hessian stays lagged
    # (Shamanskii/chord iteration). The gradient is exact at every
    # linearization point, so converged fixed points are unchanged; only
    # the step metric is stale. Measured quality-neutral on the
    # deforming-sphere bench; saves the one-hot expansion + int8 syrk +
    # edge-block placement (~15 ms/iteration at bench shape) on every
    # iteration after the first.
    if system_fn is None:
        system_fn = lambda s_, dqs_: gn_system_dense(
            cfg, s_, dqs_, n_nodes, point_to_plane
        )
        if eval_fn is None and cfg.solver_lagged_jtj:
            eval_fn = lambda s_, dqs_: gn_eval(
                cfg, s_, dqs_, n_nodes, point_to_plane
            )
    use_lagged = eval_fn is not None

    if use_lagged:
        # the ONE full relinearization happens before the loop (also keeps
        # a distributed system_fn's shard_map out of the while_loop body,
        # where the SPMD partitioner handles it catastrophically slowly)
        jtj, jtr, cost_init = system_fn(s, dqs)
    else:
        jtj = jnp.zeros((dof, dof))
        jtr = jnp.zeros((dof,))
        cost_init = jnp.zeros(())

    use_matvec = factored
    if use_matvec:
        # once per relinearization: the full diagonal (damping) and the
        # (N,6,6) diagonal blocks (block-Jacobi preconditioner). Under
        # axis_name these are the distributed solve's ONLY matrix-shaped
        # reductions — the row matrix stays per-shard; every PCG matvec
        # psums its (6N,) product.
        _, data_blocks, eb0 = jtj
        if axis_name is not None:
            data_blocks = jax.lax.psum(data_blocks, axis_name)
        blocks_full = data_blocks + eb0["diag_blocks"]
        diag_full = jnp.diagonal(blocks_full, axis1=-2, axis2=-1).reshape(-1)

    reuse_chol = _should_reuse_chol(cfg, use_lagged) and not use_matvec

    def _damped_system(jtj, lm_lambda):
        # LM damping on the diagonal + unit diagonal for inactive/empty dofs.
        # The damping floor (a fraction of the mean active diagonal) keeps
        # weakly-observed nodes — a handful of Tukey-weighted points for 6
        # dof — from taking near-unregularized steps: measured 150-480 mm
        # runaway translations on silhouette nodes without it.
        diag = jnp.diagonal(jtj)
        mean_diag = jnp.sum(jnp.where(active_dof, diag, 0.0)) / jnp.maximum(
            jnp.sum(active_dof.astype(jnp.float32)), 1.0
        )
        diag_eff = jnp.maximum(diag, cfg.solver_damping_floor * mean_diag)
        return (
            jtj
            + jnp.diag(lm_lambda * diag_eff)
            + jnp.diag(jnp.where(active_dof & (diag > 1e-12), 1e-8, 1.0))
        )

    def lm_iteration(st):
        (it, dqs, lm_lambda, cost_prev, cost0, accepted, jtj, jtr, chol,
         need_relin, _) = st
        if use_lagged:
            cost_lin = jnp.where(it == 0, cost_init, cost_prev)
        else:
            jtj, jtr, cost_lin = jax.lax.cond(
                need_relin,
                lambda dqs=dqs: system_fn(s, dqs),
                lambda: (jtj, jtr, cost_prev),
            )
        # the relinearization's cost IS the cost at the current point (on
        # iteration 0 it is the solve's initial cost)
        cost_prev = cost_lin
        cost0 = jnp.where(it == 0, cost_lin, cost0)
        if use_matvec:
            # factored PCG: damping (and the edge blocks) apply AFTER the
            # data-Gram matvec (psum'd under axis_name), so the solved
            # system is exactly the dense path's damped one
            diag = diag_full
            mean_diag = jnp.sum(jnp.where(active_dof, diag, 0.0)) / jnp.maximum(
                jnp.sum(active_dof.astype(jnp.float32)), 1.0
            )
            diag_eff = jnp.maximum(diag, cfg.solver_damping_floor * mean_diag)
            damp = lm_lambda * diag_eff + jnp.where(
                active_dof & (diag > 1e-12), 1e-8, 1.0
            )
            rows, _, eb = jtj

            def mv(p):
                # rows carry D-MAJOR columns (see system_fn): permute the
                # vector in and out instead of transposing the 100+ MB
                # row matrix
                pd = p.reshape(n_nodes, 6).T.reshape(-1)
                t = jnp.dot(rows, pd.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                apd = jnp.dot(t.astype(jnp.bfloat16), rows,
                              preferred_element_type=jnp.float32)
                ap = apd.reshape(6, n_nodes).T.reshape(-1)
                if axis_name is not None:
                    ap = jax.lax.psum(ap, axis_name)
                return ap + edge_matvec(s, eb, p, n_nodes) + damp * p

            # the block-Jacobi preconditioner is rebuilt only at iteration
            # 0 and after a REJECTED step raised lm_lambda 8x (the same
            # policy as the direct path's Cholesky reuse): the batched
            # (N,6,6) LU inverse costs ~1.5 ms/rebuild, accepts only halve
            # an already-small lambda, and the preconditioner never
            # changes the solved (exactly-damped) system — only PCG's
            # convergence rate. Preconditioning with the fully-stale
            # once-per-solve variant measured a worse p95 tail (seed-1
            # battery 2.5 -> 4.2 mm), so rejections DO rebuild.
            chol = jax.lax.cond(
                (it == 0) | ~need_relin,
                lambda: spd6_inv(
                    blocks_full + jax.vmap(jnp.diag)(damp.reshape(n_nodes, 6))
                ),
                lambda: chol,
            )
            step = -_pcg(
                mv, chol, jtr, n_nodes, cfg.solver_linear_iters,
                cfg.solver_linear_tol,
            )
        elif reuse_chol:
            # ONE Cholesky factorization per solve (chord/Shamanskii, like
            # the lagged Hessian itself): the factor is rebuilt only when a
            # REJECTED step raised lm_lambda by 8x (a materially different
            # damped matrix — and reusing the factor there would re-produce
            # the identical rejected candidate). After an ACCEPT, lambda
            # only halves: at the warm-started operating point it sits at
            # <= 1e-4 of the diagonal, so the slightly-staler (more damped)
            # factor changes the step negligibly while accept/reject stays
            # exact-cost. Saves the ~9 ms (6144-dof) factorization on every
            # accepted iteration after the first.
            chol = jax.lax.cond(
                (it == 0) | ~need_relin,  # need_relin = previous step accepted
                lambda: jax.scipy.linalg.cho_factor(
                    _damped_system(jtj, lm_lambda), lower=True
                )[0],
                lambda: chol,
            )
            step = -jax.scipy.linalg.cho_solve((chol, True), jtr)
        else:
            damped = _damped_system(jtj, lm_lambda)
            step = _solve_linear(cfg, damped, jtr, n_nodes)
        step = step.reshape(n_nodes, 6)
        step = jnp.where(
            field.active[:, None] & jnp.isfinite(step).all(-1, keepdims=True),
            step,
            0.0,
        )
        # trust-region clamp: cap each node's twist norm so weakly
        # constrained nodes can't fly off in a single LM step
        sn = jnp.linalg.norm(step, axis=-1, keepdims=True)
        step = step * jnp.minimum(1.0, cfg.solver_max_step / jnp.maximum(sn, 1e-12))

        cand = dualquat.normalize(
            dualquat.mul(dualquat.from_twist(step[:, :3], step[:, 3:]), dqs)
        )
        if use_lagged:
            jtr_cand, cand_cost = eval_fn(s, cand)
        else:
            jtr_cand, cand_cost = jtr, cost_at(cfg, s, cand, point_to_plane)
        better = cand_cost < cost_prev
        improvement = jnp.where(better, cost_prev - cand_cost, 0.0)
        dqs = jnp.where(better, cand, dqs)
        jtr = jnp.where(better, jtr_cand, jtr)
        cost_prev = jnp.where(better, cand_cost, cost_prev)
        lm_lambda = jnp.where(better, lm_lambda * 0.5, lm_lambda * 8.0)
        lm_lambda = jnp.clip(lm_lambda, 1e-8, 1e6)
        accepted = accepted + better.astype(jnp.int32)
        converged = better & (
            improvement <= cfg.solver_function_tolerance * jnp.maximum(cost_prev, 1e-20)
        )
        return (it + 1, dqs, lm_lambda, cost_prev, cost0, accepted, jtj, jtr,
                chol, better, converged)

    # while_loop (not an unrolled cond chain): same early-exit semantics,
    # one compiled body. NB an unrolled chain of lax.cond(converged, ...)
    # around this body segfaults this toolchain's CPU compiler when other
    # large graphs were compiled earlier in the process.
    def lm_cond(st):
        return (st[0] < cfg.solver_nonlinear_iters) & ~st[-1]

    zero = jnp.zeros(())
    # the `chol` loop slot carries whichever reusable linear-solve factor
    # the mode needs: the (6N,6N) Cholesky factor (direct+reuse), the
    # (N,6,6) block-Jacobi preconditioner (factored PCG), or a scalar
    # placeholder
    if reuse_chol:
        chol0 = jnp.zeros((dof, dof))
    elif use_matvec:
        chol0 = jnp.zeros((n_nodes, 6, 6))
    else:
        chol0 = jnp.zeros(())
    st = (
        jnp.zeros((), jnp.int32), dqs, lm_lambda, zero, zero, accepted,
        jtj, jtr, chol0, jnp.array(True), jnp.array(False),
    )
    st = jax.lax.while_loop(lm_cond, lm_iteration, st)
    dqs, lm_lambda, cost_prev, cost0, accepted = st[1], st[2], st[3], st[4], st[5]

    new_field = field._replace(dq=jnp.where(field.active[:, None], dqs, field.dq))
    return new_field, SolveStats(
        initial_cost=cost0, final_cost=cost_prev, accepted_steps=accepted
    )
