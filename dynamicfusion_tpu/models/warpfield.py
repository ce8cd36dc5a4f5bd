"""The deformation warp field W_t: a sparse set of deformation nodes.

TPU-native redesign of the reference's ``kfusion::WarpField``
(/root/reference/kfusion/src/warp_field.cpp,
/root/reference/kfusion/include/kfusion/warp_field.hpp:35-88). Nodes are
struct-of-arrays with a *static capacity* and an active mask (ragged node
sets don't jit); each node carries position dg_v, dual-quaternion transform
dg_se3 and radius dg_w. KNN is exact brute-force top-k over the node set —
node counts are O(hundreds..thousands), so the (chunked) distance matrix is
a small MXU matmul, replacing the reference's nanoflann KD-tree (which is a
pointer-chasing CPU structure that does not map to TPU).

Node insertion (the capability the reference left unimplemented —
Report.md:37-42, WarpField::clear() empty) is mask-based: uncovered surface
vertices are decimated by a coverage-cell hash and appended into free slots.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import dualquat

_BIG = 1e9


@functools.lru_cache(maxsize=32)
def _fair_perm(p: int) -> "jnp.ndarray":
    """Fixed pseudo-random permutation of [0, p) (compile-time constant).

    Candidate truncation at node capacity (``jnp.nonzero(size=cap)`` and
    the free-slot rank cut) otherwise keeps candidates in RASTER order —
    model-map pixels left-to-right, i.e. -x before +x in world — so
    whenever capacity is tight the +x side of the scene systematically
    loses node coverage. Measured (round 5, hinge hold-out diag): the +x
    sphere at 0.62 surface coverage vs 0.92 for the -x sphere, the
    deficit FOLLOWING a mirrored input — a pure pipeline asymmetry.
    Permuting candidates first makes the truncated subset spatially
    uniform. Returns a NUMPY array (a fresh jnp constant per trace —
    caching a device array across jit traces leaks tracers)."""
    import numpy as _np

    return _np.random.RandomState(0).permutation(p).astype(_np.int32)


class WarpField(NamedTuple):
    positions: jnp.ndarray  # (N, 3) canonical-frame node positions dg_v
    dq: jnp.ndarray         # (N, 8) node transforms dg_se3
    radius: jnp.ndarray     # (N,)   node radial-basis weight dg_w
    active: jnp.ndarray     # (N,)   bool
    count: jnp.ndarray      # scalar int32
    # frame index when the node last had canonical surface support within
    # node_support_radius (the capacity-lifecycle clock, insert_nodes;
    # stays 0 until first touched). Defaults to None so ad-hoc field
    # constructions (tests/scripts) that never run the lifecycle don't
    # need it.
    last_support: jnp.ndarray | None = None


def create(cfg: DynamicFusionConfig) -> WarpField:
    n = cfg.max_nodes
    return WarpField(
        positions=jnp.zeros((n, 3), jnp.float32),
        dq=jnp.broadcast_to(dualquat.identity(), (n, 8)),
        radius=jnp.full((n,), cfg.node_radius, jnp.float32),
        active=jnp.zeros((n,), bool),
        count=jnp.zeros((), jnp.int32),
        last_support=jnp.zeros((n,), jnp.int32),
    )


def _adaptive_radius(
    cfg: DynamicFusionConfig,
    positions: jnp.ndarray,  # (M, 3) candidate node positions
    ref_pos: jnp.ndarray,    # (N, 3) reference node set (may equal positions)
    ref_ok: jnp.ndarray,     # (N,) bool
    self_ref: bool,
) -> jnp.ndarray:
    """Per-node dg_w from local node sampling density (the paper's §3.4
    intent; the reference stores a per-node weight but hardcodes it via a
    FIXME, warp_field.cpp:44-48): radius = scale * (distance to the
    node_radius_knn-th nearest other node), clipped to
    [node_radius_min, node_radius_max]. Uniform radius over-smooths where
    nodes are dense and under-covers where sparse."""
    k = cfg.node_radius_knn + (1 if self_ref else 0)
    d2 = (
        jnp.sum(positions * positions, axis=-1, keepdims=True)
        - 2.0 * positions @ ref_pos.T
        + jnp.sum(ref_pos * ref_pos, axis=-1)[None, :]
        + jnp.where(ref_ok, 0.0, _BIG)[None, :]
    )
    neg, _ = jax.lax.top_k(-d2, k)
    dk = jnp.sqrt(jnp.maximum(-neg[:, -1], 0.0))
    return jnp.clip(
        cfg.node_radius_scale * dk, cfg.node_radius_min, cfg.node_radius_max
    )


def init_from_cloud(
    cfg: DynamicFusionConfig, points: jnp.ndarray, valid: jnp.ndarray
) -> WarpField:
    """First-frame node sampling: every ``node_sample_step``-th valid surface
    vertex becomes a node with identity transform (WarpField::init,
    warp_field.cpp:41-62; the reference samples every 50th vertex)."""
    step = cfg.node_sample_step
    pts = points[::step]
    val = valid[::step]
    n = cfg.max_nodes

    # fair capacity truncation: permute candidates so dropping the tail
    # drops a spatially-uniform subset, not the +x end of the raster
    # order (see _fair_perm)
    perm = _fair_perm(pts.shape[0])
    pts = jnp.take(pts, perm, axis=0)
    val = jnp.take(val, perm)
    (sel,) = jnp.nonzero(val, size=n, fill_value=-1)
    ok = sel >= 0
    pos = jnp.where(ok[:, None], jnp.take(pts, jnp.maximum(sel, 0), axis=0), 0.0)

    if cfg.node_radius_adaptive:
        radius = jnp.where(
            ok, _adaptive_radius(cfg, pos, pos, ok, self_ref=True),
            cfg.node_radius,
        )
    else:
        radius = jnp.full((n,), cfg.node_radius, jnp.float32)
    return WarpField(
        positions=pos,
        dq=jnp.broadcast_to(dualquat.identity(), (n, 8)),
        radius=radius,
        active=ok,
        count=jnp.sum(ok.astype(jnp.int32)),
        last_support=jnp.zeros((n,), jnp.int32),
    )


# --------------------------------------------------------------------------
# KNN + blending weights
# --------------------------------------------------------------------------


def knn(
    field: WarpField,
    queries: jnp.ndarray,
    k: int,
    chunk: int = 16384,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN of each query point among active nodes.

    Returns (dist2 (P, k), idx (P, k)). Distances to inactive nodes are +inf
    (their Gaussian weight underflows to 0). The (chunk, N) distance matrix
    is built from the |q|^2 + |n|^2 - 2 q.n expansion — the q.n term is an
    MXU matmul. Queries are processed in chunks to bound memory.

    method: "exact" uses lax.top_k; "approx" uses the TPU-optimized
    lax.approx_max_k (measured ~10x faster at 1024 nodes; recall ~0.95 —
    misses affect only the farthest neighbors, whose Gaussian blending
    weights are the smallest, so the pipeline uses approx by default)."""
    p = queries.shape[0]
    q = jnp.nan_to_num(queries)

    pad = (-p) % chunk
    qp = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)], axis=0)
    qc = qp.reshape(-1, chunk, 3)

    nodes = field.positions
    n2 = jnp.sum(nodes * nodes, axis=-1)
    inactive = jnp.where(field.active, 0.0, _BIG)

    def one_chunk(qi):
        # default (bf16) matmul precision is deliberate: ~1% error on d^2
        # only perturbs Gaussian weights marginally and near-tie neighbor
        # ordering, while this is the single largest KNN matmul
        d2 = (
            jnp.sum(qi * qi, axis=-1, keepdims=True)
            - 2.0 * qi @ nodes.T
            + n2[None, :]
            + inactive[None, :]
        )
        if method == "approx":
            neg, idx = jax.lax.approx_max_k(-d2, k)
        else:
            neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2, idx = jax.lax.map(one_chunk, qc)
    d2 = d2.reshape(-1, k)[:p]
    idx = idx.reshape(-1, k)[:p]
    return jnp.maximum(d2, 0.0), idx


def nearest_dist2(field: WarpField, queries: jnp.ndarray, chunk: int = 16384) -> jnp.ndarray:
    """Squared distance to the nearest active node, (P,). A plain min over
    the distance matrix — no top_k (lax.top_k is the expensive part of knn
    on TPU; the coverage test in insert_nodes needs only the distance)."""
    p = queries.shape[0]
    q = jnp.nan_to_num(queries)
    pad = (-p) % chunk
    qp = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)], axis=0)
    qc = qp.reshape(-1, chunk, 3)
    nodes = field.positions
    n2 = jnp.sum(nodes * nodes, axis=-1)
    inactive = jnp.where(field.active, 0.0, _BIG)

    def one_chunk(qi):
        d2 = (
            jnp.sum(qi * qi, axis=-1, keepdims=True)
            - 2.0 * qi @ nodes.T
            + n2[None, :]
            + inactive[None, :]
        )
        return jnp.min(d2, axis=-1)

    d2 = jax.lax.map(one_chunk, qc).reshape(-1)[:p]
    return jnp.maximum(d2, 0.0)


def weights_from_dist2(field: WarpField, dist2: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blending weights w_i = exp(-d_i^2 / (2 dg_w_i^2))
    (WarpField::weighting, warp_field.cpp:238-241). Weights of inactive
    (inf-distance) nodes underflow to exactly 0."""
    r = jnp.take(field.radius, idx)
    return jnp.exp(-dist2 / (2.0 * r * r))


def warp_points(
    field: WarpField,
    points: jnp.ndarray,
    normals: jnp.ndarray | None = None,
    k: int = 8,
    chunk: int = 16384,
    method: str = "exact",
):
    """DQB-warp a point set (and optionally normals) by the field
    (WarpField::warp + WarpField::DQB, warp_field.cpp:180-217 — but with
    paper-correct unit-DQ blending instead of the reference's raw
    translation sum, see core.dualquat.blend).

    NaN inputs produce NaN outputs (invalid pixels pass through)."""
    d2, idx = knn(field, points, k, chunk, method=method)
    w = weights_from_dist2(field, d2, idx)
    node_dqs = jnp.take(field.dq, idx, axis=0)  # (P, k, 8)
    blended = dualquat.blend(w, node_dqs)       # (P, 8)

    nan_mask = jnp.isnan(points[..., 0])
    warped = dualquat.transform(blended, jnp.nan_to_num(points))
    warped = jnp.where(nan_mask[..., None], jnp.nan, warped)
    if normals is None:
        return warped
    wn = dualquat.rotate(blended, jnp.nan_to_num(normals))
    wn = jnp.where(jnp.isnan(normals[..., 0])[..., None], jnp.nan, wn)
    return warped, wn


# --------------------------------------------------------------------------
# node insertion (paper §3.4 — new capability vs the reference)
# --------------------------------------------------------------------------


def _mutual_nearest(
    field: WarpField,
    candidates: jnp.ndarray,
    valid: jnp.ndarray,
    chunk: int = 16384,
):
    """One chunked pass over the (C, N) distance matrix returning BOTH
    per-candidate squared distance to the nearest active node (the
    insertion coverage test) and per-node squared distance to the nearest
    VALID candidate (the lifecycle support test)."""
    p = candidates.shape[0]
    q = jnp.nan_to_num(candidates)
    pad = (-p) % chunk
    qp = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)], axis=0)
    vp = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    qc = qp.reshape(-1, chunk, 3)
    vc = vp.reshape(-1, chunk)
    nodes = field.positions
    n2 = jnp.sum(nodes * nodes, axis=-1)
    inactive = jnp.where(field.active, 0.0, _BIG)

    def one_chunk(carry, t):
        qi, vi = t
        d2 = (
            jnp.sum(qi * qi, axis=-1, keepdims=True)
            - 2.0 * qi @ nodes.T
            + n2[None, :]
            + inactive[None, :]
        )
        cand_min = jnp.min(d2, axis=-1)
        node_min = jnp.min(
            jnp.where(vi[:, None], d2, _BIG), axis=0
        )
        return jnp.minimum(carry, node_min), cand_min

    node_d2, cand_d2 = jax.lax.scan(
        one_chunk, jnp.full((nodes.shape[0],), _BIG), (qc, vc)
    )
    return jnp.maximum(cand_d2.reshape(-1)[:p], 0.0), jnp.maximum(node_d2, 0.0)


def insert_nodes(
    cfg: DynamicFusionConfig,
    field: WarpField,
    candidates: jnp.ndarray,
    valid: jnp.ndarray,
    frame_idx: jnp.ndarray | None = None,
) -> WarpField:
    """Insert unsupported surface vertices as new nodes; maintain the
    capacity lifecycle.

    A candidate is *uncovered* if its nearest active node is farther than
    ``node_coverage``. Candidates are decimated to one per coverage cell
    (floor(p / coverage) hash, first occurrence wins) so a single frame
    can't flood the capacity with near-duplicates; survivors fill free
    slots with identity-initialized transforms warped-to-current via DQB of
    the existing field (so new nodes start consistent with the deformation
    around them) and a density-adaptive radius (_adaptive_radius).

    LIFECYCLE (round 5; the paper's streaming capability implies
    recycling — the reference never even implemented insertion): every
    call refreshes each active node's ``last_support`` stamp (nearest
    visible canonical-surface point within cfg.node_support_radius).
    When the field is FULL, nodes unsupported for more than
    cfg.node_retire_after frames are RETIRED (deactivated; their slots
    are reused by subsequent insertions) — without this, a long sequence
    that saturates capacity can never track NEW surface regions again.
    Retired geometry that later returns re-inserts fresh nodes seeded
    from the surviving blended field. 0 disables retirement.

    The insertion pass itself (decimation sort etc., ~8 ms at bench
    shape) stays lax.cond-skipped while the field is full and nothing
    was retired."""
    cap = field.positions.shape[0]
    cand_d2, node_d2 = _mutual_nearest(field, candidates, valid)

    if (
        frame_idx is not None
        and cfg.node_retire_after > 0
        and field.last_support is not None
    ):
        fi = jnp.asarray(frame_idx, jnp.int32)
        r = cfg.node_support_radius
        supported = field.active & (node_d2 < r * r)
        last_support = jnp.where(supported, fi, field.last_support)
        full = field.count >= cap
        retire = (
            full
            & field.active
            & (fi - last_support > cfg.node_retire_after)
        )
        active = field.active & ~retire
        field = field._replace(
            active=active,
            count=jnp.sum(active.astype(jnp.int32)),
            last_support=last_support,
        )

    return jax.lax.cond(
        field.count < cap,
        lambda: _insert_nodes_impl(cfg, field, candidates, valid, cand_d2, frame_idx),
        lambda: field,
    )


def _insert_nodes_impl(
    cfg: DynamicFusionConfig,
    field: WarpField,
    candidates: jnp.ndarray,
    valid: jnp.ndarray,
    cand_d2: jnp.ndarray,
    frame_idx: jnp.ndarray | None,
) -> WarpField:
    cov = cfg.node_coverage
    cap = field.positions.shape[0]

    uncovered = valid & (cand_d2 > cov * cov)

    # coverage-cell decimation: unique cell ids, first occurrence
    cell = jnp.floor(jnp.nan_to_num(candidates) / cov).astype(jnp.int32)
    cell_id = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (cell[:, 2] * 83492791)
    order = jnp.argsort(cell_id)
    sorted_id = jnp.take(cell_id, order)
    first = jnp.concatenate([jnp.array([True]), sorted_id[1:] != sorted_id[:-1]])
    keep_sorted = jnp.take(uncovered, order) & first
    keep = jnp.zeros_like(uncovered).at[order].set(keep_sorted)

    free = jnp.maximum(cap - field.count, 0)
    # URGENCY-ordered rationing (round 5): rank uncovered candidates by
    # distance to their nearest active node, FARTHEST FIRST (farthest-
    # point sampling), so genuinely NEW surface (a just-appeared object,
    # cand_d2 >> node_coverage) outcompetes marginal base-scene
    # undercoverage for scarce slots. The earlier fixed fair permutation
    # was spatially uniform but starved new objects at saturated
    # capacity: the 300-frame episode gate (scripts/turnover_run.py)
    # measured the final transient at coverage ~0 because freed slots
    # were rationed over ALL undercovered surface. Farthest-first keeps
    # the fair permutation's virtue (no raster-order truncation bias —
    # the round-5 band-cap lesson) and adds need-ordering.
    score = jnp.where(keep, cand_d2, -jnp.inf)
    k = min(cap, score.shape[0])
    vals, sel_idx = jax.lax.top_k(score, k)
    sel = jnp.full((cap,), -1, sel_idx.dtype).at[:k].set(
        jnp.where(jnp.isfinite(vals), sel_idx, -1)
    )
    slot_rank = jnp.arange(cap)
    ok = (sel >= 0) & (slot_rank < free)
    new_pos = jnp.take(candidates, jnp.maximum(sel, 0), axis=0)

    # seed the new node's transform from the current field at its position
    seed_dq = warp_dq_at(field, new_pos, k=min(8, cap), method=cfg.knn_method)
    if cfg.node_radius_adaptive:
        new_radius = _adaptive_radius(
            cfg, new_pos, field.positions, field.active, self_ref=False
        )
    else:
        new_radius = jnp.full((cap,), cfg.node_radius, jnp.float32)

    # free-slot allocation (retirement leaves HOLES, so slots come from
    # the inactive-slot list, not an append-at-count)
    (free_idx,) = jnp.nonzero(~field.active, size=cap, fill_value=cap)
    slots = jnp.take(free_idx, slot_rank.clip(0, cap - 1))
    slots = jnp.where(ok, slots, cap)  # sentinel: masked out below

    idx_safe = slots.clip(0, cap - 1)
    upd_mask = ok & (slots < cap)
    # delta-scatter: masked rows contribute 0, so collisions at the clipped
    # sentinel index are harmless; valid rows have unique slots (free list)
    positions = field.positions.at[idx_safe].add(
        jnp.where(upd_mask[:, None], new_pos - field.positions[idx_safe], 0.0)
    )
    dq = field.dq.at[idx_safe].add(
        jnp.where(upd_mask[:, None], seed_dq - field.dq[idx_safe], 0.0)
    )
    radius = field.radius.at[idx_safe].add(
        jnp.where(upd_mask, new_radius - field.radius[idx_safe], 0.0)
    )
    active = field.active.at[idx_safe].max(upd_mask)
    count = field.count + jnp.sum(upd_mask.astype(jnp.int32))
    last_support = field.last_support
    if frame_idx is not None and last_support is not None:
        fi = jnp.asarray(frame_idx, jnp.int32)
        last_support = last_support.at[idx_safe].add(
            jnp.where(upd_mask, fi - last_support[idx_safe], 0)
        )

    return WarpField(
        positions=positions,
        dq=dq,
        radius=radius,
        active=active,
        count=count,
        last_support=last_support,
    )


def remove_net_rigid(prev: WarpField, new: WarpField, alpha: float = 1.0) -> WarpField:
    """Project the net RIGID component out of one frame's warp increment.

    Gauge/stability fix: the data term can represent a global rigid offset
    (e.g. residual camera-pose error) as deformation, which silently
    removes rigid misfit from ICP's view — pose drift then random-walks
    with no restoring force and eventually corrupts tracking (measured: a
    static tiny scene blows up ~46 deg by frame 5 without this). The
    best-fit rigid motion G between the nodes' pre-solve and post-solve
    live positions (weighted Kabsch over active nodes) is removed from
    every node transform; the residual rigid misfit stays visible in the
    model maps and the next frame's ICP — the camera's 6-dof estimator —
    corrects it against the canonical-anchored model. Real deformations
    are local (near-zero net rigid component), so they pass through.

    ``alpha`` in (0, 1]: fraction of the net rigid motion removed per
    frame (a LEAKY gauge anchor). 1 = full removal; smaller values still
    decay absorbed drift geometrically while fighting genuine within-frame
    motion less (whatever remains is ICP's to claim next frame).

    No reference equivalent: the reference's pipeline never ran long
    enough nonrigid feedback to hit this (its solve is data-term-only and
    its fusion is rigid, SURVEY §2.9.5)."""
    p = prev.positions
    w = prev.active.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    a = dualquat.transform(prev.dq, p)  # pre-solve live node positions
    b = dualquat.transform(new.dq, p)   # post-solve
    ca = jnp.sum(a * w[:, None], axis=0) / n
    cb = jnp.sum(b * w[:, None], axis=0) / n
    h = jnp.einsum("ni,nj->ij", (a - ca) * w[:, None], b - cb)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    r = vt.T @ jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, det])) @ u.T
    t = cb - r @ ca

    from dynamicfusion_tpu.core import quat as quat_mod

    g_inv_dq = dualquat.from_rot_trans(
        quat_mod.from_matrix(r.T), -(r.T @ t)
    )
    if alpha < 1.0:
        # DQB-style interpolation toward identity (exact enough for the
        # small per-frame G this removes)
        ident = dualquat.identity()
        g_inv_dq = dualquat.normalize(alpha * g_inv_dq + (1.0 - alpha) * ident)
    cleaned = dualquat.normalize(dualquat.mul(g_inv_dq[None, :], new.dq))
    ok = (
        (jnp.sum(w) >= 3.0)
        & jnp.isfinite(r).all()
        & jnp.isfinite(t).all()
        & jnp.isfinite(cleaned).all()
    )
    dq = jnp.where(ok & new.active[:, None], cleaned, new.dq)
    return new._replace(dq=dq)


def live_node_positions(field: WarpField) -> jnp.ndarray:
    """Node positions warped into the live frame: dg_v + t(dg_se3)
    (the reference's getNodesAsMat, warp_field.cpp:284-293, used to
    visualize the warp graph)."""
    from dynamicfusion_tpu.core import dualquat

    return field.positions + dualquat.translation(field.dq)


def warp_dq_at(
    field: WarpField, points: jnp.ndarray, k: int = 8, method: str = "exact"
) -> jnp.ndarray:
    """The blended dual quaternion of the field evaluated at given points."""
    d2, idx = knn(field, points, k, method=method)
    w = weights_from_dist2(field, d2, idx)
    return dualquat.blend(w, jnp.take(field.dq, idx, axis=0))
