"""Schur-reduced distributed Gauss-Newton over a device mesh.

The explicit collective formulation of the warp solve's distribution (the
GSPMD path in parallel/sharded.py trusts the partitioner; this module IS
the communication pattern, written out with shard_map + psum — the
"distributed GN via per-node JtJ/Jtr block reduction over ICI collectives"
of BASELINE.json):

- the data term's P surface points shard across the mesh axis; each device
  assembles its shard's contribution to the (6N, 6N) normal equations with
  the same bf16 one-hot MXU syrk as the single-device path
  (solvers.warp_solver.data_system);
- ONE ``psum`` per relinearization all-reduces JtJ and Jtr over ICI — the
  Schur reduction onto the per-node block system (nothing else in the LM
  loop communicates: the ARAP edge system, the PCG solve, and the LM
  bookkeeping are replicated node-space work);
- the nonlinear LM loop is unchanged — ``warp_solver.solve`` takes the
  sharded assembly through its ``system_fn`` hook.

The reference has no multi-device anything (SURVEY §2.a); the analogous
CUDA structure is its per-block ICP tree reduction (proj_icp.cu:111-394),
which this generalizes across chips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.models.warpfield import WarpField
from dynamicfusion_tpu.solvers import warp_solver
from dynamicfusion_tpu.solvers.warp_solver import SolveStructure, WarpSolveInputs


def _pad_points(s: SolveStructure, n_dev: int) -> SolveStructure:
    """Pad the point-set fields so P divides the mesh (padded rows carry
    valid=False and contribute exact zeros to the system)."""
    p = s.p_can.shape[0]
    pad = (-p) % n_dev
    if pad == 0:
        return s
    pz = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return s._replace(
        p_can=pz(s.p_can),
        p_live=pz(s.p_live),
        n_live=pz(s.n_live),
        valid=pz(s.valid),
        knn_idx=pz(s.knn_idx),
        w_knn=pz(s.w_knn),
        p2p_sw=pz(s.p2p_sw),
    )


def structure_specs(axis: str) -> SolveStructure:
    """PartitionSpecs for a SolveStructure: point fields sharded over the
    mesh axis, edge fields replicated."""
    pt = P(axis)
    rep = P()
    return SolveStructure(
        p_can=pt, p_live=pt, n_live=pt, valid=pt, knn_idx=pt, w_knn=pt,
        p2p_sw=pt,
        e_src=rep, e_dst=rep, e_valid=rep, v_dst=rep, alpha=rep,
    )


def make_sharded_system(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    n_nodes: int,
    point_to_plane: bool,
    axis: str = "d",
):
    """system_fn(s, dqs) -> (jtj, jtr) where the data-term assembly runs on
    point shards and ONE psum reduces the (6N,6N)/(6N,) partials.

    Equivalence contract: the result equals the single-device assembly for
    any shard count. With solver_jtj_int8 that requires shard-INVARIANT
    quantization, so the per-column |A| maxima are pmax'd across shards
    (one extra (6N,) all-reduce per relinearization) before quantizing —
    every shard then uses the same scales and the psum of int8 Grams is
    exactly the single-device int8 Gram."""
    specs = structure_specs(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=(P(), P(), P()),
    )
    def system(s_local: SolveStructure, dqs: jnp.ndarray):
        jtj_d, jtr_d, cost_d = warp_solver.data_system(
            cfg, s_local, dqs, n_nodes, point_to_plane,
            col_scale_reduce=lambda m: jax.lax.pmax(m, axis),
        )
        # the Schur reduction (ICI): JtJ, Jtr, and the scalar cost ride the
        # same all-reduce round
        jtj_d, jtr_d, cost_d = jax.lax.psum((jtj_d, jtr_d, cost_d), axis)
        # edge system is replicated node-space work (identical on every
        # device; E = N*k_edge is tiny next to the data shard)
        jtj_e, jtr_e, cost_e = warp_solver.edge_system(cfg, s_local, dqs, n_nodes)
        return jtj_d + jtj_e, jtr_d + jtr_e, cost_d + cost_e

    return system


def make_system_fn(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    n_nodes: int,
    point_to_plane: bool,
    axis: str = "d",
):
    """``system_fn(s, dqs)`` for warp_solver.solve that pads the point set
    to the mesh, lays it out over the axis, and assembles through the
    explicit shard_map+psum Schur reduction — the hook the sharded pipeline
    step plugs into kinfu.step (and solve_distributed uses directly)."""
    n_dev = mesh.shape[axis]
    sys_fn = make_sharded_system(cfg, mesh, n_nodes, point_to_plane, axis)

    def system_fn(s: SolveStructure, dqs: jnp.ndarray):
        s = _pad_points(s, n_dev)
        s = jax.lax.with_sharding_constraint(
            s, jax.tree.map(lambda sp: NamedSharding(mesh, sp), structure_specs(axis))
        )
        return sys_fn(s, dqs)

    return system_fn


def make_sharded_eval(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    n_nodes: int,
    point_to_plane: bool,
    axis: str = "d",
):
    """eval_fn core for the lagged-JtJ LM loop: per-shard gradient + cost,
    ONE psum round of ((6N,), scalar) — much lighter than the (6N,6N)
    Schur round of the full relinearization."""
    specs = structure_specs(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=(P(), P()),
    )
    def evaluate(s_local: SolveStructure, dqs: jnp.ndarray):
        r, jac, cost_d = warp_solver.data_residual_and_jac(
            cfg, s_local, dqs, point_to_plane
        )
        jtr_d = warp_solver.data_jtr(s_local, jac, r, n_nodes)
        jtr_d, cost_d = jax.lax.psum((jtr_d, cost_d), axis)
        re, je_i, je_j, cost_e = warp_solver.edge_residual_and_jac(
            cfg, s_local, dqs
        )
        jtr_e = warp_solver.edge_jtr(s_local, je_i, je_j, re, n_nodes)
        return jtr_d + jtr_e, cost_d + cost_e

    return evaluate


def make_eval_fn(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    n_nodes: int,
    point_to_plane: bool,
    axis: str = "d",
):
    """``eval_fn(s, dqs)`` for warp_solver.solve's lagged-JtJ loop over the
    mesh (companion of make_system_fn)."""
    n_dev = mesh.shape[axis]
    ev = make_sharded_eval(cfg, mesh, n_nodes, point_to_plane, axis)

    def eval_fn(s: SolveStructure, dqs: jnp.ndarray):
        s = _pad_points(s, n_dev)
        s = jax.lax.with_sharding_constraint(
            s, jax.tree.map(lambda sp: NamedSharding(mesh, sp), structure_specs(axis))
        )
        return ev(s, dqs)

    return eval_fn


def make_sharded_solve(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    point_to_plane: bool,
    axis: str = "d",
):
    """The fully-distributed warp solve (SCALING.md §4): the WHOLE LM loop
    runs inside ONE shard_map over a point shard, nodes replicated, the
    data-term Gram kept UNSUMMED per shard. The (6N,6N) Schur all-reduce of
    make_system_fn disappears entirely; per solve the wire carries only
    (6N,)-sized reductions — psum'd gradients/costs/diagonal, pmax'd int8
    scales, the (N,6,6) preconditioner blocks, and one 24.6 KB psum per
    PCG matvec iteration: ~0.9 MB at 1024 nodes, ~170x less than the
    151 MB Schur round.

    Structuring it as one shard_map body (while_loops INSIDE the body,
    never a shard_map inside a while_loop body) is what keeps the SPMD
    partitioner fast — see the CLAUDE.md landmine.

    Returns ``solve_fn(field, inputs) -> (field, stats)`` for
    kinfu.step's ``warp_solve_fn`` hook. Requires cfg.solver_linear ==
    "pcg" and cfg.solver_lagged_jtj."""
    from jax import shard_map

    n_dev = mesh.shape[axis]

    def solve_fn(field: WarpField, inputs: WarpSolveInputs):
        inputs = warp_solver._with_gate(inputs)
        p = inputs.p_can.shape[0]
        pad = (-p) % (n_dev * max(cfg.solver_hessian_stride, 1))
        if pad:
            # NaN padding marks the rows invalid in prepare(); padding to a
            # multiple of n_dev * hs keeps each shard's [::hs] subsample
            # phase identical to the single-device solve's
            pz = lambda a: jnp.pad(a, ((0, pad), (0, 0)), constant_values=jnp.nan)
            inputs = WarpSolveInputs(*(pz(a) for a in inputs))
        inputs = jax.lax.with_sharding_constraint(
            inputs, jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), inputs)
        )
        # global_points = the UNPADDED count: prepare()'s full-scale /
        # hessian-stride thresholds must match the single-device solve
        # even when the NaN padding crosses the 8192 boundary (the padded
        # rows are invalid and contribute nothing either way)
        body = partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
            check_vma=False,
        )(
            lambda field_, inputs_local: warp_solver.solve(
                cfg, field_, inputs_local, point_to_plane=point_to_plane,
                axis_name=axis, axis_size=n_dev, global_points=p,
            )
        )
        return body(field, inputs)

    return solve_fn


def solve_distributed(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    field: WarpField,
    inputs: WarpSolveInputs,
    point_to_plane: Optional[bool] = None,
    axis: str = "d",
) -> Tuple[WarpField, warp_solver.SolveStats]:
    """The full warp solve with the explicitly-distributed assembly:
    identical math to warp_solver.solve (same prepare, LM loop, PCG), the
    normal equations assembled per point shard + psum'd.

    Call under jit with `inputs` sharded over points (or replicated; the
    structure is re-laid-out here either way)."""
    if point_to_plane is None:
        point_to_plane = cfg.point_to_plane
    n_nodes = field.positions.shape[0]
    system_fn = make_system_fn(cfg, mesh, n_nodes, point_to_plane, axis)
    eval_fn = (
        make_eval_fn(cfg, mesh, n_nodes, point_to_plane, axis)
        if cfg.solver_lagged_jtj
        else None
    )
    return warp_solver.solve(
        cfg, field, inputs, point_to_plane=point_to_plane,
        system_fn=system_fn, eval_fn=eval_fn,
    )
