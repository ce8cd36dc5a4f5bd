"""Sharded pipeline step over a jax.sharding.Mesh."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.parallel import distributed_gn, sharded_fusion, sharded_raycast
from dynamicfusion_tpu.pipeline import kinfu


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def state_shardings(cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"):
    """Sharding spec pytree for PipelineState: volume split on x, depth
    maps split on rows, warp field replicated."""
    n = mesh.shape[axis]
    vol_s = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())

    def level_spec(l):
        # coarse pyramid levels whose row count doesn't divide the mesh
        # stay replicated (they are tiny); model maps live at pyramid level
        # cfg.raycast_shift and below
        rows_l = cfg.rows >> (l + cfg.raycast_shift)
        return (
            NamedSharding(mesh, P(axis, None, None)) if rows_l % n == 0 else rep
        )

    return kinfu.PipelineState(
        vol=jax.tree.map(lambda _: vol_s, kinfu.volume_model.create(cfg)),
        warp=jax.tree.map(lambda _: rep, kinfu.warpfield.create(cfg)),
        pose=rep,
        prev_points=tuple(level_spec(l) for l in range(cfg.track_levels)),
        prev_normals=tuple(level_spec(l) for l in range(cfg.track_levels)),
        can_points=level_spec(0),
        can_normals=level_spec(0),
        frame_idx=rep,
    )


def shard_state(cfg: DynamicFusionConfig, mesh: Mesh, state: kinfu.PipelineState):
    return jax.device_put(state, state_shardings(cfg, mesh))


def make_sharded_step(
    cfg: DynamicFusionConfig,
    mesh: Mesh,
    axis: str = "d",
    explicit_gn: bool = True,
):
    """jit the full frame step with volume/pixel shardings. XLA SPMD
    partitions the voxel-local ops and inserts halo exchanges for the
    stencil and trilinear reads; the warp solver's (6N,6N) normal
    equations go through the EXPLICIT shard_map+psum Schur assembly
    (parallel.distributed_gn.make_system_fn — one all-reduce round per
    relinearization over ICI) rather than whatever GSPMD infers; pass
    explicit_gn=False to compare against the pure-GSPMD solve.

    The depth input is REPLICATED (one ~1.2 MB broadcast per frame):
    per-pixel preprocessing is trivial next to the sharded volume work, and
    row-sharding it forces SPMD to reshard the depth min/max mip pyramid's
    degenerate coarse levels through reduce_window ops it can only handle
    by full rematerialization (the "[SPMD] Involuntary full
    rematerialization" warnings of round 1)."""
    ss = state_shardings(cfg, mesh, axis)
    depth_s = NamedSharding(mesh, P())
    use_explicit = explicit_gn and not cfg.rigid_only
    # solver distribution mode: with solver_linear == "pcg" the whole LM
    # loop runs inside one shard_map on UNSUMMED per-shard Grams (the
    # distributed-PCG solve of SCALING.md §4 — no (6N,6N) Schur all-reduce
    # at all, <1 MB/solve on the wire); with "direct" the summed Schur
    # assembly + replicated Cholesky (make_system_fn) is used.
    use_pcg = (
        use_explicit and cfg.solver_linear == "pcg" and cfg.solver_lagged_jtj
    )
    solve_fn = (
        distributed_gn.make_sharded_solve(cfg, mesh, cfg.point_to_plane, axis)
        if use_pcg
        else None
    )
    system_fn = (
        distributed_gn.make_system_fn(
            cfg, mesh, cfg.max_nodes, cfg.point_to_plane, axis
        )
        if use_explicit and not use_pcg
        else None
    )
    eval_fn = (
        distributed_gn.make_eval_fn(
            cfg, mesh, cfg.max_nodes, cfg.point_to_plane, axis
        )
        if use_explicit and not use_pcg and cfg.solver_lagged_jtj
        else None
    )
    # per-shard-brick non-rigid fusion (zero collectives — the GSPMD
    # partitioning of the global-brick-id gathers costs ~205 MB of
    # all-reduce per fused frame at the bench shape, see SCALING.md)
    integrate_fn = (
        sharded_fusion.make_sharded_integrate(cfg, mesh, axis)
        if use_explicit and cfg.integrate_mode == "brick"
        and (cfg.volume_dims // mesh.shape[axis]) % cfg.brick_size == 0
        else None
    )
    # slab-local model raycast (zero per-trip collectives; the GSPMD
    # fallback all-reduces an image per march trip — SCALING.md §2)
    raycast_fn = (
        sharded_raycast.make_sharded_raycast(cfg, mesh, axis)
        if explicit_gn
        and cfg.volume_dims % mesh.shape[axis] == 0
        and (cfg.volume_dims // mesh.shape[axis])
        >= sharded_raycast._halo_planes(cfg)
        else None
    )

    def _step(state, depth):
        state, out = kinfu.step(
            cfg, state, depth, warp_system_fn=system_fn, warp_eval_fn=eval_fn,
            integrate_fn=integrate_fn, warp_solve_fn=solve_fn,
            raycast_fn=raycast_fn,
        )
        return state, out

    return jax.jit(_step, in_shardings=(ss, depth_s), out_shardings=(ss, None))


def make_sharded_first_frame(cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"):
    ss = state_shardings(cfg, mesh, axis)
    depth_s = NamedSharding(mesh, P())
    return jax.jit(
        lambda state, depth: kinfu.first_frame(cfg, state, depth),
        in_shardings=(ss, depth_s),
        out_shardings=ss,
    )
