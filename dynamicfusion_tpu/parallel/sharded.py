"""Sharded pipeline step over a jax.sharding.Mesh."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicfusion_tpu.config import DynamicFusionConfig
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


def make_sharded_step(cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"):
    """jit the full frame step with volume/pixel shardings. XLA SPMD
    partitions the voxel-local ops, inserts halo exchanges for the stencil
    and trilinear reads, and all-reduces the ICP 6x6 and warp-solver
    (6N,6N) normal equations — the distributed GN reduction."""
    ss = state_shardings(cfg, mesh, axis)
    depth_s = NamedSharding(mesh, P(axis, None))

    def _step(state, depth):
        state, out = kinfu.step(cfg, state, depth)
        return state, out

    return jax.jit(_step, in_shardings=(ss, depth_s), out_shardings=(ss, None))


def make_sharded_first_frame(cfg: DynamicFusionConfig, mesh: Mesh, axis: str = "d"):
    ss = state_shardings(cfg, mesh, axis)
    depth_s = NamedSharding(mesh, P(axis, None))
    return jax.jit(
        lambda state, depth: kinfu.first_frame(cfg, state, depth),
        in_shardings=(ss, depth_s),
        out_shardings=ss,
    )
