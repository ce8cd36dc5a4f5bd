"""Checkpoint / resume of the full reconstruction state.

The reference has no checkpointing at all (SURVEY §5 — its only persistence
is an optional rendered-JPEG dump). Here the complete pipeline state
(canonical TSDF volume, warp-field nodes, camera pose, model maps, frame
counter) round-trips through a single compressed .npz (dependency-light;
no orbax), with config shape checks on load. ``load(..., mesh=...)``
restores directly onto a device mesh with the pipeline's shardings, so a
sharded reconstruction resumes sharded. Surface export lives in
``io/export`` (PLY/OBJ, binary or ascii).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.pipeline import kinfu


def save(path: str, state: kinfu.PipelineState) -> None:
    """Write the pipeline state as a single compressed .npz. Sharded state
    is gathered to host (np.asarray) — the checkpoint format is
    mesh-shape-independent; re-sharding happens on load."""
    flat, treedef = jax.tree.flatten(state)
    arrays = {f"a{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, n=len(flat), **arrays)


def load(path: str, cfg: DynamicFusionConfig, mesh=None) -> kinfu.PipelineState:
    """Restore a pipeline state. With ``mesh`` (a jax.sharding.Mesh) the
    state is device_put with the sharded pipeline's layout
    (parallel.sharded.state_shardings) — ready for make_sharded_step."""
    data = np.load(path)
    n = int(data["n"])
    flat = [data[f"a{i}"] for i in range(n)]
    template = kinfu.init_state(cfg)
    _, treedef = jax.tree.flatten(template)
    # shape check against the config
    t_flat, _ = jax.tree.flatten(template)
    for a, b in zip(flat, t_flat):
        if tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"checkpoint shape {a.shape} incompatible with config shape {b.shape}"
            )
    state = jax.tree.unflatten(treedef, flat)
    if (
        state.vol.tsdf.dtype != template.vol.tsdf.dtype
        or state.vol.weight.dtype != template.vol.weight.dtype
    ):
        # dtype migration: a checkpoint written under a different volume
        # storage setting (cfg.tsdf_dtype / weight_dtype) re-encodes
        from dynamicfusion_tpu.models import volume as volume_model

        state = state._replace(vol=volume_model.convert(state.vol, cfg))
    if mesh is not None:
        from dynamicfusion_tpu.parallel import sharded

        state = sharded.shard_state(cfg, mesh, state)
    return state
