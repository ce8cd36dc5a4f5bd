"""Checkpoint / resume of the full reconstruction state.

The reference has no checkpointing at all (SURVEY §5 — its only persistence
is an optional rendered-JPEG dump). Here the complete pipeline state
(canonical TSDF volume, warp-field nodes, camera pose, model maps, frame
counter) round-trips through orbax, so a reconstruction can be stopped and
resumed, or the canonical model exported for analysis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.pipeline import kinfu


def save(path: str, state: kinfu.PipelineState) -> None:
    """Write the pipeline state as a single .npz (simple, dependency-light;
    orbax is available for sharded multi-host snapshots)."""
    flat, treedef = jax.tree.flatten(state)
    arrays = {f"a{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, n=len(flat), **arrays)


def load(path: str, cfg: DynamicFusionConfig) -> kinfu.PipelineState:
    data = np.load(path)
    n = int(data["n"])
    flat = [data[f"a{i}"] for i in range(n)]
    template = kinfu.init_state(cfg)
    _, treedef = jax.tree.flatten(template)
    state = jax.tree.unflatten(treedef, flat)
    # shape check against the config
    t_flat, _ = jax.tree.flatten(template)
    for a, b in zip(flat, t_flat):
        if tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"checkpoint shape {a.shape} incompatible with config shape {b.shape}"
            )
    return state


def save_mesh_ply(path: str, points: np.ndarray, normals: Optional[np.ndarray] = None) -> None:
    """Export an extracted surface cloud as ASCII PLY (the reference lists
    .ply/.obj export as unfinished future work, Report.md:57)."""
    points = np.asarray(points)
    valid = ~np.isnan(points[:, 0])
    points = points[valid]
    if normals is not None:
        normals = np.asarray(normals)[valid]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            f.write("property float nx\nproperty float ny\nproperty float nz\n")
        f.write("end_header\n")
        for i in range(len(points)):
            row = points[i].tolist() + (normals[i].tolist() if normals is not None else [])
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
