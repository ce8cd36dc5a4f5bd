#!/usr/bin/env python3
"""Multi-device scaling validation on the virtual CPU mesh.

With one physical TPU chip available, absolute multi-chip numbers can't be
measured here; this script validates the *scaling path* — the sharded step
compiles, executes, and produces identical results across mesh sizes — and
reports per-mesh wall-clock on host CPUs (NOT a TPU performance statement;
CPU meshes share host cores, so efficiency numbers are illustrative only).

The QUANTITATIVE scaling story lives in SCALING.md: collective-byte
census of the compiled step (scripts/collective_bytes.py) + an ICI/DCN
efficiency model from measured single-chip frame time.

Usage: python scripts/scaling_check.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.parallel import sharded
from dynamicfusion_tpu.pipeline import kinfu


def main():
    cfg = dataclasses.replace(
        DynamicFusionConfig(
            rows=64, cols=128, volume_dims=64, max_nodes=64,
            node_sample_step=5, solver_nonlinear_iters=2,
        ),
        intr=dataclasses.replace(
            DynamicFusionConfig().intr, fx=114.0, fy=114.0, cx=64.0, cy=32.0
        ),
    )
    # two off-axis spheres + plane: all 6 dof observable (a single centered
    # sphere + fronto plane leaves in-plane rotation unconstrained)
    depth = jnp.asarray(
        synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols,
            spheres=[
                dict(center=(0.08, 0.02, 0.8), radius=0.2),
                dict(center=(-0.18, 0.12, 0.7), radius=0.09),
            ],
            plane_z=1.1,
        )
    )

    results = {}
    poses = {}
    for n in (1, 2, 4, 8):
        mesh = sharded.make_mesh(n)
        state = sharded.shard_state(cfg, mesh, kinfu.init_state(cfg))
        first = sharded.make_sharded_first_frame(cfg, mesh)
        step = sharded.make_sharded_step(cfg, mesh)
        state = first(state, depth)
        state, out = step(state, depth)  # warm/compile
        t0 = time.time()
        for _ in range(5):
            state, out = step(state, depth)
        _ = float(out.solver_cost1)
        dt = (time.time() - t0) / 5
        results[n] = dt
        poses[n] = np.asarray(out.pose)
        print(f"mesh={n}: {dt*1000:.1f} ms/frame", flush=True)

    # correctness across mesh sizes: the scene is STATIC, so every mesh
    # size must hold the camera pose near identity. (Bitwise cross-mesh
    # pose equality is no longer a valid oracle: ICP/LM early-exits branch
    # on float comparisons, so differently-sharded reductions legitimately
    # take different iteration counts; what must hold is the BEHAVIOR.)
    for n in (1, 2, 4, 8):
        p = poses[n]
        ang = np.degrees(np.arccos(np.clip((np.trace(p[:3, :3]) - 1) / 2, -1, 1)))
        t_mm = float(np.linalg.norm(p[:3, 3])) * 1000.0
        assert ang < 3.0 and t_mm < 20.0, (n, ang, t_mm, p)
    print(json.dumps({
        "consistency": "static-scene pose drift < 3 deg / 20 mm at every mesh size",
        "ms_per_frame": {str(k): round(v * 1000, 1) for k, v in results.items()},
        "note": "virtual CPU mesh — validates the sharding path, not TPU scaling",
    }))


if __name__ == "__main__":
    main()
