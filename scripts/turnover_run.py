#!/usr/bin/env python3
"""Long-run node-capacity lifecycle validation (VERDICT r4 #4).

300+ frames with forced SURFACE TURNOVER: the camera pans (slow yaw
oscillation) across a scene wider than its frustum, so peripheral surface
leaves view for longer than cfg.node_retire_after and returns later. A
saturated node field can only keep tracking if retirement frees slots
(models/warpfield.insert_nodes lifecycle) and insertion re-covers
returning/newly-seen canonical surface.

Reports one JSON line: central-sphere surface coverage at the end (the
always-visible object — gate >= 0.95), node-set churn (slots whose
active state or position changed), and whether insertion remained active
in the FINAL third of the run.

Usage: python scripts/turnover_run.py [--frames 300] [--nodes 640]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import dataclasses

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.ops import tsdf as tsdf_ops
from dynamicfusion_tpu.pipeline import kinfu

CENTER, RADIUS = (0.0, 0.0, 0.95), 0.2
SIDE = [dict(center=(-0.34, 0.0, 1.05), radius=0.1),
        dict(center=(0.34, 0.1, 1.05), radius=0.1)]


def frame(cfg, t, n_frames):
    # slow yaw oscillation about the central sphere: periphery leaves the
    # frustum for ~1/3 of a period (> node_retire_after at the defaults)
    ang = 0.38 * np.sin(2.0 * np.pi * t / (0.75 * n_frames))
    pose = synthetic.orbit_pose(ang, target=CENTER)
    return synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols, pose,
        spheres=[dict(center=CENTER, radius=RADIUS)] + SIDE,
        plane_z=1.35,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--nodes", type=int, default=640)
    ap.add_argument("--retire", type=int, default=60)
    args = ap.parse_args()

    # modest capacity so the scene SATURATES it (the lifecycle's regime)
    cfg = dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        max_nodes=args.nodes,
        node_retire_after=args.retire,
    )
    df = kinfu.DynamicFusion(cfg)

    snaps = []
    counts = []
    for t in range(args.frames):
        df(jnp.asarray(frame(cfg, t, args.frames)), block=False)
        if t % 25 == 24 or t == args.frames - 1:
            w = df.state.warp
            snaps.append((t, np.asarray(w.active), np.asarray(w.positions)))
            counts.append(int(w.count))

    # churn: slots whose active state flipped or position moved between
    # consecutive snapshots (a retired+reused slot moves)
    churn = 0
    late_churn = 0
    for (t0, a0, p0), (t1, a1, p1) in zip(snaps, snaps[1:]):
        changed = (a0 != a1) | (
            a0 & a1 & (np.linalg.norm(p0 - p1, axis=-1) > 1e-6)
        )
        churn += int(changed.sum())
        if t1 > 2 * args.frames // 3:
            late_churn += int(changed.sum())

    cloud = tsdf_ops.extract_cloud(cfg, df.state.vol, max_points=1 << 19)
    pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    near = np.linalg.norm(pts - np.asarray(CENTER), axis=-1) < RADIUS + 0.12
    pts_c = pts[near]
    err = np.abs(np.linalg.norm(pts_c - np.asarray(CENTER), axis=-1) - RADIUS)

    import bench

    samples, cos_inc = bench._visible_sphere_samples(CENTER, RADIUS)
    cov = bench._coverage(pts_c, samples[cos_inc >= 0.15], cfg.voxel_size)

    print(json.dumps({
        "metric": "lifecycle_turnover_coverage",
        "value": round(cov, 4),
        "unit": "central-sphere surface coverage after pan sequence",
        "frames": args.frames,
        "median_err_mm": round(float(np.median(err)) * 1000.0, 3)
        if len(err) else None,
        "node_capacity": args.nodes,
        "node_count_trajectory": counts,
        "node_churn_slots": churn,
        "node_churn_final_third": late_churn,
        "icp_ok": bool(df.last_outputs.icp_ok),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
