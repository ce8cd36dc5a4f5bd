#!/usr/bin/env python3
"""Long-run node-capacity lifecycle validation (VERDICT r4 #4).

300 frames with forced SURFACE TURNOVER, two modes:

- EPISODE mode (default, --episodes 4): static camera; transient spheres
  appear one at a time at rotating spots, live ~1/4 of the run, then
  vanish. Each appearance is NEW canonical surface (insertion must find
  slots); each disappearance free-space-carves the canonical region so
  its nodes lose support and retire (models/warpfield.insert_nodes).
  Gates: central-sphere coverage >= 0.95 at the end AND the FINAL
  episode's sphere reconstructed (final_episode_coverage — only possible
  if retirement freed slots late in a saturated field).

- PAN mode (--episodes 0): slow yaw oscillation; periphery leaves the
  frustum for longer than node_retire_after. This mode ALSO exercises
  the sustained-pan tracking-drift OPEN ITEM (round 5 diagnosis,
  scripts/diag_pan.py): the rigid/non-rigid tracker has a ~1 mm-class
  view-angle-dependent model-raycast bias that per-frame fusion ratchets
  into monotonic z-drift (~30 mm over 50 frames at 1.8 deg/frame), so
  its coverage gate FAILS for tracking reasons, not lifecycle reasons —
  kept as the honest hard mode.

Usage: python scripts/turnover_run.py [--frames 300] [--nodes 640]
       [--episodes 4 | --episodes 0 --amp 0.38] [--rigid] [--set k=v]
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

# episode mode: transient spheres appear at these spots in rotation, one
# at a time, each living ~1 episode then vanishing (a ball tossed into
# view and removed). Each appearance is NEW canonical surface (insertion
# must find slots); each disappearance free-space-carves its canonical
# region so its nodes lose support and can be retired.
EPISODE_SPOTS = [(-0.28, -0.18, 0.85), (0.26, 0.2, 0.9),
                 (-0.2, 0.22, 1.0), (0.3, -0.2, 1.0)]
EPISODE_R = 0.09


def episode_sphere(t, n_frames, n_episodes=4):
    """The transient sphere present at frame t (None in the gap between
    episodes — the scene is briefly object-free so carving completes)."""
    ep_len = n_frames // n_episodes
    ep = min(t // ep_len, n_episodes - 1)
    u = t - ep * ep_len
    if u >= ep_len - max(ep_len // 5, 8):   # gap at the episode tail
        return None, ep
    c = np.array(EPISODE_SPOTS[ep % len(EPISODE_SPOTS)])
    # small bob so the warp has something to track while it lives
    c = c + np.array([0.0, 0.012 * np.sin(0.25 * u), 0.0])
    return dict(center=tuple(c), radius=EPISODE_R), ep


def frame(cfg, t, n_frames, amp=0.38, episodes=0):
    if episodes:
        # STATIC camera; surface turnover comes from transient objects.
        # Decoupled from the sustained-pan tracking drift (the open item
        # measured by --pan / scripts/diag_pan.py).
        sp = [dict(center=CENTER, radius=RADIUS)] + SIDE
        extra, _ = episode_sphere(t, n_frames, episodes)
        if extra is not None:
            sp.append(extra)
        return synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols, np.eye(4), spheres=sp, plane_z=1.35
        )
    # pan mode: slow yaw oscillation about the central sphere — periphery
    # leaves the frustum for ~1/3 of a period (> node_retire_after)
    ang = amp * np.sin(2.0 * np.pi * t / (0.75 * n_frames))
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
    ap.add_argument("--amp", type=float, default=0.38,
                    help="pan amplitude, rad (0 = static camera: isolates "
                         "lifecycle effects from pan-tracking quality)")
    ap.add_argument("--rigid", action="store_true",
                    help="rigid KinectFusion mode (no warp): isolates "
                         "camera-pan tracking from the non-rigid solve")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="config overrides, like bench.py")
    ap.add_argument("--episodes", type=int, default=4,
                    help="N>0: STATIC-camera episode mode (default) — N "
                         "transient spheres appear/disappear in rotation; "
                         "surface turnover without camera motion. 0: the "
                         "camera-pan mode (exercises the lifecycle AND the "
                         "sustained-pan tracking-drift open item together)")
    args = ap.parse_args()

    # modest capacity so the scene SATURATES it (the lifecycle's regime)
    cfg = dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        max_nodes=args.nodes,
        node_retire_after=args.retire,
    )
    if args.rigid:
        cfg = dataclasses.replace(cfg, rigid_only=True, raycast_refine="secant")
    if args.set:
        import ast

        over = {}
        for kv in args.set:
            k, v = kv.split("=", 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            over[k] = v
        cfg = dataclasses.replace(cfg, **over)
    df = kinfu.DynamicFusion(cfg)

    # last live frame of the final episode (episode mode): measure the
    # final transient's reconstruction THERE — it only exists if insertion
    # still had slots late in the run (i.e. retirement freed some)
    last_live, last_spot = -1, None
    if args.episodes:
        for t in range(args.frames):
            extra, ep = episode_sphere(t, args.frames, args.episodes)
            if extra is not None and ep == args.episodes - 1:
                last_live, last_spot = t, EPISODE_SPOTS[ep % len(EPISODE_SPOTS)]

    snaps = []
    counts = []
    last_cov = None
    for t in range(args.frames):
        df(jnp.asarray(frame(cfg, t, args.frames, args.amp, args.episodes)),
           block=False)
        if t == last_live:
            cloud = tsdf_ops.extract_cloud(cfg, df.state.vol, max_points=1 << 19)
            pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
            near = np.linalg.norm(pts - np.asarray(last_spot), axis=-1) < EPISODE_R + 0.08
            import bench

            s, ci = bench._visible_sphere_samples(last_spot, EPISODE_R)
            last_cov = bench._coverage(pts[near], s[ci >= 0.15], cfg.voxel_size)
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
        "unit": "central-sphere surface coverage after turnover sequence",
        "mode": f"episodes={args.episodes}" if args.episodes else f"pan amp={args.amp}",
        "frames": args.frames,
        "median_err_mm": round(float(np.median(err)) * 1000.0, 3)
        if len(err) else None,
        "final_episode_coverage": (
            round(last_cov, 4) if last_cov is not None else None
        ),
        "node_capacity": args.nodes,
        "node_count_trajectory": counts,
        "node_churn_slots": churn,
        "node_churn_final_third": late_churn,
        "icp_ok": bool(df.last_outputs.icp_ok),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
