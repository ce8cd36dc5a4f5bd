#!/usr/bin/env python3
"""Hunt the quality bench's p95 tail: where does the worst surface error
live? Runs the deforming-sphere quality scene (bench.py --quality), then
bins per-point canonical-surface error by the candidate explanatory
variables:

- distance to the nearest warp node (insertion seams / uncovered surface)
- viewing incidence at t=0 (silhouette ring: grazing rays -> poor TSDF)
- polar angle from the bulge axis (deformation speed: the equatorial bulge
  moves fastest)
- TSDF weight at the point (young / rarely-observed voxels)

Usage: python scripts/diag_tail.py [--frames 25] [--small]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.ops import tsdf as tsdf_ops
from dynamicfusion_tpu.pipeline import kinfu

CENTER, RADIUS = (0.0, 0.0, 0.9), 0.25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    cfg = (DynamicFusionConfig.small(dims=64, rows=120, cols=160)
           if args.small else DynamicFusionConfig.default_dynamicfusion())
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
    for t in range(args.frames):
        sphere = synthetic.deforming_sphere_depth(
            cfg.intr, cfg.rows, cfg.cols, t=0.35 * t, center=CENTER,
            radius=RADIUS, amp=0.04,
        )
        bg = synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols,
            spheres=[dict(center=(0.32, -0.18, 1.0), radius=0.1)], plane_z=1.3,
        )
        d = np.where((sphere > 0) & ((bg == 0) | (sphere < bg)), sphere, bg)
        df(jnp.asarray(d), block=False)
    _ = float(df.last_outputs.solver_cost1)
    print(f"ran {args.frames} frames, nodes={int(df.state.warp.count)}", flush=True)

    cloud = tsdf_ops.extract_cloud(cfg, df.state.vol, max_points=1 << 19)
    pts_all = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    near = np.linalg.norm(pts_all - np.asarray(CENTER), axis=-1) < RADIUS + 0.12
    bgm = np.linalg.norm(pts_all - np.array([0.32, -0.18, 1.0]), axis=-1) < 0.16
    pts = pts_all[near & ~bgm]
    rel = pts - np.asarray(CENTER)
    rr = np.linalg.norm(rel, axis=-1)
    err = np.abs(rr - RADIUS) * 1000.0  # mm

    med, p90, p95, p99 = (np.percentile(err, q) for q in (50, 90, 95, 99))
    print(f"n={len(err)}  median={med:.2f}  p90={p90:.2f}  p95={p95:.2f}  "
          f"p99={p99:.2f} mm  (voxel {cfg.voxel_size*1000:.2f} mm)", flush=True)

    # ---- explanatory variables ----
    # nearest-node distance (canonical frame)
    d2 = np.asarray(warpfield.nearest_dist2(df.state.warp, jnp.asarray(pts)))
    nnd = np.sqrt(d2) * 1000.0  # mm

    # viewing incidence at the identity camera: cos between the outward
    # surface normal (radial) and the view ray (point direction)
    vdir = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    nrm = rel / np.maximum(rr[:, None], 1e-9)
    cos_inc = np.abs(np.sum(vdir * nrm, axis=-1))

    # polar angle from the bulge axis (y): the equator (cos2th=1... theta
    # from y axis) — bulge ~ cos(2*theta), max deformation speed at theta=0
    # and pi/2
    cos_th = np.abs(rel[:, 1]) / np.maximum(rr, 1e-9)

    # TSDF weight at each point
    vox = (pts - np.asarray(cfg.volume_origin)) / cfg.voxel_size
    vi = np.clip(np.round(vox).astype(int), 0, cfg.volume_dims - 1)
    wvol = np.asarray(df.state.vol.weight)
    wpt = wvol[vi[:, 0], vi[:, 1], vi[:, 2]]

    tail = err > p95
    def stats(name, v):
        print(f"  {name:26s} all: med={np.median(v):8.3f}  "
              f"tail(p95+): med={np.median(v[tail]):8.3f}  "
              f"tail p10..p90: {np.percentile(v[tail], 10):.3f}"
              f"..{np.percentile(v[tail], 90):.3f}", flush=True)

    print("tail characterization (err > p95):")
    stats("nearest-node dist (mm)", nnd)
    stats("|cos incidence|", cos_inc)
    stats("|cos theta_y|", cos_th)
    stats("tsdf weight", wpt)

    # where is the tail spatially? bin by z relative to center and by
    # image-space radius
    print("  tail fraction by |cos incidence| bin:")
    for lo, hi in ((0.0, 0.2), (0.2, 0.4), (0.4, 0.6), (0.6, 0.8), (0.8, 1.01)):
        m = (cos_inc >= lo) & (cos_inc < hi)
        if m.sum() > 0:
            print(f"    [{lo:.1f},{hi:.1f}): n={m.sum():7d} "
                  f"tail%={100.0*np.mean(tail[m]):6.2f} "
                  f"med_err={np.median(err[m]):7.2f} mm", flush=True)
    print("  tail fraction by nearest-node-dist bin (mm):")
    for lo, hi in ((0, 10), (10, 20), (20, 30), (30, 50), (50, 1e9)):
        m = (nnd >= lo) & (nnd < hi)
        if m.sum() > 0:
            print(f"    [{lo},{hi}): n={m.sum():7d} "
                  f"tail%={100.0*np.mean(tail[m]):6.2f} "
                  f"med_err={np.median(err[m]):7.2f} mm", flush=True)
    print("  tail fraction by tsdf-weight bin:")
    for lo, hi in ((0, 4), (4, 16), (16, 40), (40, 65)):
        m = (wpt >= lo) & (wpt < hi)
        if m.sum() > 0:
            print(f"    [{lo},{hi}): n={m.sum():7d} "
                  f"tail%={100.0*np.mean(tail[m]):6.2f} "
                  f"med_err={np.median(err[m]):7.2f} mm", flush=True)

    print(json.dumps({"median_mm": round(float(med), 3),
                      "p95_mm": round(float(p95), 3),
                      "p99_mm": round(float(p99), 3)}))


if __name__ == "__main__":
    main()
