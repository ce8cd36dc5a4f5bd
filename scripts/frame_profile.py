#!/usr/bin/env python3
"""Per-frame wall-clock profile of the full-scale step (latency uniformity).

Times EVERY frame individually (block=True per frame, so each number
includes the ~2-5 ms dispatch floor through the axon tunnel — absolute
values are upper bounds, but the SPIKE STRUCTURE across the fusion
interval is what this measures; VERDICT r4 weak #5 / next #5).

Usage: python scripts/frame_profile.py [--frames 24] [--set k=v ...]
Prints one line per frame and a summary JSON line (mean, p50, max,
spike_ratio = max/median over the steady-state tail).
"""

import argparse
import ast
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--rigid", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    cfg = DynamicFusionConfig.default_dynamicfusion()
    if args.rigid:
        cfg = dataclasses.replace(cfg, rigid_only=True, raycast_refine="secant")
    over = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        over[k] = v
    if over:
        cfg = dataclasses.replace(cfg, **over)

    frames = []
    for t in range(args.frames + 2):
        sp = [dict(center=(0.0, 0.0, 0.95), radius=0.22),
              dict(center=(0.2 + 0.008 * np.sin(0.4 * t), 0.1, 0.8), radius=0.1)]
        frames.append(jnp.asarray(synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols, spheres=sp, plane_z=1.25)))

    df = kinfu.DynamicFusion(cfg)
    df(frames[0])
    df(frames[1])
    _ = float(df.last_outputs.solver_cost1)  # compile done

    times = []
    for i, d in enumerate(frames[2:]):
        t0 = time.perf_counter()
        df(d, block=False)
        _ = float(df.last_outputs.solver_cost1)  # full sync each frame
        ms = (time.perf_counter() - t0) * 1000.0
        times.append(ms)
        print(f"frame {i:3d}  {ms:7.2f} ms")

    t = np.array(times[2:])  # drop warm-up tail of the pipeline
    med = float(np.median(t))
    print(json.dumps({
        "metric": "frame_latency_profile",
        "mean_ms": round(float(t.mean()), 2),
        "p50_ms": round(med, 2),
        "max_ms": round(float(t.max()), 2),
        "spike_ratio": round(float(t.max()) / med, 3),
        "fusion_interval": cfg.fusion_interval,
        "fusion_phase_split": cfg.fusion_phase_split,
        "frames": len(t),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
