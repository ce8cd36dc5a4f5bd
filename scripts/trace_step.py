#!/usr/bin/env python3
"""Device-op attribution of the real frame step via jax.profiler.

Runs a few full-scale steps on the TPU under a perfetto trace and prints
the top device ops by total duration, grouped by (fusion) op name — the
ground-truth in-frame attribution that neither the isolated-phase profiler
(5 ms dispatch floor) nor whole-frame lesions (downstream confounding; see
scripts/lesion_bench.py) can give.

Usage: python scripts/trace_step.py [--steps 3] [--top 40]
"""

import argparse
import collections
import glob
import gzip
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
from dynamicfusion_tpu.pipeline import kinfu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/df_trace")
    ap.add_argument("--rigid", action="store_true",
                    help="trace the plain-KinectFusion path (bench --rigid config)")
    args = ap.parse_args()

    cfg = DynamicFusionConfig.default_dynamicfusion()
    if args.rigid:
        import dataclasses
        cfg = dataclasses.replace(cfg, rigid_only=True, raycast_refine="secant")
    df = kinfu.DynamicFusion(cfg)
    frames = []
    for t in range(args.steps + 2):
        sp = [dict(center=(0.0, 0.0, 0.95), radius=0.22),
              dict(center=(0.2 + 0.008 * np.sin(0.4 * t), 0.1, 0.8), radius=0.1)]
        frames.append(jnp.asarray(synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols, spheres=sp, plane_z=1.25)))
    df(frames[0])
    df(frames[1])
    _ = float(df.last_outputs.solver_cost1)  # warm/compile done

    os.makedirs(args.dir, exist_ok=True)
    jax.profiler.start_trace(args.dir, create_perfetto_trace=True)
    for d in frames[2:]:
        df(d, block=False)
    _ = float(df.last_outputs.solver_cost1)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.dir, "**", "*.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        print("no perfetto trace written; dir contents:",
              glob.glob(os.path.join(args.dir, "**", "*"), recursive=True))
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device-op complete events: name + dur (us). Keep only TPU tracks
    # (pid/tid names containing 'TPU'/'device'); fall back to everything
    # with a dur if the track names differ.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e.get("pid"), None if e["name"] == "process_name" else e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = names.get((e.get("pid"), None), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        per_op[e["name"]] += e["dur"]
        total += e["dur"]
    if not per_op:  # track naming fallback
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                per_op[e["name"]] += e["dur"]
                total += e["dur"]
    n = args.steps
    print(f"total device-op time {total/1000/n:.1f} ms/step over {n} steps")

    # map HLO instruction names -> jax op_name metadata (source attribution)
    import re
    hlo = df._step.lower(df.state, frames[0]).compile().as_text()
    meta = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m:
            nm = re.search(r'op_name="([^"]*)"', line)
            if nm:
                meta[m.group(1)] = nm.group(1)[-90:]
    for name, us in per_op.most_common(args.top):
        src = meta.get(name, meta.get(name.split("(")[0], ""))
        print(f"{us/1000/n:9.3f} ms/step  {name[:60]:60s} {src}")


if __name__ == "__main__":
    main()
