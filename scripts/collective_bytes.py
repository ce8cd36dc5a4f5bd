#!/usr/bin/env python3
"""Collective-communication census of the compiled sharded step.

Compiles parallel.sharded.make_sharded_step on the virtual 8-device CPU
mesh at a given shape, walks the COMPILED HLO (post-SPMD-partitioning, so
GSPMD-inserted halo exchanges are visible, not just the explicit shard_map
psums), and reports every collective op with its per-device payload bytes.

Each collective is classified PER-TRIP (inside a while-loop body after
XLA's loop-invariant hoisting — executed once per loop trip) or
once-per-execution (utils/hlo_census.py); the dynamic per-frame model
(trip counts, ICI/DCN cost) lives in SCALING.md, built from this output.

Usage: python scripts/collective_bytes.py [--dims 256 --rows 480 --cols 640
       --nodes 1024] [--out SCALING_data.json]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# single-process-CPU-mesh cache subdir, shared with __graft_entry__'s
# dryrun (same programs, same runtime context — see tests/conftest.py on
# why contexts must not share a cache directory)
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache", "cpu_mesh")
)
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp  # noqa: E402

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics  # noqa: E402
from dynamicfusion_tpu.parallel import sharded  # noqa: E402
from dynamicfusion_tpu.pipeline import kinfu  # noqa: E402

from dynamicfusion_tpu.utils.hlo_census import census  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=256)
    ap.add_argument("--rows", type=int, default=480)
    ap.add_argument("--cols", type=int, default=640)
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--solver", default="direct", choices=["direct", "pcg"],
                    help="'pcg' = the distributed-PCG solve (unsummed "
                         "per-shard Grams, no Schur all-reduce; SCALING.md "
                         "§4); 'direct' = summed Schur + replicated Cholesky")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # base on the flagship preset so the full-shape program is IDENTICAL
    # to __graft_entry__.dryrun_multichip's (shared compile cache)
    scale = args.cols / 640.0
    cfg = dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        rows=args.rows,
        cols=args.cols,
        volume_dims=args.dims,
        max_nodes=args.nodes,
        intr=Intrinsics(570.342 * scale, 570.342 * scale, args.cols / 2.0, args.rows / 2.0),
        solver_linear=args.solver,
    )
    mesh = sharded.make_mesh(8)
    step = sharded.make_sharded_step(cfg, mesh)

    state = kinfu.init_state(cfg)
    state = sharded.shard_state(cfg, mesh, state)
    depth = jnp.zeros((cfg.rows, cfg.cols), jnp.uint16)

    import time

    t0 = time.time()
    lowered = step.lower(state, depth)
    compiled = lowered.compile()
    print(f"compiled sharded step at {args.dims}^3/{args.cols}x{args.rows}/"
          f"{args.nodes} nodes in {time.time()-t0:.0f}s", flush=True)

    hlo = compiled.as_text()
    c, names = census(hlo)

    rows = []
    total = 0
    per_trip_total = 0
    for (kind, nbytes, per_trip), count in sorted(c.items(), key=lambda kv: -kv[0][1]):
        src = names.get((kind, nbytes, per_trip), "")
        rows.append({"op": kind, "payload_bytes": nbytes, "count": count,
                     "per_trip": per_trip, "src": src})
        total += nbytes * count
        if per_trip:
            per_trip_total += nbytes * count
        tag = "PER-TRIP" if per_trip else "        "
        print(f"  {kind:22s} {nbytes/1e6:10.3f} MB/device  x{count} {tag} {src}",
              flush=True)
    print(f"static total (one execution of every op): {total/1e6:.1f} MB/device"
          f"  (per-trip class: {per_trip_total/1e6:.3f} MB x loop trips)")

    result = {
        "shape": {"dims": args.dims, "rows": args.rows, "cols": args.cols,
                  "nodes": args.nodes, "devices": 8},
        "solver": args.solver,
        "collectives": rows,
        "static_total_bytes": total,
        "per_trip_bytes": per_trip_total,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
