#!/usr/bin/env python3
"""Collective-communication census of the compiled sharded step.

Compiles parallel.sharded.make_sharded_step on the virtual 8-device CPU
mesh at a given shape, walks the COMPILED HLO (post-SPMD-partitioning, so
GSPMD-inserted halo exchanges are visible, not just the explicit shard_map
psums), and reports every collective op with its per-device payload bytes.

Static census only: ops inside while-loop bodies execute once per loop
trip — the dynamic per-frame model (trip counts, ICI/DCN cost) lives in
SCALING.md, built from this output.

Usage: python scripts/collective_bytes.py [--dims 256 --rows 480 --cols 640
       --nodes 1024] [--out SCALING_data.json]
"""

import argparse
import collections
import dataclasses
import json
import os
import re
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

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute", "collective-broadcast",
)


def tensor_bytes(sig: str) -> int:
    """Total bytes of an HLO type signature like
    'f32[6144,6144]' or '(f32[6144,6144], f32[6144])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([0-9,]*)\]", sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def census(hlo: str):
    """Group collective ops by (kind, per-device payload bytes); keep the
    op_name metadata (the jax source path) of each group's first instance
    so every byte is attributable."""
    out = collections.Counter()
    names = {}
    for line in hlo.splitlines():
        m = re.search(r"=\s+(\([^)]*\)|\S+)\s+(" + "|".join(COLLECTIVES) + r")\(", line)
        if not m:
            continue
        sig, kind = m.group(1), m.group(2)
        # all-reduce-start/done pairs: count the start only
        if "-done" in line.split("=")[0]:
            continue
        key = (kind, tensor_bytes(sig))
        out[key] += 1
        nm = re.search(r'op_name="([^"]*)"', line)
        if nm and key not in names:
            names[key] = nm.group(1)[-120:]
    return out, names


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
    for (kind, nbytes), count in sorted(c.items(), key=lambda kv: -kv[0][1]):
        src = names.get((kind, nbytes), "")
        rows.append({"op": kind, "payload_bytes": nbytes, "count": count,
                     "src": src})
        total += nbytes * count
        print(f"  {kind:22s} {nbytes/1e6:10.3f} MB/device  x{count}  {src}",
              flush=True)
    print(f"static total (one execution of every op): {total/1e6:.1f} MB/device")

    result = {
        "shape": {"dims": args.dims, "rows": args.rows, "cols": args.cols,
                  "nodes": args.nodes, "devices": 8},
        "collectives": rows,
        "static_total_bytes": total,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
