#!/usr/bin/env python3
"""In-frame phase attribution by LESION: run the whole-frame TPU bench with
one phase disabled (or one candidate lever applied) at a time and diff
against the baseline. The isolated-phase profiler (profile_phases.py) has a
~5 ms/call dispatch floor through the axon tunnel that swamps small phases;
whole-frame A/B deltas are the honest attribution (CLAUDE.md).

Usage: python scripts/lesion_bench.py [--frames 10] [--only TAG,...]
Each variant is one bench subprocess (sequential — ONE TPU client at a
time); results print as one line per variant and a JSON summary.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tag -> list of --set overrides (applied on top of the default bench cfg)
VARIANTS = {
    "baseline": [],
    # ---- lesions (what does the phase cost in-frame?) ----
    "no_fusion": ["fusion_interval=100000"],
    "no_map_warp": ["track_against_warped=False"],
    "no_lm_loop": ["solver_nonlinear_iters=0"],
    "no_icp": ["icp_iters=(0,0,0,0)"],
    "no_prealign": ["solver_rigid_prealign=False"],
    "no_insert": ["node_insert_stride=1000000"],
    # ---- candidate levers ----
    "ft_loose": ["solver_function_tolerance=1e-4"],
    "icp_tol": ["icp_step_tol=5e-5"],
    "icp_caps": ["icp_iters=(6,3,2,0)"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--only", default=None)
    ap.add_argument("--extra-set", action="append", default=[],
                    help="extra --set applied to EVERY variant (e.g. the "
                         "current default flags under study)")
    args = ap.parse_args()
    tags = args.only.split(",") if args.only else list(VARIANTS)

    results = {}
    for tag in tags:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--frames", str(args.frames), "--no-quality"]
        for kv in args.extra_set + VARIANTS[tag]:
            cmd += ["--set", kv]
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                           timeout=2400)
        ms = None
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                try:
                    ms = json.loads(line).get("ms_per_frame")
                except json.JSONDecodeError:
                    pass
        print(f"{tag:14s} {ms if ms is not None else 'FAIL':>8} ms"
              + ("" if r.returncode == 0 else f"  rc={r.returncode}"),
              flush=True)
        if ms is None:
            print(r.stdout[-500:] + r.stderr[-500:], flush=True)
        results[tag] = ms
    base = results.get("baseline")
    if base:
        deltas = {t: round(base - m, 1) for t, m in results.items()
                  if m is not None and t != "baseline"}
        print(json.dumps({"baseline_ms": base, "delta_ms_vs_baseline": deltas}))


if __name__ == "__main__":
    main()
