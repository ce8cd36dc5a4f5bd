#!/usr/bin/env python3
"""Decompose the ICP phase cost at the bench shape.

Times (honest chained timing, like profile_phases):
- full estimate_transform at the default iteration schedule,
- schedule variants (lower caps),
- ONE _build_system linearization at the finest level,
- the 6x6 solve alone.

Usage: python scripts/micro_icp.py [--iters 5]
"""

import argparse
import dataclasses
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
from dynamicfusion_tpu.solvers import icp
from dynamicfusion_tpu.ops import preprocess


def perturb(x, s):
    return jnp.where(s > jnp.asarray(1e30, s.dtype), x + jnp.ones((), x.dtype), x)


def bench(name, make, iters):
    f, args = make()
    s = jnp.zeros((), jnp.float32)
    s = f(s, *args)
    float(s)
    t0 = time.time()
    s = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        s = f(s, *args)
    float(s)
    print(f"{name:44s} {(time.time()-t0)/iters*1000.0:9.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = DynamicFusionConfig.default_dynamicfusion()
    print(f"device: {jax.devices()[0]}  sub={cfg.raycast_subsample} "
          f"track_levels={cfg.track_levels} iters={cfg.icp_iters}", flush=True)

    df = kinfu.DynamicFusion(cfg)
    for t in range(2):
        sp = [dict(center=(0.0, 0.0, 0.95), radius=0.22),
              dict(center=(0.2 + 0.008 * np.sin(0.4 * t), 0.1, 0.8), radius=0.1)]
        d = synthetic.scene_depth(cfg.intr, cfg.rows, cfg.cols, spheres=sp, plane_z=1.25)
        df(jnp.asarray(d))
    state = df.state
    depth = jnp.asarray(synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols,
        spheres=[dict(center=(0.0, 0.0, 0.95), radius=0.22),
                 dict(center=(0.208, 0.1, 0.8), radius=0.1)], plane_z=1.25))
    _, pts_pyr, nrm_pyr, _ = jax.jit(lambda d: preprocess.build_frame_pyramid(cfg, d))(depth)
    shift = cfg.raycast_shift
    cur_p = tuple(pts_pyr[shift:])
    cur_n = tuple(nrm_pyr[shift:])
    prev_p, prev_n = state.prev_points, state.prev_normals

    def mk_full(cfg_i):
        @jax.jit
        def f(s, cp0, cn, pp, pn):
            cp = (perturb(cp0[0], s),) + tuple(cp0[1:])
            r = icp.estimate_transform(cfg_i, list(cp), list(cn), list(pp), list(pn),
                                       level_offset=shift)
            return jnp.sum(r.transform)
        return lambda: (f, (cur_p, cur_n, prev_p, prev_n))

    bench(f"estimate_transform caps={cfg.icp_iters}", mk_full(cfg), args.iters)
    for caps in ((5, 3, 4, 0), (3, 2, 4, 0), (1, 1, 4, 0)):
        cfg_i = dataclasses.replace(cfg, icp_iters=caps)
        bench(f"estimate_transform caps={caps}", mk_full(cfg_i), args.iters)
    cfg_nt = dataclasses.replace(cfg, icp_step_tol=0.0)  # no early exit
    bench("estimate_transform NO early exit", mk_full(cfg_nt), args.iters)

    import math
    dist2 = cfg.icp_dist_thres ** 2
    min_cos = math.cos(cfg.icp_angle_thres)
    intr0 = cfg.intr.level(shift)

    def mk_sys():
        @jax.jit
        def f(s, cp, cn, pp, pn):
            a, b = icp._build_system(
                intr0, jnp.eye(4), perturb(cp, s), cn, pp, pn, dist2, min_cos
            )
            return jnp.sum(a) + jnp.sum(b)
        return f, (cur_p[0], cur_n[0], prev_p[0], prev_n[0])
    bench("ONE _build_system (finest level)", lambda: mk_sys(), args.iters)

    def mk_solve():
        a0 = np.random.default_rng(0).normal(size=(6, 6)).astype(np.float32)
        a0 = a0 @ a0.T + 10 * np.eye(6, dtype=np.float32)
        b0 = np.ones(6, np.float32)

        @jax.jit
        def f(s, a, b):
            x = jnp.linalg.solve(perturb(a, s), b)
            return jnp.sum(x)
        return f, (jnp.asarray(a0), jnp.asarray(b0))
    bench("6x6 solve alone", lambda: mk_solve(), args.iters)


if __name__ == "__main__":
    main()
