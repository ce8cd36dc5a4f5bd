#!/usr/bin/env python3
"""Decompose the two biggest frame phases on TPU at bench shape:

- model maps (60 ms): coarse-band raycast / fine banded raycast march /
  crossing refine / DQB map warp / pyramid build
- nonrigid fusion (41 ms): coarse field (KNN+DQB) / warp of coarse grid /
  brick classify / band depth lookup / full integrate; plus runtime brick
  class counts (to size the static caps).

Honest timing: outputs chained into inputs, scalar fetched at the end.
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
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.ops import bricks, fusion, preprocess, tsdf as tsdf_ops
from dynamicfusion_tpu.pipeline import kinfu


def perturb(x, s):
    if x.dtype == bool:
        return x
    return jnp.where(s > jnp.asarray(1e30, s.dtype), x + jnp.ones((), x.dtype), x)


def bench_phase(name, make_jitted, iters=5):
    f, args = make_jitted()
    s = jnp.zeros((), jnp.float32)
    s = f(s, *args)
    float(s)
    t0 = time.time()
    s = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        s = f(s, *args)
    float(s)
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    cfg = DynamicFusionConfig.default_dynamicfusion()
    print(f"device: {jax.devices()[0]}", flush=True)

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
    print(f"state ready: nodes={int(state.warp.count)}", flush=True)

    pose = state.pose
    vol = state.vol
    warp = state.warp
    vp = se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))
    cam2vol = se3.compose(se3.inverse(vp), pose)
    shift = cfg.raycast_shift
    rows_t = cfg.rows // cfg.raycast_subsample
    cols_t = cfg.cols // cfg.raycast_subsample
    intr_t = cfg.intr.level(shift)

    # ---------------- model maps decomposition ----------------
    def mk_band():
        @jax.jit
        def f(s, tsdf, w, c2v):
            lo, hi = tsdf_ops.raycast_coarse_band(
                cfg, TsdfVolume(perturb(tsdf, s), w), c2v, intr_t, rows_t, cols_t)
            return jnp.nansum(lo[::32, ::32]) + jnp.nansum(hi[::32, ::32])
        return f, (vol.tsdf, vol.weight, cam2vol)
    bench_phase("maps: coarse band (80x60 march)", mk_band)

    band = jax.jit(lambda t, w, c: tsdf_ops.raycast_coarse_band(
        cfg, TsdfVolume(t, w), c, intr_t, rows_t, cols_t))(vol.tsdf, vol.weight, cam2vol)

    def mk_fine():
        @jax.jit
        def f(s, tsdf, w, c2v, lo, hi):
            r = tsdf_ops.raycast(cfg, TsdfVolume(perturb(tsdf, s), w), c2v,
                                 intr_t, rows_t, cols_t, t_band=(lo, hi))
            return jnp.nansum(r.points[::32, ::32])
        return f, (vol.tsdf, vol.weight, cam2vol, band[0], band[1])
    bench_phase("maps: fine banded raycast (320x240)", mk_fine)

    res = jax.jit(lambda t, w, c, lo, hi: tsdf_ops.raycast(
        cfg, TsdfVolume(t, w), c, intr_t, rows_t, cols_t, t_band=(lo, hi))
    )(vol.tsdf, vol.weight, cam2vol, band[0], band[1])

    dq_grid, q_grid = jax.jit(lambda w_pos, w_dq: fusion.coarse_field(
        cfg, warp._replace(positions=w_pos, dq=w_dq)))(warp.positions, warp.dq)

    def mk_warp():
        @jax.jit
        def f(s, pts, nrm, dq):
            shape = pts.shape
            pw = se3.transform_points(pose, perturb(pts, s)).reshape(-1, 3)
            nw = se3.rotate_dirs(pose, nrm).reshape(-1, 3)
            wp, wn = fusion.warp_points_trilinear(cfg, dq, pw, nw)
            return jnp.nansum(wp[::512])
        return f, (res.points, res.normals, dq_grid)
    bench_phase("maps: DQB map warp (trilinear grid)", mk_warp)

    def mk_pyr():
        @jax.jit
        def f(s, pts, nrm):
            pyr = kinfu._pyramid_from_maps(cfg, perturb(pts, s), nrm)
            return jnp.nansum(pyr[0][-1][::16, ::16])
        return f, (res.points, res.normals)
    bench_phase("maps: pyramid build", mk_pyr)

    def mk_all():
        @jax.jit
        def f(s, tsdf, w, w_pos, w_dq, dq):
            fld = warp._replace(positions=w_pos, dq=w_dq)
            (pp, pn), cp, cn = kinfu._model_maps(
                cfg, TsdfVolume(perturb(tsdf, s), w), fld, pose, dq_grid=dq)
            return jnp.nansum(pp[0][::64, ::64])
        return f, (vol.tsdf, vol.weight, warp.positions, warp.dq, dq_grid)
    bench_phase("maps: TOTAL (with dq_grid)", mk_all)

    # ---------------- fusion decomposition ----------------
    dists = jax.jit(lambda d: preprocess.compute_dists(cfg.intr, d))(depth)

    def mk_cf():
        @jax.jit
        def f(s, w_pos, w_dq):
            fld = warp._replace(positions=perturb(w_pos, s), dq=w_dq)
            dq, q = fusion.coarse_field(cfg, fld)
            return jnp.sum(dq[::8, ::8, ::8, 0]) + jnp.sum(q[::8, ::8, ::8])
        return f, (warp.positions, warp.dq)
    bench_phase("fusion: coarse field (KNN+DQB 33^3)", mk_cf)

    def mk_wg():
        @jax.jit
        def f(s, w_pos, w_dq, dq):
            fld = warp._replace(positions=perturb(w_pos, s), dq=w_dq)
            wg = fusion.warp_coarse_grid(cfg, fld, dq)
            return jnp.sum(wg[::8, ::8, ::8, 0])
        return f, (warp.positions, warp.dq, dq_grid)
    bench_phase("fusion: warp coarse grid", mk_wg)

    warped = jax.jit(lambda dq: fusion.warp_coarse_grid(cfg, warp, dq))(dq_grid)
    w2c = se3.inverse(pose)
    cam_grid = jnp.dot(warped, w2c[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    g = cfg.knn_field_stride
    rows_i, cols_i = dists.shape
    rect = min(cfg.integrate_rect, 128)
    import math
    levels = int(math.ceil(math.log2(max(rows_i, cols_i)))) + 1

    def mk_cls():
        @jax.jit
        def f(s, cg, d):
            pyr = bricks.build_depth_pyramid(perturb(d, s), levels)
            bc = bricks.classify(cfg, cg, g, pyr, cfg.intr, rows_i, cols_i, rect)
            return jnp.sum(bc.cls).astype(jnp.float32)
        return f, (cam_grid, dists)
    bench_phase("fusion: depth pyr + classify", mk_cls)

    counts = jax.jit(lambda cg, d: bricks.brick_counts(cfg, cfg.volume_dims, cg, g, d, cfg.intr))(cam_grid, dists)
    print("    brick counts (skip, front, band, wide):", [int(c) for c in counts])

    def mk_int():
        @jax.jit
        def f(s, tsdf, w, d, cg):
            v, _ = bricks.integrate_bricks(
                cfg, TsdfVolume(perturb(tsdf, s), w), d, cg, g, cfg.intr,
                with_counts=True, q_grid=q_grid)
            return jnp.sum(v.tsdf[::64, ::64, ::64].astype(jnp.float32))
        return f, (vol.tsdf, vol.weight, dists, cam_grid)
    bench_phase("fusion: integrate_bricks TOTAL", mk_int)

    for cap in (1024, 512):
        cfg_c = dataclasses.replace(cfg, integrate_band_cap=cap)

        def mk_intc(cfg_c=cfg_c):
            @jax.jit
            def f(s, tsdf, w, d, cg):
                v, _ = bricks.integrate_bricks(
                    cfg_c, TsdfVolume(perturb(tsdf, s), w), d, cg, g, cfg_c.intr,
                    with_counts=True, q_grid=q_grid)
                return jnp.sum(v.tsdf[::64, ::64, ::64].astype(jnp.float32))
            return f, (vol.tsdf, vol.weight, dists, cam_grid)
        bench_phase(f"fusion: integrate band_cap={cap}", mk_intc)


if __name__ == "__main__":
    main()
