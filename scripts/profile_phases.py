#!/usr/bin/env python3
"""Per-phase TPU wall-clock breakdown of the full-scale frame step.

Times each pipeline phase in isolation at the bench workload shape
(640x480, 256^3, 1024 nodes). Honest timing: every iteration's input is
data-dependent on the previous iteration's output (via a never-true
where-perturbation that XLA cannot fold), and a scalar is fetched at the
end — `block_until_ready` on repeated identical calls can lie through the
axon tunnel (see CLAUDE.md).

Usage: python scripts/profile_phases.py [--iters N] [--small]

CAVEATS (learned round 4 — prefer scripts/trace_step.py for attribution):
- each isolated phase pays a ~5 ms dispatch floor through the axon
  tunnel, swamping small phases;
- a probe that consumes only SOME outputs lets XLA dead-code the rest:
  the preprocess probe here consumed dists + the finest points level and
  never executed the deeper pyramid (whose strided-slice gathers were
  ~20 ms/frame in the real step). When you micro-profile, consume every
  output you claim to measure.
"""

import argparse
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
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models.volume import TsdfVolume
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.ops import fusion, preprocess, tsdf as tsdf_ops
from dynamicfusion_tpu.pipeline import kinfu
from dynamicfusion_tpu.solvers import icp, warp_solver


def perturb(x, s):
    """Data-dependence on scalar s without changing the value (s is finite)."""
    if x.dtype == bool:
        return x
    return jnp.where(s > jnp.asarray(1e30, s.dtype), x + jnp.ones((), x.dtype), x)


def bench_phase(name, make_jitted, iters):
    """make_jitted() -> (f, args) where f(s, *args) -> scalar. Times chained calls."""
    f, args = make_jitted()
    s = jnp.zeros((), jnp.float32)
    s = f(s, *args)          # compile + warm
    float(s)
    t0 = time.time()
    s = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        s = f(s, *args)
    float(s)
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return name, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    if args.small:
        cfg = DynamicFusionConfig.small(dims=64, rows=120, cols=160)
    else:
        cfg = DynamicFusionConfig.default_dynamicfusion()
    print(f"device: {jax.devices()[0]}  cfg: {cfg.cols}x{cfg.rows} "
          f"{cfg.volume_dims}^3 nodes={cfg.max_nodes}", flush=True)

    # ---- build a realistic populated state: run 2 frames ----
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
    results = {}

    # ---- phase 1: preprocess ----
    def mk_pre():
        @jax.jit
        def f(s, depth):
            _, pts, nrm, dists = preprocess.build_frame_pyramid(cfg, perturb(depth, s))
            return jnp.sum(dists[::64, ::64]) + pts[0][0, 0, 0] * 0
        return f, (depth,)
    results.update([bench_phase("preprocess", mk_pre, args.iters)])

    # precompute pyramids/dists once for downstream phases
    _, pts_pyr, nrm_pyr, dists = jax.jit(
        lambda d: preprocess.build_frame_pyramid(cfg, d))(depth)

    # ---- phase 2: ICP ----
    def mk_icp():
        @jax.jit
        def f(s, pts0, nrm_pyr0, prev_p, prev_n):
            pts = [perturb(pts0[0], s)] + list(pts0[1:])
            r = icp.estimate_transform(cfg, pts, list(nrm_pyr0), list(prev_p), list(prev_n))
            return jnp.sum(r.transform)
        return f, (tuple(pts_pyr), tuple(nrm_pyr), state.prev_points, state.prev_normals)
    results.update([bench_phase("icp", mk_icp, args.iters)])

    # ---- phase 3: raycast ----
    vp = se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))
    cam2vol = se3.compose(se3.inverse(vp), pose)

    def mk_ray():
        @jax.jit
        def f(s, tsdf, w, c2v):
            r = tsdf_ops.raycast(cfg, TsdfVolume(perturb(tsdf, s), w), c2v,
                                 cfg.intr, cfg.rows, cfg.cols)
            return jnp.nansum(r.points[::64, ::64])
        return f, (vol.tsdf, vol.weight, cam2vol)
    results.update([bench_phase("raycast (full res)", mk_ray, args.iters)])

    # ---- phase 4: warp solve (and per-iteration marginal cost) ----
    # mirror kinfu.step: canonical maps live at 1/raycast_subsample res,
    # live maps at the matching pyramid level, shared residual stride
    shift = cfg.raycast_shift
    stride = max(1, cfg.solver_point_stride // cfg.raycast_subsample)
    can_w = se3.transform_points(pose, state.can_points)
    can_nw = se3.rotate_dirs(pose, state.can_normals)
    live_w = se3.transform_points(pose, pts_pyr[shift])
    live_nw = se3.rotate_dirs(pose, nrm_pyr[shift])
    sub = lambda a: a[::stride, ::stride].reshape(-1, 3)
    sol_inputs = warp_solver.WarpSolveInputs(
        p_can=sub(can_w), n_can=sub(can_nw), p_live=sub(live_w), n_live=sub(live_nw))

    for ni in ([1, 5] if not args.small else [cfg.solver_nonlinear_iters]):
        cfg_i = dataclasses.replace(cfg, solver_nonlinear_iters=ni)

        def mk_solve(cfg_i=cfg_i):
            @jax.jit
            def f(s, pc, nc, pl, nl, w_pos, w_dq, w_rad, w_act, w_cnt):
                fld = warpfield.WarpField(w_pos, w_dq, w_rad, w_act, w_cnt)
                inp = warp_solver.WarpSolveInputs(perturb(pc, s), nc, pl, nl)
                _, st = warp_solver.solve(cfg_i, fld, inp)
                return st.final_cost
            return f, (sol_inputs.p_can, sol_inputs.n_can, sol_inputs.p_live,
                       sol_inputs.n_live, warp.positions, warp.dq, warp.radius,
                       warp.active, warp.count)
        results.update([bench_phase(f"warp solve (LM iters={ni})", mk_solve, args.iters)])

    # ---- phase 4a: solver sub-phases ----
    p2pl = cfg.point_to_plane
    struct = jax.jit(
        lambda inp: warp_solver.prepare(cfg, warp, inp, p2pl)
    )(sol_inputs)

    def mk_prep():
        @jax.jit
        def f(s, pc, nc, pl, nl):
            inp = warp_solver.WarpSolveInputs(perturb(pc, s), nc, pl, nl)
            st = warp_solver.prepare(cfg, warp, inp, p2pl)
            return jnp.sum(st.w_knn[::512])
        return f, (sol_inputs.p_can, sol_inputs.n_can, sol_inputs.p_live,
                   sol_inputs.n_live)
    results.update([bench_phase("solver: prepare (knn+edges)", mk_prep, args.iters)])

    def mk_rj():
        @jax.jit
        def f(s, dqs):
            r, jac, re, je_i, je_j = warp_solver.residual_and_jac(
                cfg, struct, perturb(dqs, s), p2pl)
            return jnp.sum(r[::512]) + jnp.sum(jac[::997]) + jnp.sum(re[::64])
        return f, (warp.dq,)
    results.update([bench_phase("solver: residual+jacobian", mk_rj, args.iters)])

    def mk_asm():
        @jax.jit
        def f(s, dqs):
            jtj, jtr, _ = warp_solver.gn_system_dense(
                cfg, struct, perturb(dqs, s), cfg.max_nodes, p2pl)
            return jnp.sum(jtj[::256, ::256]) + jnp.sum(jtr[::256])
        return f, (warp.dq,)
    results.update([bench_phase("solver: full JtJ assembly", mk_asm, args.iters)])

    def mk_cost():
        @jax.jit
        def f(s, dqs):
            return warp_solver.cost_at(cfg, struct, perturb(dqs, s), p2pl)
        return f, (warp.dq,)
    results.update([bench_phase("solver: cost_at", mk_cost, args.iters)])

    # ---- phase 4b: standalone pieces ----
    n_nodes = cfg.max_nodes
    dof = 6 * n_nodes
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (dof, dof)) * 0.01
    spd = m @ m.T + jnp.eye(dof) * 10.0
    rhs = jax.random.normal(key, (dof,))

    def mk_chol():
        @jax.jit
        def f(s, a, b):
            x = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(perturb(a, s), lower=True), b)
            return jnp.sum(x[::256])
        return f, (spd, rhs)
    results.update([bench_phase(f"cho_factor+solve ({dof})", mk_chol, args.iters)])

    def mk_knn():
        @jax.jit
        def f(s, q, w_pos, w_act):
            fld = warpfield.WarpField(w_pos, warp.dq, warp.radius, w_act, warp.count)
            d2, idx = warpfield.knn(fld, perturb(q, s), cfg.knn_k, method=cfg.knn_method)
            return jnp.sum(d2[::512]) + idx[0, 0] * 0.0
        return f, (sol_inputs.p_can, warp.positions, warp.active)
    results.update([bench_phase(f"knn (P={sol_inputs.p_can.shape[0]})", mk_knn, args.iters)])

    # ---- phase 5: non-rigid fusion ----
    def mk_fuse():
        @jax.jit
        def f(s, tsdf, w, dists, w_pos, w_dq):
            fld = warpfield.WarpField(w_pos, w_dq, warp.radius, warp.active, warp.count)
            v = fusion.integrate_nonrigid(cfg, TsdfVolume(perturb(tsdf, s), w),
                                          fld, dists, se3.inverse(pose), cfg.intr)
            return jnp.sum(v.tsdf[::64, ::64, ::64].astype(jnp.float32))
        return f, (vol.tsdf, vol.weight, dists, warp.positions, warp.dq)
    results.update([bench_phase("nonrigid fusion", mk_fuse, args.iters)])

    # ---- phase 5b: rigid integrate (for comparison) ----
    def mk_int():
        @jax.jit
        def f(s, tsdf, w, dists):
            v = tsdf_ops.integrate(cfg, TsdfVolume(perturb(tsdf, s), w), dists,
                                   se3.compose(se3.inverse(pose), vp), cfg.intr)
            return jnp.sum(v.tsdf[::64, ::64, ::64].astype(jnp.float32))
        return f, (vol.tsdf, vol.weight, dists)
    results.update([bench_phase("rigid integrate", mk_int, args.iters)])

    # ---- phase 6: node insertion ----
    def mk_ins():
        @jax.jit
        def f(s, cand, w_pos, w_act, w_cnt):
            fld = warpfield.WarpField(w_pos, warp.dq, warp.radius, w_act, w_cnt)
            nf = warpfield.insert_nodes(cfg, fld, perturb(cand, s),
                                        ~jnp.isnan(cand[:, 0]))
            return nf.count.astype(jnp.float32)
        return f, (sol_inputs.p_can, warp.positions, warp.active, warp.count)
    results.update([bench_phase("node insertion", mk_ins, args.iters)])

    # ---- phase 7: model maps (raycast + warp + pyramid) ----
    def mk_mm():
        @jax.jit
        def f(s, tsdf, w, w_pos, w_dq):
            fld = warpfield.WarpField(w_pos, w_dq, warp.radius, warp.active, warp.count)
            (pp, pn), cp, cn = kinfu._model_maps(cfg, TsdfVolume(perturb(tsdf, s), w), fld, pose)
            return jnp.nansum(pp[0][::64, ::64])
        return f, (vol.tsdf, vol.weight, warp.positions, warp.dq)
    results.update([bench_phase("model maps (ray+warp+pyr)", mk_mm, args.iters)])

    total_pipeline = sum(v for k, v in results.items()
                         if k.split(" (")[0] in ("preprocess", "icp", "nonrigid fusion",
                                                 "node insertion")
                         or k.startswith("warp solve (LM iters=5)")
                         or k.startswith("model maps"))
    print(json.dumps({"phases_ms": {k: round(v, 1) for k, v in results.items()},
                      "approx_frame_ms": round(total_pipeline, 1)}))


if __name__ == "__main__":
    main()
