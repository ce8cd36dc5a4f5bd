#!/usr/bin/env python3
"""Time the warp solver's sub-stages on TPU at bench shape, using the real
SolveStructure (not synthetic matrices): data_system, edge_system,
gn_system_dense, pcg vs direct linear solve, cost_at.
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
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.solvers import warp_solver


def perturb(x, s):
    return jnp.where(s > jnp.asarray(1e30, s.dtype), x + jnp.ones((), x.dtype), x)


def timeit(name, f, args, iters=10):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=76800)
    ap.add_argument("--nodes", type=int, default=1024)
    args = ap.parse_args()

    cfg = dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(), max_nodes=args.nodes,
    )
    rng = np.random.default_rng(0)
    npts = args.p

    pos = rng.uniform(-0.4, 0.4, (args.nodes, 3)).astype(np.float32)
    field = warpfield.WarpField(
        positions=jnp.asarray(pos),
        dq=jnp.broadcast_to(jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32), (args.nodes, 8)),
        radius=jnp.full((args.nodes,), cfg.node_radius),
        active=jnp.ones((args.nodes,), bool),
        count=jnp.asarray(args.nodes, jnp.int32),
    )
    can = rng.uniform(-0.4, 0.4, (npts, 3)).astype(np.float32)
    nrm = rng.normal(size=(npts, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    inputs = warp_solver.WarpSolveInputs(
        p_can=jnp.asarray(can), n_can=jnp.asarray(nrm),
        p_live=jnp.asarray(can + 0.005), n_live=jnp.asarray(nrm),
    )
    p2pl = cfg.point_to_plane
    n_nodes = args.nodes

    s_struct = jax.jit(lambda i: warp_solver.prepare(cfg, field, i, p2pl))(inputs)
    print(f"device: {jax.devices()[0]}  P={npts} (solve P={s_struct.p_can.shape[0]}) "
          f"N={args.nodes}", flush=True)

    @jax.jit
    def f_data(s, dqs):
        jtj, jtr, _ = warp_solver.data_system(cfg, s_struct, perturb(dqs, s), n_nodes, p2pl)
        return jnp.sum(jtj[::256, ::256]) + jnp.sum(jtr[::97])

    @jax.jit
    def f_edge(s, dqs):
        jtj, jtr, _ = warp_solver.edge_system(cfg, s_struct, perturb(dqs, s), n_nodes)
        return jnp.sum(jtj[::256, ::256]) + jnp.sum(jtr[::97])

    @jax.jit
    def f_full(s, dqs):
        jtj, jtr, _ = warp_solver.gn_system_dense(cfg, s_struct, perturb(dqs, s), n_nodes, p2pl)
        return jnp.sum(jtj[::256, ::256]) + jnp.sum(jtr[::97])

    @jax.jit
    def f_rj(s, dqs):
        r, jac, _ = warp_solver.data_residual_and_jac(cfg, s_struct, perturb(dqs, s), p2pl)
        return jnp.sum(r[::512]) + jnp.sum(jac[::997])

    jtj0, jtr0, _ = jax.jit(
        lambda dqs: warp_solver.gn_system_dense(cfg, s_struct, dqs, n_nodes, p2pl)
    )(field.dq)
    jtj0 = jtj0 + 1e-3 * jnp.eye(6 * n_nodes)

    @jax.jit
    def f_pcg(s, a, b):
        x = warp_solver._pcg_solve(perturb(a, s), b, n_nodes,
                                   cfg.solver_linear_iters, cfg.solver_linear_tol)
        return jnp.sum(x[::97])

    @jax.jit
    def f_cho(s, a, b):
        import jax.scipy.linalg as jsl
        x = jsl.cho_solve(jsl.cho_factor(perturb(a, s), lower=True), b)
        return jnp.sum(x[::97])

    @jax.jit
    def f_cost(s, dqs):
        return warp_solver.cost_at(cfg, s_struct, perturb(dqs, s), p2pl)

    timeit("data residual+jacobian", f_rj, (field.dq,))
    timeit("data_system (JtJ+Jtr)", f_data, (field.dq,))
    timeit("edge_system (JtJ+Jtr)", f_edge, (field.dq,))
    timeit("gn_system_dense (both)", f_full, (field.dq,))
    timeit(f"pcg{cfg.solver_linear_iters}", f_pcg, (jtj0, jtr0))
    timeit("cholesky direct", f_cho, (jtj0, jtr0))
    timeit("cost_at", f_cost, (field.dq,))


if __name__ == "__main__":
    main()
