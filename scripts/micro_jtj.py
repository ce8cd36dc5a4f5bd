#!/usr/bin/env python3
"""Microbenchmark of JtJ assembly variants on TPU.

Decomposes the 40 ms `gn_system_dense` data-term assembly at bench shape
(P=19200, K=8, N=1024, rd=1) into its pieces and tests alternative
formulations of the one-hot row expansion:

  v0: current  — einsum("pkn,prkd->prnd", oh, jac)  (batched tiny matmul)
  v1: k-loop   — sum_k  onehot_k (P,N) outer jac_k (P,6)  (fused broadcast)
  v2: syrk only on a precomputed bf16 row matrix (the MXU floor)
  v3: expansion via iota-compare (no one_hot materialization) + syrk

Honest timing: outputs chained into inputs, scalar fetched at the end.
"""

import argparse
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
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return dt


def perturb(x, s):
    return jnp.where(s > jnp.asarray(1e30, s.dtype), x + jnp.ones((), x.dtype), x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=19200)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    P, N, K = args.p, args.n, args.k
    dof = 6 * N
    rng = np.random.default_rng(0)

    jac = jnp.asarray(rng.normal(size=(P, 1, K, 6)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(P, K)).astype(np.int32))
    rows_bf = jnp.asarray(rng.normal(size=(P, dof)).astype(np.float32)).astype(jnp.bfloat16)

    print(f"device: {jax.devices()[0]}  P={P} N={N} K={K} dof={dof}", flush=True)

    # v0: current formulation
    @jax.jit
    def v0(s, jac, idx):
        jac = perturb(jac, s)
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
        a = jnp.einsum("pkn,prkd->prnd", oh, jac.astype(jnp.bfloat16)).reshape(-1, dof)
        jtj = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
        return jnp.sum(jtj[::256, ::256])

    # v1: k-loop broadcast expansion + syrk
    @jax.jit
    def v1(s, jac, idx):
        jac = perturb(jac, s)
        jb = jac.astype(jnp.bfloat16).reshape(P, K, 6)
        iota = jnp.arange(N, dtype=jnp.int32)[None, :]
        a = jnp.zeros((P, N, 6), jnp.bfloat16)
        for k in range(K):
            ohk = (idx[:, k : k + 1] == iota).astype(jnp.bfloat16)  # (P, N)
            a = a + ohk[:, :, None] * jb[:, k, None, :]
        a = a.reshape(P, dof)
        jtj = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
        return jnp.sum(jtj[::256, ::256])

    # v2: syrk alone (floor)
    @jax.jit
    def v2(s, a):
        a = perturb(a, s)
        jtj = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
        return jnp.sum(jtj[::256, ::256])

    # v3: expansion alone (current einsum), no syrk
    @jax.jit
    def v3(s, jac, idx):
        jac = perturb(jac, s)
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
        a = jnp.einsum("pkn,prkd->prnd", oh, jac.astype(jnp.bfloat16)).reshape(-1, dof)
        return jnp.sum(a[::997, ::61].astype(jnp.float32))

    # v4: k-loop expansion alone
    @jax.jit
    def v4(s, jac, idx):
        jac = perturb(jac, s)
        jb = jac.astype(jnp.bfloat16).reshape(P, K, 6)
        iota = jnp.arange(N, dtype=jnp.int32)[None, :]
        a = jnp.zeros((P, N, 6), jnp.bfloat16)
        for k in range(K):
            ohk = (idx[:, k : k + 1] == iota).astype(jnp.bfloat16)
            a = a + ohk[:, :, None] * jb[:, k, None, :]
        return jnp.sum(a.reshape(P, dof)[::997, ::61].astype(jnp.float32))

    # v5: einsum with f32 accumulate of expansion via segment trick:
    #     one-hot over K*6 lanes: a[p, n*6+d] = sum_k oh[p,k,n]*jac[p,k,d]
    #     as ONE matmul: (P, K*6) @ (K*6, ...) is wrong shape; instead do
    #     scatter-free per-k einsum chain the compiler may fuse better.
    @jax.jit
    def v5(s, jac, idx):
        jac = perturb(jac, s)
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (P,K,N)
        jb = jac.astype(jnp.bfloat16).reshape(P, K, 6)
        a = jnp.einsum("pkn,pkd->pnd", oh, jb).reshape(P, dof)
        jtj = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
        return jnp.sum(jtj[::256, ::256])

    timeit("v0 current expansion+syrk", v0, (jac, idx))
    timeit("v1 k-loop expansion+syrk", v1, (jac, idx))
    timeit("v5 pnd-einsum expansion+syrk", v5, (jac, idx))
    timeit("v2 syrk alone (bf16 rows)", v2, (rows_bf,))
    timeit("v3 current expansion alone", v3, (jac, idx))
    timeit("v4 k-loop expansion alone", v4, (jac, idx))


if __name__ == "__main__":
    main()
