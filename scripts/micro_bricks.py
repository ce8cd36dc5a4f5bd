#!/usr/bin/env python3
"""Micro-benchmarks for the brick-sparse TSDF integrate design.

Measures, on the real TPU, the primitive costs the design rests on:
  1. dense baseline: 16.7M random image gathers (current integrate cost)
  2. brick row gather/scatter: K brick rows of 4096 from a (4096, 4096) pool
  3. full-volume brick transpose (256^3 -> (4096, 4096) and back)
  4. per-brick one-hot rect matmul depth lookup (the gather-free band path)
  5. direct random gather for K*4096 band voxels

Usage: python scripts/micro_bricks.py [--iters N]
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
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:46s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    D = 256
    B = 16
    NB = D // B          # 16 bricks/axis
    NBR = NB ** 3        # 4096 bricks
    BV = B ** 3          # 4096 voxels/brick
    H, W = 480, 640
    K_BAND = 1024
    K_FRONT = 2048
    RECT = 128

    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (D, D, D), jnp.float32)
    volb = jax.random.normal(key, (NBR, BV), jnp.float32)
    img = jax.random.uniform(jax.random.fold_in(key, 1), (H, W), jnp.float32) + 0.5
    band_ids = jax.random.randint(jax.random.fold_in(key, 2), (K_BAND,), 0, NBR)
    front_ids = jax.random.randint(jax.random.fold_in(key, 3), (K_FRONT,), 0, NBR)
    # random flat image indices for 16.7M voxels (dense baseline)
    flat_all = jax.random.randint(jax.random.fold_in(key, 4), (D, D, D), 0, H * W)
    flat_band = jax.random.randint(jax.random.fold_in(key, 5), (K_BAND, BV), 0, H * W)
    # per-brick rect origin + per-voxel in-rect indices
    v0 = jax.random.randint(jax.random.fold_in(key, 6), (K_BAND,), 0, H - RECT)
    u0 = jax.random.randint(jax.random.fold_in(key, 7), (K_BAND,), 0, W - RECT)
    ri = jax.random.randint(jax.random.fold_in(key, 8), (K_BAND, BV), 0, RECT)
    ci = jax.random.randint(jax.random.fold_in(key, 9), (K_BAND, BV), 0, RECT)

    print(f"device: {jax.devices()[0]}", flush=True)

    # 1. dense baseline
    def mk_dense():
        @jax.jit
        def f(s, img, flat):
            fl = jax.lax.optimization_barrier(flat)
            dp = jnp.take(img.reshape(-1), fl)
            dp = jax.lax.optimization_barrier(dp)
            return jnp.sum(dp[::64, ::64, ::64]) + perturb(img[0, 0], s) * 0
        return f, (img, flat_all)
    bench("dense 16.7M random image gathers", mk_dense, args.iters)

    # 2. brick row gather + scatter
    def mk_rows():
        @jax.jit
        def f(s, volb, ids):
            rows = jnp.take(volb, ids, axis=0)
            rows = rows * 1.0001 + perturb(s, s)
            out = volb.at[ids].set(rows, mode="drop")
            return out[0, 0] + jnp.sum(rows[::64, ::512])
        return f, (volb, band_ids)
    bench(f"row gather+update+scatter {K_BAND} bricks", mk_rows, args.iters)

    def mk_rows_front():
        @jax.jit
        def f(s, volb, ids):
            rows = jnp.take(volb, ids, axis=0)
            rows = rows * 1.0001 + perturb(s, s)
            out = volb.at[ids].set(rows, mode="drop")
            return out[0, 0] + jnp.sum(rows[::64, ::512])
        return f, (volb, front_ids)
    bench(f"row gather+update+scatter {K_FRONT} bricks", mk_rows_front, args.iters)

    # 3. brick transpose round trip
    def mk_tr():
        @jax.jit
        def f(s, vol):
            vb = vol.reshape(NB, B, NB, B, NB, B).transpose(0, 2, 4, 1, 3, 5).reshape(NBR, BV)
            vb = vb + perturb(s, s)
            back = vb.reshape(NB, NB, NB, B, B, B).transpose(0, 3, 1, 4, 2, 5).reshape(D, D, D)
            return back[0, 0, 0] + vb[0, 0]
        return f, (vol,)
    bench("brick transpose round trip 256^3", mk_tr, args.iters)

    # 4. per-brick one-hot rect matmul lookup (all matmul, no gathers)
    def mk_rect():
        @jax.jit
        def f(s, img, v0, u0, ri, ci):
            img = perturb(img, s)

            def per_brick(v0i, u0i, rii, cii):
                # row extraction: (RECT, H) one-hot @ (H, W) -> (RECT, W)
                rows_oh = (jax.lax.broadcasted_iota(jnp.int32, (RECT, H), 1)
                           == (v0i + jax.lax.broadcasted_iota(jnp.int32, (RECT, H), 0))
                           ).astype(jnp.float32)
                rect_rows = jnp.dot(rows_oh, img, preferred_element_type=jnp.float32)
                # column extraction: (RECT, W) @ (W, RECT) -> (RECT, RECT)
                cols_oh = (jax.lax.broadcasted_iota(jnp.int32, (W, RECT), 0)
                           == (u0i + jax.lax.broadcasted_iota(jnp.int32, (W, RECT), 1))
                           ).astype(jnp.float32)
                rect = jnp.dot(rect_rows, cols_oh, preferred_element_type=jnp.float32)
                # separable voxel lookup: T = RowSel @ rect; out = sum(T * ColSel)
                row_sel = (jax.lax.broadcasted_iota(jnp.int32, (BV, RECT), 1)
                           == rii[:, None]).astype(jnp.float32)
                col_sel = (jax.lax.broadcasted_iota(jnp.int32, (BV, RECT), 1)
                           == cii[:, None]).astype(jnp.float32)
                t = jnp.dot(row_sel, rect, preferred_element_type=jnp.float32)
                return jnp.sum(t * col_sel, axis=-1)

            dp = jax.lax.map(lambda t: jax.vmap(per_brick)(*t),
                             (v0.reshape(-1, 64), u0.reshape(-1, 64),
                              ri.reshape(-1, 64, BV), ci.reshape(-1, 64, BV)))
            return jnp.sum(dp[::8, ::8, ::512])
        return f, (img, v0, u0, ri, ci)
    bench(f"one-hot rect matmul lookup {K_BAND} bricks", mk_rect, args.iters)

    # 5. direct random gather for band voxels
    def mk_direct():
        @jax.jit
        def f(s, img, flat):
            img = perturb(img, s)
            fl = jax.lax.optimization_barrier(flat)
            dp = jnp.take(img.reshape(-1), fl)
            dp = jax.lax.optimization_barrier(dp)
            return jnp.sum(dp[::8, ::512])
        return f, (img, flat_band)
    bench(f"direct random gather {K_BAND}x{BV} band voxels", mk_direct, args.iters)

    # 5b. same but bf16 table
    def mk_direct16():
        @jax.jit
        def f(s, img, flat):
            img = perturb(img, s).astype(jnp.bfloat16)
            fl = jax.lax.optimization_barrier(flat)
            dp = jnp.take(img.reshape(-1), fl)
            dp = jax.lax.optimization_barrier(dp)
            return jnp.sum(dp[::8, ::512].astype(jnp.float32))
        return f, (img, flat_band)
    bench(f"direct random gather bf16 {K_BAND}x{BV}", mk_direct16, args.iters)


if __name__ == "__main__":
    main()
