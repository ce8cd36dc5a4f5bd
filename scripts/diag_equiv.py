"""Diagnostic: brick vs dense integrate equivalence at FULL scale (256^3,
640x480) — the unit test only covers 64^3/160x120."""
import dataclasses, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import bench as benchmod
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.ops import preprocess, tsdf as tsdf_ops


class A: pass
args = A()
args.small = False
args.dims, args.nodes, args.solver_iters, args.point_stride = 256, 1024, 5, 2
cfg = benchmod.build_cfg(args)
dense_cfg = dataclasses.replace(cfg, integrate_mode="dense")

depth = benchmod.frames(cfg, 1)[0]
dists = preprocess.compute_dists(cfg.intr, depth)
vp = se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))
vol2cam = se3.compose(se3.inverse(se3.identity()), vp)
vol0 = volume_model.create(cfg)

vd = jax.jit(lambda v, d: tsdf_ops.integrate(dense_cfg, v, d, vol2cam, cfg.intr))(vol0, dists)
vb, counts = jax.jit(
    lambda v, d: tsdf_ops.integrate(cfg, v, d, vol2cam, cfg.intr, with_counts=True)
)(vol0, dists)

td, wd = np.asarray(vd.tsdf, np.float32), np.asarray(vd.weight, np.float32)
tb, wb = np.asarray(vb.tsdf, np.float32), np.asarray(vb.weight, np.float32)
wm = wd != wb
tm = np.abs(td - tb) > 1e-4
print("counts (band, wide):", np.asarray(counts))
print(f"weight mismatches: {wm.sum()} / {wm.size}")
print(f"tsdf mismatches:   {tm.sum()}  max|dt|={np.abs(td-tb).max():.4f}")
if wm.any():
    idx = np.argwhere(wm)
    print("first mismatched voxels (i,j,k):", idx[:8].tolist())
    b = cfg.brick_size
    bids = (idx[:, 0] // b, idx[:, 1] // b, idx[:, 2] // b)
    ub = np.unique(np.stack(bids, -1), axis=0)
    print(f"mismatched bricks: {len(ub)}; first: {ub[:10].tolist()}")
    # which class did those bricks get?
    import math
    from dynamicfusion_tpu.ops import bricks as B
    d, g = cfg.volume_dims, cfg.brick_size
    gp = d // g + 1
    ax = jnp.arange(gp, dtype=jnp.float32) * (g * cfg.voxel_size)
    rr, tt = vol2cam[:3, :3], vol2cam[:3, 3]
    i, j, k = ax[:, None, None], ax[None, :, None], ax[None, None, :]
    cam_grid = jnp.stack(
        [rr[a, 0] * i + rr[a, 1] * j + rr[a, 2] * k + tt[a] for a in range(3)], axis=-1)
    rows, cols = dists.shape
    rect = min(cfg.integrate_rect, 1 << int(math.log2(min(rows, cols))))
    levels = int(math.ceil(math.log2(max(rows, cols)))) + 1
    pyr = B.build_depth_pyramid(dists, levels)
    bc = B.classify(cfg, cam_grid, g, pyr, cfg.intr, rows, cols, rect)
    cls = np.asarray(bc.cls).reshape(d // g, d // g, d // g)
    names = ["SKIP", "FRONT", "BAND", "WIDE"]
    from collections import Counter
    print("classes of mismatched bricks:",
          Counter(names[cls[tuple(u)]] for u in ub))
