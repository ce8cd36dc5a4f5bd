"""Diagnostic: per-frame brick counts / solver costs on the bench sequence."""
import dataclasses, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import bench as benchmod
from dynamicfusion_tpu.pipeline import kinfu


class A: pass
args = A()
args.small = "--small" in sys.argv
args.dims, args.nodes, args.solver_iters, args.point_stride = 256, 1024, 5, 2
cfg = benchmod.build_cfg(args)
if "--dense" in sys.argv:
    cfg = dataclasses.replace(cfg, integrate_mode="dense")
if "--hs1" in sys.argv:
    cfg = dataclasses.replace(cfg, solver_hessian_stride=1)
df = kinfu.DynamicFusion(cfg)
seq = benchmod.frames(cfg, 10)
for i, d in enumerate(seq):
    df(d)
    o = df.last_outputs
    if o is None:
        print(f"frame {i}: init")
        continue
    band, wide, dropped = (int(x) for x in np.asarray(o.brick_counts))
    print(
        f"frame {i}: band={band} wide={wide} dropped={dropped} "
        f"cost0={float(o.solver_cost0):.4f} "
        f"cost1={float(o.solver_cost1):.4f} icp_ok={bool(o.icp_ok)} "
        f"nodes={int(o.node_count)}"
    )
