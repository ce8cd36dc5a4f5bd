import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.solvers import warp_solver as ws

cfg = DynamicFusionConfig()
n = cfg.max_nodes
key = jax.random.PRNGKey(0)
P = 12800
field = warpfield.create(cfg)
pos = jax.random.uniform(key, (n, 3), minval=-0.4, maxval=0.4)
field = field._replace(positions=pos, active=jnp.ones((n,), bool),
                       count=jnp.asarray(n, jnp.int32))
pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3), minval=-0.4, maxval=0.4)
inputs = ws.WarpSolveInputs(pts, pts, pts + 0.01, pts * 0 + jnp.array([0., 0., 1.]))
prep = jax.jit(lambda f, i: ws.prepare(cfg, f, i, True))
s = jax.block_until_ready(prep(field, inputs))

def bench(name, f, *args):
    t = jnp.zeros(())
    out = None
    @jax.jit
    def g(t, *a):
        jtj, jtr = f(*a)
        return jnp.sum(jtj)*1e-9 + jnp.sum(jtr)*1e-9 + t*0.0
    t = g(t, *args); t.block_until_ready()
    t0 = time.perf_counter(); N = 10
    for _ in range(N):
        t = g(t, *args)
    float(t)
    print(f"{name:24s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

dqs = field.dq
bench("data_system", lambda s_, d_: ws.data_system(cfg, s_, d_, n, True)[:2], s, dqs)
bench("edge_system", lambda s_, d_: ws.edge_system(cfg, s_, d_, n)[:2], s, dqs)
bench("gn_system_dense", lambda s_, d_: ws.gn_system_dense(cfg, s_, d_, n, True)[:2], s, dqs)
