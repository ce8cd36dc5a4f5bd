"""Diagnostic: brick-class counts at the full bench workload."""
import dataclasses, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.ops import bricks, preprocess

cfg = DynamicFusionConfig.default_dynamicfusion()

scenes = {
    "bench": synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols,
        spheres=[dict(center=(0.0, 0.0, 0.95), radius=0.22),
                 dict(center=(0.2, 0.1, 0.8), radius=0.1)],
        plane_z=1.25,
    ),
}
sph = synthetic.deforming_sphere_depth(
    cfg.intr, cfg.rows, cfg.cols, t=0.0, center=(0.0, 0.0, 0.9),
    radius=0.25, amp=0.04)
bg = synthetic.scene_depth(
    cfg.intr, cfg.rows, cfg.cols,
    spheres=[dict(center=(0.32, -0.18, 1.0), radius=0.1)], plane_z=1.3)
scenes["quality"] = np.where((sph > 0) & ((bg == 0) | (sph < bg)), sph, bg)

d, g = cfg.volume_dims, cfg.brick_size
gp = d // g + 1
vp = se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))
vol2cam = se3.compose(se3.inverse(se3.identity()), vp)
ax = jnp.arange(gp, dtype=jnp.float32) * (g * cfg.voxel_size)
rr, tt = vol2cam[:3, :3], vol2cam[:3, 3]
i, j, k = ax[:, None, None], ax[None, :, None], ax[None, None, :]
cam_grid = jnp.stack(
    [rr[a, 0] * i + rr[a, 1] * j + rr[a, 2] * k + tt[a] for a in range(3)],
    axis=-1)

for name, depth in scenes.items():
    dists = preprocess.compute_dists(cfg.intr, jnp.asarray(depth))
    skip, front, band, wide = jax.tree.map(
        int, bricks.brick_counts(cfg, d, cam_grid, g, dists, cfg.intr))
    print(f"{name}: skip={skip} front={front} band={band} wide={wide} "
          f"(caps: band={cfg.integrate_band_cap} wide={cfg.integrate_wide_cap})")
