"""Slab-local sharded raycast equivalence (parallel/sharded_raycast.py).

The sharded march runs FIXED steps on a globally aligned t-grid, so the
union of all slab segments samples exactly the points a single-device
fixed-step march samples — the comparison against
``raycast_adaptive_step=False`` is near-bitwise. Against the production
ADAPTIVE single-device march the difference is the bounded
adaptive-vs-fixed stepping semantics (fixed is strictly more
conservative); a small budget covers it."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.ops import preprocess, tsdf as tsdf_ops
from dynamicfusion_tpu.parallel import sharded, sharded_raycast

CFG = DynamicFusionConfig.small(dims=128, rows=96, cols=128)


def _volume():
    depth = synthetic.scene_depth(
        CFG.intr, CFG.rows, CFG.cols,
        spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.25),
                 dict(center=(0.2, 0.1, 0.8), radius=0.1)],
        plane_z=1.2,
    )
    dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
    vol_pose = se3.identity().at[:3, 3].set(jnp.asarray(CFG.volume_origin))
    vol = tsdf_ops.integrate(
        CFG, volume_model.create(CFG), dists, vol_pose, CFG.intr
    )
    return vol


def _cam2vol(pose):
    return se3.compose(
        se3.inverse(se3.identity().at[:3, 3].set(jnp.asarray(CFG.volume_origin))),
        pose,
    )


@pytest.mark.parametrize("refine", ["secant", "newton8"])
def test_sharded_matches_fixed_step_single_device(refine):
    cfg = dataclasses.replace(
        CFG, raycast_refine=refine, raycast_adaptive_step=False
    )
    vol = _volume()
    mesh = sharded.make_mesh(8)
    rc = sharded_raycast.make_sharded_raycast(cfg, mesh)

    # an oblique pose so rays cross slab boundaries in both x directions
    pose = se3.exp_twist(jnp.asarray([0.0, 0.25, 0.0, 0.12, 0.0, -0.05]))
    cam2vol = _cam2vol(pose)
    ref = tsdf_ops.raycast(cfg, vol, cam2vol, cfg.intr, cfg.rows, cfg.cols)
    vol_sh = jax.device_put(
        vol,
        jax.tree.map(lambda _: sharded.state_shardings(cfg, mesh).vol.tsdf, vol),
    )
    got = jax.jit(lambda v: rc(cfg, v, cam2vol, cfg.intr, cfg.rows, cfg.cols))(
        vol_sh
    )

    rp, gp = np.asarray(ref.points), np.asarray(got.points)
    rn, gn = np.asarray(ref.normals), np.asarray(got.normals)
    hit_r, hit_g = ~np.isnan(rp[..., 0]), ~np.isnan(gp[..., 0])
    assert hit_r.sum() > 2000
    assert (hit_r != hit_g).sum() == 0
    both = hit_r & hit_g
    d = np.linalg.norm(rp[both] - gp[both], axis=-1)
    assert d.max() < 1e-4, d.max()
    nd = np.linalg.norm(rn[both] - gn[both], axis=-1)
    assert np.quantile(nd, 0.999) < 1e-3


def test_sharded_close_to_adaptive_default():
    """Against the ADAPTIVE single-device march (the production default)
    only the bounded stepping-semantics difference remains: ~1% of
    (silhouette-class) rays may bracket differently."""
    cfg = dataclasses.replace(CFG, raycast_refine="secant")
    vol = _volume()
    mesh = sharded.make_mesh(8)
    rc = sharded_raycast.make_sharded_raycast(cfg, mesh)
    pose = se3.exp_twist(jnp.asarray([0.0, 0.25, 0.0, 0.12, 0.0, -0.05]))
    cam2vol = _cam2vol(pose)
    ref = tsdf_ops.raycast(cfg, vol, cam2vol, cfg.intr, cfg.rows, cfg.cols)
    got = rc(cfg, vol, cam2vol, cfg.intr, cfg.rows, cfg.cols)
    rp, gp = np.asarray(ref.points), np.asarray(got.points)
    hit_r, hit_g = ~np.isnan(rp[..., 0]), ~np.isnan(gp[..., 0])
    assert (hit_r != hit_g).mean() < 0.015
    both = hit_r & hit_g
    d = np.linalg.norm(rp[both] - gp[both], axis=-1)
    assert np.median(d) < 1e-5


def test_sharded_raycast_with_band():
    vol = _volume()
    cfg = dataclasses.replace(CFG, raycast_adaptive_step=False)
    mesh = sharded.make_mesh(8)
    rc = sharded_raycast.make_sharded_raycast(cfg, mesh)
    cam2vol = _cam2vol(se3.identity())
    lo = jnp.full((CFG.rows, CFG.cols), 0.4)
    hi = jnp.full((CFG.rows, CFG.cols), 1.4)
    ref = tsdf_ops.raycast(
        cfg, vol, cam2vol, cfg.intr, cfg.rows, cfg.cols, t_band=(lo, hi)
    )
    got = rc(cfg, vol, cam2vol, cfg.intr, cfg.rows, cfg.cols, t_band=(lo, hi))
    rp, gp = np.asarray(ref.points), np.asarray(got.points)
    hit_r, hit_g = ~np.isnan(rp[..., 0]), ~np.isnan(gp[..., 0])
    assert hit_r.sum() > 2000
    assert (hit_r != hit_g).sum() == 0
    both = hit_r & hit_g
    assert np.median(np.linalg.norm(rp[both] - gp[both], axis=-1)) < 1e-5
