"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
distributed layer the reference doesn't have (SURVEY §2.a)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu
from dynamicfusion_tpu.parallel import sharded

CFG = dataclasses.replace(
    DynamicFusionConfig(
        rows=32,
        cols=64,
        volume_dims=32,
        max_nodes=32,
        node_sample_step=5,
        solver_nonlinear_iters=2,
    ),
    intr=dataclasses.replace(
        DynamicFusionConfig().intr, fx=57.0, fy=57.0, cx=32.0, cy=16.0
    ),
)


def _depth():
    return jnp.asarray(
        synthetic.scene_depth(
            CFG.intr, CFG.rows, CFG.cols,
            spheres=[dict(center=(0.0, 0.0, 0.8), radius=0.2)], plane_z=1.1,
        )
    )


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return sharded.make_mesh(8)


@pytest.fixture(scope="module")
def sharded_fns(mesh):
    """ONE compile of the sharded first/step pair for the whole module —
    each make_sharded_* call creates a fresh jit (fresh SPMD compile),
    which doubled this module's wall time."""
    return (
        sharded.make_sharded_first_frame(CFG, mesh),
        sharded.make_sharded_step(CFG, mesh),
    )


def test_sharded_state_placement(mesh):
    state = sharded.shard_state(CFG, mesh, kinfu.init_state(CFG))
    # volume is split along x across 8 devices
    shard_shapes = {s.data.shape for s in state.vol.tsdf.addressable_shards}
    assert shard_shapes == {(CFG.volume_dims // 8, CFG.volume_dims, CFG.volume_dims)}
    # warp field replicated
    assert len({s.device for s in state.warp.positions.addressable_shards}) == 8


def test_sharded_step_matches_single_device(mesh, sharded_fns):
    depth = _depth()

    # single-device reference run
    df = kinfu.DynamicFusion(CFG)
    df(depth)
    df(depth)
    ref_pose = np.asarray(df.get_pose())
    ref_tsdf = np.asarray(df.state.vol.tsdf)

    # sharded run
    state = sharded.shard_state(CFG, mesh, kinfu.init_state(CFG))
    first, step = sharded_fns
    state = first(state, depth)
    state, out = step(state, depth)

    np.testing.assert_allclose(np.asarray(out.pose), ref_pose, atol=1e-4)
    # Behavioral volume oracle, not bitwise (same rationale as
    # scripts/scaling_check.py): the warp solve's accept/reject compares
    # psum'd f32 costs whose shard summation ORDER differs from the
    # single-device reduction, so one LM accept can flip and fuse a thin
    # band of voxels through a slightly different field. Require the
    # volumes to agree essentially everywhere, with a small budget of
    # band voxels allowed to differ.
    tsdf_sharded = np.asarray(state.vol.tsdf)
    diff = np.abs(tsdf_sharded - ref_tsdf)
    frac_off = float(np.mean(diff > 1e-3))
    assert frac_off < 0.01, f"{frac_off:.4%} voxels differ > 1e-3"
    assert float(np.median(diff)) < 1e-5


def test_sharded_multi_frame_stability(mesh, sharded_fns):
    state = sharded.shard_state(CFG, mesh, kinfu.init_state(CFG))
    first, step = sharded_fns
    state = first(state, _depth())
    for _ in range(3):
        state, out = step(state, _depth())
    assert bool(out.icp_ok)
    assert np.isfinite(np.asarray(out.pose)).all()
    assert int(state.frame_idx) == 4
