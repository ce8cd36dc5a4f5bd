"""A frame whose rigid ICP failed must leave the model untouched.

The reference aborts the frame before any fusion on ICP degeneracy
(/root/reference/kfusion/src/kinfu.cpp:276-277 — estimateTransform fails ->
reset() and return). The TPU pipeline cannot abort inside jit; instead the
step gates fusion, node insertion, the warp-field update, and the pose on
``icp_ok`` (pipeline/kinfu.py step ---- 4b/5/6 ----) so a degenerate frame
carries the volume and warp field through bit-identical, and the host
driver keeps its explicit-reset contract (apps/demo.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu

# EXACTLY test_pipeline's config: the jitted step is memoized per config
# (kinfu._jitted_step), so sharing it saves this file a full pipeline
# compile in suite runs
from tests.test_pipeline import CFG
SPHERES = [dict(center=(0.0, 0.0, 0.95), radius=0.22), dict(center=(0.2, 0.1, 0.8), radius=0.1)]


def _depth(t=0.0):
    sp = [SPHERES[0], dict(center=(0.2 + 0.01 * t, 0.1, 0.8), radius=0.1)]
    return jnp.asarray(
        synthetic.scene_depth(CFG.intr, CFG.rows, CFG.cols, spheres=sp, plane_z=1.25)
    )


def _snapshot(state):
    return dict(
        tsdf=np.asarray(state.vol.tsdf),
        weight=np.asarray(state.vol.weight),
        positions=np.asarray(state.warp.positions),
        dq=np.asarray(state.warp.dq),
        active=np.asarray(state.warp.active),
        count=int(state.warp.count),
        pose=np.asarray(state.pose),
    )


def test_failed_frame_leaves_model_untouched():
    df = kinfu.DynamicFusion(CFG)
    df(_depth(0.0))
    for t in (1.0, 2.0):
        assert df(_depth(t))
    before = _snapshot(df.state)

    # degenerate frame: no depth at all -> every ICP row masked -> det(A)=0
    ok = df(jnp.zeros((CFG.rows, CFG.cols), jnp.uint16))
    assert not ok
    assert not bool(df.last_outputs.icp_ok)

    after = _snapshot(df.state)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)

    # the following good frame processes healthily against the intact model
    assert df(_depth(2.2))

    # ...and the degenerate frame was a TRUE no-op: an identical sequence
    # without it ends in the bit-identical state (the reference's frame
    # abort semantics, kinfu.cpp:276-277)
    ref = kinfu.DynamicFusion(CFG)
    for t in (0.0, 1.0, 2.0, 2.2):
        ref(_depth(t))
    a, b = _snapshot(df.state), _snapshot(ref.state)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_failed_frame_rigid_mode():
    cfg = dataclasses.replace(CFG, rigid_only=True)
    df = kinfu.DynamicFusion(cfg)
    d = _depth(0.0)
    df(d)
    assert df(d)
    before = _snapshot(df.state)

    ok = df(jnp.zeros((cfg.rows, cfg.cols), jnp.uint16))
    assert not ok
    after = _snapshot(df.state)
    np.testing.assert_array_equal(before["tsdf"], after["tsdf"])
    np.testing.assert_array_equal(before["weight"], after["weight"])
    np.testing.assert_array_equal(before["pose"], after["pose"])

    assert df(d)
