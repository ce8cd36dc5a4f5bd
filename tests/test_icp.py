"""Rigid ICP recovery tests on synthetic geometry (no such tests exist in
the reference; the scenarios mirror its runtime use: frame-to-model
tracking with small inter-frame motion)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.ops import preprocess
from dynamicfusion_tpu.solvers import icp

CFG = DynamicFusionConfig.small(dims=64, rows=120, cols=160)
# non-spherical scene (two spheres) so all 6 dof are observable
S1 = dict(center=(0.0, 0.0, 0.9), radius=0.22)
S2 = dict(center=(0.18, 0.12, 0.75), radius=0.1)


def _render(pose_c2w):
    d = synthetic.scene_depth(
        CFG.intr, CFG.rows, CFG.cols, pose_c2w, spheres=[S1, S2], plane_z=1.25
    )
    return jnp.asarray(d)


def _pyramids(depth):
    _, pts, nrm, _ = preprocess.build_frame_pyramid(CFG, depth)
    return pts, nrm


def _run(pose_curr):
    prev_pts, prev_nrm = _pyramids(_render(np.eye(4, dtype=np.float32)))
    curr_pts, curr_nrm = _pyramids(_render(pose_curr))
    return icp.estimate_transform(CFG, curr_pts, curr_nrm, prev_pts, prev_nrm)


def _check(pose_curr, tol_t=0.004, tol_r=0.01):
    res = _run(pose_curr)
    assert bool(res.ok)
    est = np.asarray(res.transform)
    # ICP returns current-camera -> previous-camera; previous camera is the
    # world frame here, so est should equal pose_curr (cam2world).
    gt = np.asarray(pose_curr)
    t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
    r_err = np.linalg.norm(est[:3, :3] - gt[:3, :3])
    assert t_err < tol_t, (t_err, est, gt)
    assert r_err < tol_r, (r_err, est, gt)


def test_identity_motion():
    _check(np.eye(4, dtype=np.float32), tol_t=1e-3, tol_r=1e-3)


def test_small_translation():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.008, 0.012]
    _check(pose)


def test_small_rotation():
    pose = np.eye(4, dtype=np.float32)
    r = np.asarray(se3.rodrigues(jnp.array([0.0, 0.02, 0.0])))
    pose[:3, :3] = r
    _check(pose)


def test_combined_motion():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(se3.rodrigues(jnp.array([0.01, -0.015, 0.008])))
    pose[:3, 3] = [0.008, 0.005, -0.01]
    _check(pose)


def test_singular_coarse_level_recovers():
    """A degenerate COARSE level (all-NaN maps -> singular 6x6 every
    iteration) must not poison ok when the finer levels track fine: ok
    reflects the finest executed level's final health, and the pose still
    converges. (The reference hard-resets the whole reconstruction on any
    degenerate iteration, projective_icp.cpp:197-203 + kinfu.cpp:276-277.)"""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.006, -0.004, 0.008]
    prev_pts, prev_nrm = _pyramids(_render(np.eye(4, dtype=np.float32)))
    curr_pts, curr_nrm = _pyramids(_render(pose))
    # poison the coarsest level that actually iterates (icp_iters fine->
    # coarse = (10,5,4,0): level 2 is the coarsest with iters > 0)
    kill = 2
    prev_pts = list(prev_pts)
    prev_nrm = list(prev_nrm)
    prev_pts[kill] = jnp.full_like(prev_pts[kill], jnp.nan)
    prev_nrm[kill] = jnp.full_like(prev_nrm[kill], jnp.nan)
    res = icp.estimate_transform(CFG, list(curr_pts), list(curr_nrm), prev_pts, prev_nrm)
    assert bool(res.ok)
    est = np.asarray(res.transform)
    assert np.linalg.norm(est[:3, 3] - pose[:3, 3]) < 0.004, est


def test_degenerate_finest_level_flags_failure():
    """Conversely: a degenerate FINEST level must flag failure even when
    coarser levels were healthy."""
    pose = np.eye(4, dtype=np.float32)
    prev_pts, prev_nrm = _pyramids(_render(np.eye(4, dtype=np.float32)))
    curr_pts, curr_nrm = _pyramids(_render(pose))
    prev_pts = list(prev_pts)
    prev_nrm = list(prev_nrm)
    prev_pts[0] = jnp.full_like(prev_pts[0], jnp.nan)
    prev_nrm[0] = jnp.full_like(prev_nrm[0], jnp.nan)
    res = icp.estimate_transform(CFG, list(curr_pts), list(curr_nrm), prev_pts, prev_nrm)
    assert not bool(res.ok)


def test_degenerate_input_flags_failure():
    # all-invalid frames: the 6x6 system is singular -> ok must be False and
    # the transform must stay finite (identity).
    nanp = jnp.full((CFG.rows, CFG.cols, 3), jnp.nan)
    pyr_p = [nanp[:: 2 ** l, :: 2 ** l] for l in range(4)]
    res = icp.estimate_transform(CFG, pyr_p, pyr_p, pyr_p, pyr_p)
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-6)


def test_depth_variant_tracks_motion():
    """The USE_DEPTH variant (frame-to-frame, targets reconstructed from
    the previous DEPTH pyramid) recovers a small camera translation like
    the points variant does against model maps."""
    import dataclasses

    from dynamicfusion_tpu.io import synthetic
    from dynamicfusion_tpu.ops import preprocess

    cfg = DynamicFusionConfig.small(dims=64, rows=120, cols=160)
    scene = dict(
        spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.2),
                 dict(center=(0.25, 0.1, 1.0), radius=0.08)],
        plane_z=1.25,
    )
    pose0 = np.eye(4)
    pose1 = np.eye(4)
    pose1[:3, 3] = [0.004, -0.003, 0.005]
    d_prev = synthetic.scene_depth(cfg.intr, cfg.rows, cfg.cols, pose0, **scene)
    d_curr = synthetic.scene_depth(cfg.intr, cfg.rows, cfg.cols, pose1, **scene)

    dp_prev, _, nrm_prev, _ = preprocess.build_frame_pyramid(cfg, jnp.asarray(d_prev))
    dp_curr, _, nrm_curr, _ = preprocess.build_frame_pyramid(cfg, jnp.asarray(d_curr))

    res = jax.jit(
        lambda a, b, c, d: icp.estimate_transform_depth(cfg, list(a), list(b), list(c), list(d))
    )(tuple(dp_curr), tuple(nrm_curr), tuple(dp_prev), tuple(nrm_prev))
    assert bool(res.ok)
    t = np.asarray(res.transform)
    # transform maps current camera frame -> previous: the camera moved by
    # +delta, so points move by -delta... verify by transforming a current-
    # frame point and checking it lands on the previous-frame ray geometry:
    # for a pure translation, t's translation should be ~ +delta (current
    # camera origin expressed in the previous frame).
    np.testing.assert_allclose(t[:3, 3], pose1[:3, 3], atol=2e-3)
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=5e-3)
