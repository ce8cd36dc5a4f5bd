"""TSDF golden tests on synthetic geometry (sphere / plane), the test layer
the reference lacks (SURVEY §4): integrate known depth, check the field,
raycast it back, check reconstructed geometry analytically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.core import se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.ops import preprocess, tsdf as tsdf_ops

CFG = DynamicFusionConfig.small(dims=64, rows=120, cols=160)
SPHERE_C = (0.0, 0.0, 1.0)
SPHERE_R = 0.25


def _vol2cam(pose_c2w):
    # camera_pose.inv() * volume_pose (tsdf_volume.cpp:112); volume pose is a
    # pure translation by volume_origin.
    vol_pose = se3.identity().at[:3, 3].set(jnp.asarray(CFG.volume_origin))
    return se3.compose(se3.inverse(pose_c2w), vol_pose)


def _cam2vol(pose_c2w):
    vol_pose = se3.identity().at[:3, 3].set(jnp.asarray(CFG.volume_origin))
    return se3.compose(se3.inverse(vol_pose), pose_c2w)


def _integrated_sphere():
    depth = synthetic.sphere_depth(CFG.intr, CFG.rows, CFG.cols, SPHERE_C, SPHERE_R)
    dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
    vol = volume_model.create(CFG)
    pose = se3.identity()
    vol = tsdf_ops.integrate(CFG, vol, dists, _vol2cam(pose), CFG.intr)
    return vol


def test_integrate_signs():
    vol = _integrated_sphere()
    t = np.asarray(volume_model.decode_tsdf(vol.tsdf))
    w = np.asarray(volume_model.decode_weight(vol.weight))
    d, vs = CFG.volume_dims, CFG.voxel_size
    org = np.asarray(CFG.volume_origin)

    def voxel_of(p):
        return tuple(np.round((np.asarray(p) - org) / vs).astype(int))

    # voxel in front of the sphere (between camera and surface): free space -> +1
    front = voxel_of((0.0, 0.0, SPHERE_C[2] - SPHERE_R - 0.03))
    assert t[front] > 0.5 and w[front] > 0

    # voxel just behind the front surface: negative
    behind = voxel_of((0.0, 0.0, SPHERE_C[2] - SPHERE_R + 0.02))
    assert t[behind] < 0.0 and w[behind] > 0

    # voxel deep inside the sphere: beyond truncation, never updated
    deep = voxel_of(SPHERE_C)
    assert w[deep] == 0

    # off-axis voxel in observed free space (its ray still hits the sphere)
    side = voxel_of((0.1, 0.0, 0.6))
    assert t[side] > 0.9
    # voxel whose ray misses the sphere entirely: depth 0 = unobserved
    miss = voxel_of((0.25, 0.0, 0.6))
    assert w[miss] == 0


def test_integrate_weight_accumulates():
    depth = synthetic.sphere_depth(CFG.intr, CFG.rows, CFG.cols, SPHERE_C, SPHERE_R)
    dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
    vol = volume_model.create(CFG)
    pose = se3.identity()
    for _ in range(3):
        vol = tsdf_ops.integrate(CFG, vol, dists, _vol2cam(pose), CFG.intr)
    assert float(volume_model.decode_weight(vol.weight).max()) == 3.0
    # same observation three times: average unchanged vs single shot
    vol1 = _integrated_sphere()
    np.testing.assert_allclose(
        np.asarray(vol.tsdf), np.asarray(vol1.tsdf), atol=1e-5
    )


def test_raycast_sphere_geometry():
    vol = _integrated_sphere()
    pose = se3.identity()
    res = tsdf_ops.raycast(CFG, vol, _cam2vol(pose), CFG.intr, CFG.rows, CFG.cols)
    pts = np.asarray(res.points)
    nrm = np.asarray(res.normals)
    valid = ~np.isnan(pts[..., 0])
    assert valid.sum() > 500  # sphere covers a good chunk of the frame

    # every recovered point lies on the sphere within ~1.2 voxels
    c = np.asarray(SPHERE_C)
    r_err = np.abs(np.linalg.norm(pts[valid] - c, axis=-1) - SPHERE_R)
    assert np.median(r_err) < CFG.voxel_size
    assert np.percentile(r_err, 95) < 3 * CFG.voxel_size

    # normals point outward from the sphere center (toward the camera side)
    outward = (pts[valid] - c) / np.linalg.norm(pts[valid] - c, axis=-1, keepdims=True)
    cos = np.sum(nrm[valid] * outward, axis=-1)
    assert np.median(cos) > 0.95

    # center pixel depth == front pole of the sphere
    cy, cx = int(CFG.intr.cy), int(CFG.intr.cx)
    assert pts[cy, cx, 2] == pytest.approx(SPHERE_C[2] - SPHERE_R, abs=2 * CFG.voxel_size)


@pytest.mark.parametrize("refine", ["newton8", "newton16"])
def test_raycast_newton_refines(refine):
    """The experimental Newton refine variants (8/16 gathers vs the
    secant's 24) recover the sphere to the same tolerance AWAY from
    grazing incidence. Their known failure mode — crossing bias where the
    local along-ray gradient vanishes (grazing rays) — is why the default
    stays "secant" (see config.raycast_refine); this test pins the
    non-grazing behavior so the options stay usable."""
    import dataclasses

    vol = _integrated_sphere()
    cfg = dataclasses.replace(CFG, raycast_refine=refine)
    res = tsdf_ops.raycast(cfg, vol, _cam2vol(se3.identity()), cfg.intr, cfg.rows, cfg.cols)
    pts = np.asarray(res.points)
    valid = ~np.isnan(pts[..., 0])
    assert valid.sum() > 500
    c = np.asarray(SPHERE_C)
    rel = pts[valid] - c
    rr = np.linalg.norm(rel, axis=-1)
    # non-grazing: |cos| between outward normal (radial) and view ray
    vdir = pts[valid] / np.maximum(np.linalg.norm(pts[valid], axis=-1, keepdims=True), 1e-9)
    cos_inc = np.abs(np.sum(vdir * rel / np.maximum(rr[:, None], 1e-9), axis=-1))
    frontal = cos_inc > 0.5
    r_err = np.abs(rr - SPHERE_R)
    assert np.median(r_err[frontal]) < CFG.voxel_size
    assert np.percentile(r_err[frontal], 95) < 3 * CFG.voxel_size


def test_raycast_from_moved_camera():
    # integrate from identity, raycast from a slightly rotated pose: the
    # returned points are in the *new camera's* frame.
    vol = _integrated_sphere()
    pose2 = jnp.asarray(synthetic.orbit_pose(0.15, target=SPHERE_C))
    res = tsdf_ops.raycast(CFG, vol, _cam2vol(pose2), CFG.intr, CFG.rows, CFG.cols)
    pts_cam = np.asarray(res.points)
    valid = ~np.isnan(pts_cam[..., 0])
    assert valid.sum() > 300
    # transform back to world: should lie on the sphere
    pts_w = np.asarray(se3.transform_points(pose2, jnp.asarray(pts_cam[valid])))
    r_err = np.abs(np.linalg.norm(pts_w - np.asarray(SPHERE_C), axis=-1) - SPHERE_R)
    assert np.median(r_err) < 1.5 * CFG.voxel_size


def test_extract_cloud_on_sphere():
    vol = _integrated_sphere()
    cloud = tsdf_ops.extract_cloud(CFG, vol, max_points=8192)
    assert int(cloud.count) > 300
    pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    r_err = np.abs(np.linalg.norm(pts - np.asarray(SPHERE_C), axis=-1) - SPHERE_R)
    assert np.median(r_err) < CFG.voxel_size

    nrm = np.asarray(tsdf_ops.extract_normals(CFG, vol, jnp.asarray(pts)))
    outward = (pts - np.asarray(SPHERE_C)) / np.linalg.norm(
        pts - np.asarray(SPHERE_C), axis=-1, keepdims=True
    )
    cos = np.abs(np.sum(nrm * outward, axis=-1))
    assert np.median(cos) > 0.9


def test_empty_volume_raycast_all_invalid():
    vol = volume_model.create(CFG)
    res = tsdf_ops.raycast(CFG, vol, _cam2vol(se3.identity()), CFG.intr, CFG.rows, CFG.cols)
    assert np.isnan(np.asarray(res.points)).all()


def test_interpolate_matches_manual():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(8, 8, 8).astype(np.float32))
    p = jnp.array([[2.25, 3.5, 4.75]])
    out = float(tsdf_ops.interpolate(vol, p)[0])
    v = np.asarray(vol)
    a, b, c = 0.25, 0.5, 0.75
    manual = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wgt = (a if dx else 1 - a) * (b if dy else 1 - b) * (c if dz else 1 - c)
                manual += v[2 + dx, 3 + dy, 4 + dz] * wgt
    assert out == pytest.approx(manual, abs=1e-6)


def test_interpolate_oob_nan():
    vol = jnp.zeros((8, 8, 8))
    assert np.isnan(float(tsdf_ops.interpolate(vol, jnp.array([[7.5, 1.0, 1.0]]))[0]))
    assert np.isnan(float(tsdf_ops.interpolate(vol, jnp.array([[-0.5, 1.0, 1.0]]))[0]))
