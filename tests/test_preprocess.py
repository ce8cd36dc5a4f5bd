import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.ops import preprocess


INTR = Intrinsics(100.0, 100.0, 8.0, 6.0)


def _flat_depth(h=12, w=16, mm=1000):
    return jnp.full((h, w), mm, dtype=jnp.uint16)


def test_bilateral_flat_is_identity():
    d = _flat_depth()
    out = preprocess.bilateral_filter(d)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(d))


def test_bilateral_preserves_step_edge():
    # two flat regions 1 m / 2 m: the 40 mm sigma must not blur across the
    # 1000 mm discontinuity.
    d = np.full((12, 16), 1000, np.uint16)
    d[:, 8:] = 2000
    out = np.asarray(preprocess.bilateral_filter(jnp.asarray(d)))
    np.testing.assert_array_equal(out, d)


def test_bilateral_smooths_noise():
    rng = np.random.RandomState(0)
    d = (1000 + rng.randint(-20, 20, (24, 32))).astype(np.uint16)
    out = np.asarray(preprocess.bilateral_filter(jnp.asarray(d))).astype(np.float32)
    assert out.std() < d.astype(np.float32).std()


def test_truncate_depth():
    d = jnp.asarray(np.array([[500, 1500, 2500]], np.uint16))
    out = preprocess.truncate_depth(d, 2.0)
    np.testing.assert_array_equal(np.asarray(out), [[500, 1500, 0]])


def test_pyramid_down_flat():
    d = _flat_depth(12, 16)
    out = preprocess.depth_pyramid_down(d)
    assert out.shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(out), np.full((6, 8), 1000, np.uint16))


def test_pyramid_down_rejects_outliers():
    # a pixel 1 m in front of its neighbourhood must not bleed into the average
    d = np.full((8, 8), 1000, np.uint16)
    d[0, 0] = 2000
    out = np.asarray(preprocess.depth_pyramid_down(jnp.asarray(d)))
    assert out[1, 1] == 1000  # window not containing (0,0)... and
    assert out[0, 0] == 2000  # center IS the outlier -> only it survives its own band


def test_points_normals_plane():
    # fronto-parallel plane at 2 m: all normals must be (0, 0, -1) (pointing
    # at the camera), points on the z=2 plane.
    d = _flat_depth(12, 16, 2000)
    pts, nrm = preprocess.compute_points_normals(INTR, d)
    valid = ~np.isnan(np.asarray(pts[..., 0]))
    assert valid[:11, :15].all() and not valid[-1, :].any() and not valid[:, -1].any()
    np.testing.assert_allclose(np.asarray(pts[..., 2])[valid], 2.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nrm)[valid], np.broadcast_to([0.0, 0.0, -1.0], (valid.sum(), 3)), atol=1e-5
    )


def test_points_normals_zero_depth_invalid():
    d = np.full((8, 8), 1500, np.uint16)
    d[3, 3] = 0
    pts, _ = preprocess.compute_points_normals(INTR, jnp.asarray(d))
    p = np.asarray(pts)
    assert np.isnan(p[3, 3, 0])
    # neighbors whose forward difference uses (3,3) are invalid too
    assert np.isnan(p[3, 2, 0]) and np.isnan(p[2, 3, 0])
    assert not np.isnan(p[0, 0, 0])


def test_compute_dists_center_vs_corner():
    d = _flat_depth(12, 16, 1000)
    dists = np.asarray(preprocess.compute_dists(INTR, d))
    # principal point: ray norm 1 -> exactly 1 m
    assert abs(dists[6, 8] - 1.0) < 1e-6
    # corners: longer ray
    assert dists[0, 0] > 1.0


def test_resize_points_normals():
    d = _flat_depth(12, 16, 2000)
    pts, nrm = preprocess.compute_points_normals(INTR, d)
    p2, n2 = preprocess.resize_points_normals(pts, nrm)
    assert p2.shape == (6, 8, 3)
    v = ~np.isnan(np.asarray(p2[..., 0]))
    # blocks touching the invalid last row/col are invalid
    assert v[:5, :7].all() and not v[-1, :].any()
    np.testing.assert_allclose(np.asarray(p2[..., 2])[v], 2.0, atol=1e-6)


def test_build_frame_pyramid_shapes():
    cfg = DynamicFusionConfig.small()
    d = jnp.full((cfg.rows, cfg.cols), 1200, dtype=jnp.uint16)
    depth_pyr, pts_pyr, nrm_pyr, dists = preprocess.build_frame_pyramid(cfg, d)
    assert len(depth_pyr) == cfg.pyramid_levels
    assert depth_pyr[1].shape == (cfg.rows // 2, cfg.cols // 2)
    assert pts_pyr[3].shape == (cfg.rows // 8, cfg.cols // 8, 3)
    assert dists.shape == (cfg.rows, cfg.cols)
    assert not np.isnan(np.asarray(pts_pyr[0][5, 5])).any()
