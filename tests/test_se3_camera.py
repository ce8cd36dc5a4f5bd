import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import Intrinsics
from dynamicfusion_tpu.core import camera, se3


def test_inverse():
    rng = np.random.RandomState(0)
    r = se3.rodrigues(jnp.asarray(rng.randn(3).astype(np.float32)))
    m = se3.from_rot_trans(r, jnp.asarray(rng.randn(3).astype(np.float32)))
    np.testing.assert_allclose(
        np.asarray(se3.compose(m, se3.inverse(m))), np.eye(4), atol=1e-5
    )


def test_rodrigues_small_angle():
    m = se3.rodrigues(jnp.array([1e-10, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_rodrigues_quarter_turn():
    m = se3.rodrigues(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(m @ jnp.array([1.0, 0.0, 0.0])), [0.0, 1.0, 0.0], atol=1e-6
    )


def test_exp_twist_transform():
    xi = jnp.array([0.0, 0.0, 0.0, 0.1, 0.2, 0.3])
    m = se3.exp_twist(xi)
    p = jnp.array([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(se3.transform_points(m, p)), [[1.1, 1.2, 1.3]], atol=1e-6
    )


def test_project_backproject_roundtrip():
    intr = Intrinsics(570.342, 570.342, 320.0, 240.0)
    rng = np.random.RandomState(1)
    p = jnp.asarray(np.abs(rng.randn(100, 3)).astype(np.float32) + 0.5)
    uv = camera.project(intr, p)
    back = camera.backproject(intr, uv[..., 0], uv[..., 1], p[..., 2])
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-5, atol=1e-5)


def test_intrinsics_level():
    intr = Intrinsics(570.342, 570.342, 320.0, 240.0)
    l2 = intr.level(2)
    assert l2.fx == intr.fx / 4 and l2.cx == intr.cx / 4


def test_depth_to_points_center_pixel():
    intr = Intrinsics(100.0, 100.0, 2.0, 1.5)
    depth = jnp.full((4, 4), 2.0)
    pts = camera.depth_to_points(intr, depth)
    # pixel (u=2, v=1.5) is the principal point -> x=0; check pixel (2, 1): v-cy=-0.5
    np.testing.assert_allclose(np.asarray(pts[1, 2]), [0.0, -0.01, 2.0], atol=1e-6)


def test_ray_norms_center():
    intr = Intrinsics(100.0, 100.0, 2.0, 2.0)
    rn = camera.ray_norms(intr, 5, 5)
    assert float(rn[2, 2]) == 1.0
    assert float(rn[0, 0]) > 1.0
