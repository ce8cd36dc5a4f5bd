"""SE(3) rigid transforms as (4, 4) homogeneous matrices.

Replaces the reference's use of ``cv::Affine3f`` (pose chain in
/root/reference/kfusion/src/kinfu.cpp:280, ICP increment construction
``Affine3f(rvec, tvec)`` in /root/reference/kfusion/src/projective_icp.cpp:208)
with jnp matrix ops. Points are (..., 3); transforms broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def from_rot_trans(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    m = jnp.eye(4, dtype=r.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def rotation(m: jnp.ndarray) -> jnp.ndarray:
    return m[..., :3, :3]


def translation(m: jnp.ndarray) -> jnp.ndarray:
    return m[..., :3, 3]


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a ∘ b (apply b first)."""
    return a @ b


def inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Fast rigid inverse: [Rᵀ | -Rᵀ t]."""
    rt = jnp.swapaxes(rotation(m), -1, -2)
    t = -(rt @ translation(m)[..., None])[..., 0]
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., 3).

    HIGHEST precision: the TPU default lowers f32 matmuls to bf16 MXU
    passes, which puts ~8 mm of noise on metre-scale points (measured) —
    catastrophic for ICP/solver residuals at mm tolerances. The K=3
    contraction makes HIGHEST essentially free here."""
    hi = jax.lax.Precision.HIGHEST
    return (
        jnp.matmul(p, jnp.swapaxes(rotation(m), -1, -2), precision=hi)
        + translation(m)
    )


def rotate_dirs(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation (for directions/normals)."""
    return jnp.matmul(
        v, jnp.swapaxes(rotation(m), -1, -2), precision=jax.lax.Precision.HIGHEST
    )


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (angle·axis) -> (3, 3) rotation matrix, safe at 0."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    k = rvec / jnp.maximum(theta, _EPS)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    kmat = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(rvec.shape[:-1] + (3, 3))
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.eye(3, dtype=rvec.dtype)
    full = eye + st * kmat + (1.0 - ct) * (kmat @ kmat)
    # first-order fallback near zero: I + [r]x
    rx, ry, rz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    lin = eye + jnp.stack(
        [zero, -rz, ry, rz, zero, -rx, -ry, rx, zero], axis=-1
    ).reshape(rvec.shape[:-1] + (3, 3))
    return jnp.where(small[..., None], lin, full)


def exp_twist(xi: jnp.ndarray) -> jnp.ndarray:
    """6-vector (rx, ry, rz, tx, ty, tz) -> (4, 4) transform with R =
    rodrigues(r) and translation t (the reference's ICP increment
    ``Affine3f(Vec3f(r.val), Vec3f(r.val+3))``, projective_icp.cpp:208 —
    note: literal translation, not the SE(3) exponential's V·t)."""
    r = rodrigues(xi[..., :3])
    m = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(xi[..., 3:])
    m = m.at[..., 3, 3].set(1.0)
    return m
