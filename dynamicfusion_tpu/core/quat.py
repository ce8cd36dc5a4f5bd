"""Batched quaternion algebra.

Quaternions are arrays of shape ``(..., 4)`` in ``(w, x, y, z)`` order.
Functional equivalent of the reference's ``kfusion::utils::Quaternion<T>``
(/root/reference/kfusion/src/utils/quaternion.hpp:19-245), re-designed as
vectorized array ops: every function broadcasts over leading batch dims so a
whole frame of points/rotations is one VPU-friendly elementwise expression.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product p ⊗ q (matches quaternion.hpp:186-194)."""
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def norm(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(q, axis=-1, keepdims=True)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    # gradient-safe at q = 0 (returns q unchanged there): the norm is taken
    # of a where-guarded value so sqrt never differentiates at 0 — NaN
    # tangents would otherwise poison masked-out lanes in the warp solver's
    # batched Jacobians (NaN * 0 = NaN).
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    small = n2 < _EPS
    return q / jnp.sqrt(jnp.where(small, 1.0, n2))


def dot(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(p * q, axis=-1)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion for a rotation of ``angle`` radians about ``axis``.

    The axis is normalized first (the reference's ``encodeRotation``
    normalizes the whole quaternion after scaling, which silently mixes the
    axis norm into w; here the axis is normalized up front, which is the
    mathematically standard encoding)."""
    axis = jnp.asarray(axis, dtype=jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    angle = jnp.asarray(angle, dtype=jnp.float32)[..., None]
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def from_rotvec(r: jnp.ndarray) -> jnp.ndarray:
    """Exponential-map encoding: angle = |r|, axis = r/|r| (Rodrigues vector).

    Safe at r = 0 via the sinc expansion."""
    r = jnp.asarray(r, dtype=jnp.float32)
    n2 = jnp.sum(r * r, axis=-1, keepdims=True)
    small = n2 < 1e-12
    angle = jnp.sqrt(jnp.where(small, 1.0, n2))  # grad-safe at 0
    half = 0.5 * angle
    k = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, r * k], axis=-1)


def to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`from_rotvec` for unit quaternions."""
    q = normalize(q)
    # force w >= 0 so the angle is in [0, pi]
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = jnp.arctan2(sin_half, w)
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0 + 2.0 * half * half / 3.0, 2.0 * half / jnp.maximum(sin_half, _EPS))
    return v * scale


def exp_pure(v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exponential of a pure quaternion (0, v).

    ``exp_pure(v)`` rotates by angle ``2|v|`` about ``v/|v|``. This is the
    parametrization the reference's ``DualQuaternion::from_twist`` uses
    (/root/reference/kfusion/src/utils/dual_quaternion.hpp:212-229) and the
    one our warp solver optimizes over — it is smooth everywhere, and this
    implementation is differentiable at v = 0 (the solver linearizes exactly
    there): the norm is taken of a where-guarded value so the sqrt branch
    never sees 0, and the small branch is a polynomial in |v|^2."""
    v = jnp.asarray(v, dtype=jnp.float32)
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    k = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    w = jnp.where(small, 1.0 - n2 / 2.0, jnp.cos(n))
    return jnp.concatenate([w, v * k], axis=-1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the 15-op form v + 2 u × (u × v + w v) (quaternion.hpp:124-130)."""
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * jnp.cross(u, uv + w * v)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> unit quaternion, branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned
    one with where-masks (jit-friendly, no data-dependent control flow)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    sw = jnp.sqrt(jnp.maximum(tw, _EPS)) * 2.0
    sx = jnp.sqrt(jnp.maximum(tx, _EPS)) * 2.0
    sy = jnp.sqrt(jnp.maximum(ty, _EPS)) * 2.0
    sz = jnp.sqrt(jnp.maximum(tz, _EPS)) * 2.0

    qw = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    qx = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    qy = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1)
    qz = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1)

    t = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(t, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return normalize(q)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation (shortest arc)."""
    d = dot(q0, q1)[..., None]
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return normalize(w0 * q0 + w1 * q1)
