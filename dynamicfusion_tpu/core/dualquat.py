"""Batched dual quaternion algebra and dual-quaternion blending (DQB).

Dual quaternions are arrays of shape ``(..., 8)``: the first four components
are the real (rotation) quaternion ``(w, x, y, z)``, the last four the dual
part. A rigid transform (R(q), t) is encoded as real = q, dual = 0.5·t⊗q —
the same storage convention as the reference's
``kfusion::utils::DualQuaternion`` (translation stored as 0.5·t·r,
/root/reference/kfusion/src/utils/dual_quaternion.hpp:59-63) but with a
*group-correct* product (the reference's operator* adds translation parts,
dual_quaternion.hpp:160-167, which is not the dual quaternion product; here
the true product is used) and paper-correct normalized blending (the
reference normalizes only the rotation and blends raw translations,
/root/reference/kfusion/src/warp_field.cpp:203-217).
"""

from __future__ import annotations

import jax.numpy as jnp

from dynamicfusion_tpu.core import quat

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def real(dq: jnp.ndarray) -> jnp.ndarray:
    return dq[..., :4]


def dual(dq: jnp.ndarray) -> jnp.ndarray:
    return dq[..., 4:]


def make(real_q: jnp.ndarray, dual_q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([real_q, dual_q], axis=-1)


def from_rot_trans(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a dual quaternion from unit rotation quaternion q and translation
    vector t: dual = 0.5 · (0, t) ⊗ q."""
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    return make(q, 0.5 * quat.mul(t_quat, q))


def from_twist(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Twist (r, t) -> dual quaternion, with rotation = exp_pure(r).

    Matches the parametrization of the reference's
    ``DualQuaternion::from_twist`` (dual_quaternion.hpp:212-229): the rotation
    is the quaternion exponential of the pure quaternion r (angle 2|r|), and
    t is the literal translation vector. This is the 6-dof coordinate chart
    the warp solver optimizes over."""
    return from_rot_trans(quat.exp_pure(r), t)


def rotation(dq: jnp.ndarray) -> jnp.ndarray:
    return real(dq)


def translation(dq: jnp.ndarray) -> jnp.ndarray:
    """Extract the translation vector: t = 2 · dual ⊗ conj(real̂)."""
    r = quat.normalize(real(dq))
    t_quat = 2.0 * quat.mul(dual(dq), quat.conj(r))
    return t_quat[..., 1:]


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """True dual quaternion product: (ar + ε ad)(br + ε bd)."""
    r = quat.mul(real(a), real(b))
    d = quat.mul(real(a), dual(b)) + quat.mul(dual(a), real(b))
    return make(r, d)


def conj(dq: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate of both parts."""
    return make(quat.conj(real(dq)), quat.conj(dual(dq)))


def normalize(dq: jnp.ndarray) -> jnp.ndarray:
    """Project to a unit dual quaternion: divide by |real| and remove the
    real·dual component so that <real, dual> = 0.

    Gradient-safe at |real| = 0 (degenerate all-zero blends pass through
    unchanged with finite tangents — see quat.normalize)."""
    n2 = jnp.sum(real(dq) * real(dq), axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.where(n2 < _EPS, 1.0, n2))
    r = real(dq) / n
    d = dual(dq) / n
    d = d - jnp.sum(r * d, axis=-1, keepdims=True) * r
    return make(r, d)


def transform(dq: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply the rigid transform encoded by a (unit) dual quaternion to
    points p (..., 3): p' = R(real) p + t(dq)."""
    return quat.rotate(quat.normalize(real(dq)), p) + translation(dq)


def rotate(dq: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part (for normals)."""
    return quat.rotate(quat.normalize(real(dq)), v)


def blend(weights: jnp.ndarray, dqs: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion blending: normalize(Σᵢ wᵢ dqᵢ).

    ``weights``: (..., K); ``dqs``: (..., K, 8). Antipodal sign consistency is
    enforced against the first (highest-weight) neighbor before summation so
    that q and -q (same rotation) do not cancel."""
    pivot = dqs[..., :1, :4]
    sign = jnp.sign(jnp.sum(dqs[..., :4] * pivot, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    blended = jnp.sum(weights[..., None] * dqs * sign, axis=-2)
    return normalize(blended)


def to_matrix(dq: jnp.ndarray) -> jnp.ndarray:
    """Unit dual quaternion -> (..., 4, 4) homogeneous rigid transform."""
    r = quat.normalize(real(dq))
    rot = quat.to_matrix(r)
    t = translation(dq)
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dq.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) rigid transform -> unit dual quaternion."""
    q = quat.from_matrix(m[..., :3, :3])
    return from_rot_trans(q, m[..., :3, 3])
