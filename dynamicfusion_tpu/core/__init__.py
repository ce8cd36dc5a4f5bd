"""Pure geometry math: quaternions, dual quaternions, SE(3), camera models.

Everything here is stateless, shape-polymorphic jnp code operating on batched
arrays (quaternions are ``(..., 4)`` wxyz, dual quaternions ``(..., 8)``,
rigid transforms ``(4, 4)``). These replace the reference's scalar C++
`Quaternion`/`DualQuaternion` classes
(/root/reference/kfusion/src/utils/{quaternion,dual_quaternion}.hpp) with
vectorized forms that XLA maps onto the VPU/MXU.
"""

from dynamicfusion_tpu.core import camera, dualquat, quat, se3

__all__ = ["quat", "dualquat", "se3", "camera"]
