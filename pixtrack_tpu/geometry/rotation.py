"""SO(3) utilities as pure JAX functions (batched, differentiable).

Quaternions use the COLMAP/Hamilton ``(w, x, y, z)`` convention throughout.

Capability parity notes (reference = GiantAI/pixtrack):
- ``geodesic_distance`` replaces pixtrack/utils/pose_utils.py:8-13
  (scipy-based rotvec norm) with a closed-form trace formula.
- ``euler_rotation`` replaces the hand-rolled Rz/Ry/Rx products in
  pixtrack/utils/pose_utils.py:72-112.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# TPU matmul default precision is bfloat16; 3x3 rotation algebra needs full
# f32, and the cost is negligible at these shapes.
def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def so3_hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of ``w`` (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    Uses series expansions of sin(t)/t and (1-cos(t))/t^2 near zero so the map
    is differentiable at the identity (needed: the LM update linearizes here).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    # Safe-where: route the unsafe branch through a dummy value so its
    # gradient (1/sqrt at 0) never produces NaNs under autodiff.
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    K = so3_hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _mm(K, K)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Stable away from theta = pi (sufficient for step magnitudes / geodesic
    distances in tracking, where consecutive rotations are small-to-moderate).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part gives axis * sin(theta).
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    # v = 2 sin(theta) * axis; w = theta * axis.
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # series of theta / (2 sin theta)
        theta / jnp.maximum(2.0 * sin_theta, _EPS),
    )
    return v * scale[..., None]


def geodesic_distance(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Angle (radians) between two rotations, batched.

    Replaces pose_utils.geodesic_distance_for_rotations (reference
    pixtrack/utils/pose_utils.py:8-13).
    """
    Rd = _mm(R1, jnp.swapaxes(R2, -1, -2))
    trace = jnp.trace(Rd, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """COLMAP quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> COLMAP quaternion (w, x, y, z) (..., 4).

    Branch-free Shepperd-style selection of the numerically largest component,
    expressed with jnp.where so it vectorizes and jits.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate solutions, each stable in a different region.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    sw = safe_sqrt(tw) * 0.5
    sx = safe_sqrt(tx) * 0.5
    sy = safe_sqrt(ty) * 0.5
    sz = safe_sqrt(tz) * 0.5

    qw = jnp.stack([sw, (m21 - m12) / (4 * sx), (m02 - m20) / (4 * sy), (m10 - m01) / (4 * sz)], -1)
    qx = jnp.stack([(m21 - m12) / (4 * sw), sx, (m01 + m10) / (4 * sy), (m02 + m20) / (4 * sz)], -1)
    qy = jnp.stack([(m02 - m20) / (4 * sw), (m01 + m10) / (4 * sx), sy, (m12 + m21) / (4 * sz)], -1)
    qz = jnp.stack([(m10 - m01) / (4 * sw), (m02 + m20) / (4 * sx), (m12 + m21) / (4 * sy), sz], -1)

    choice = jnp.argmax(jnp.stack([tw, tx, ty, tz], axis=-1), axis=-1)
    onehot = jax.nn.one_hot(choice, 4, dtype=R.dtype)
    q = (
        onehot[..., 0:1] * jnp.stack([qw[..., 0], qx[..., 0], qy[..., 0], qz[..., 0]], -1)
        + onehot[..., 1:2] * jnp.stack([qw[..., 1], qx[..., 1], qy[..., 1], qz[..., 1]], -1)
        + onehot[..., 2:3] * jnp.stack([qw[..., 2], qx[..., 2], qy[..., 2], qz[..., 2]], -1)
        + onehot[..., 3:4] * jnp.stack([qw[..., 3], qx[..., 3], qy[..., 3], qz[..., 3]], -1)
    )
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def euler_rotation(rz: float = 0.0, ry: float = 0.0, rx: float = 0.0, degrees: bool = True):
    """Rz @ Ry @ Rx rotation (the composition order the reference uses for
    post-rotating camera-in-world poses, pose_utils.py:72-112)."""
    f = jnp.pi / 180.0 if degrees else 1.0
    rz, ry, rx = rz * f, ry * f, rx * f
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    return Rz @ Ry @ Rx
