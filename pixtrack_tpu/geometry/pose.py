"""SE(3) rigid transforms as a JAX pytree.

Replaces the reference's ``pixloc.pixlib.geometry.Pose`` (a torch wrapper,
inferred from call sites in pixtrack/utils/pose_utils.py and
pixtrack/localization/pixloc_pose_refiners.py) and the 4x4 converter zoo in
pixtrack/utils/pose_utils.py:16-69. Design differences from the reference:
a single immutable flax.struct dataclass, batched over leading axes, with the
se(3) retraction (``exp_compose``) the LM aligner needs built in.

Conventions
-----------
A ``Pose`` maps points from frame A to frame B: ``x_b = R @ x_a + t``.
For cameras we follow COLMAP: the *world-to-camera* pose ``T_w2c`` satisfies
``x_cam = T_w2c * x_world``; the camera center is ``-R^T t``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from pixtrack_tpu.geometry import rotation as rot

_HI = jax.lax.Precision.HIGHEST


@flax.struct.dataclass
class Pose:
    """Rigid transform with rotation ``R`` (..., 3, 3) and translation ``t`` (..., 3)."""

    R: jax.Array
    t: jax.Array

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(R=R, t=t)

    @classmethod
    def from_Rt(cls, R, t) -> "Pose":
        return cls(R=jnp.asarray(R), t=jnp.asarray(t))

    @classmethod
    def from_quat_t(cls, qvec, tvec) -> "Pose":
        """From COLMAP (w, x, y, z) quaternion + translation."""
        return cls(R=rot.quat_to_rotmat(jnp.asarray(qvec)), t=jnp.asarray(tvec))

    @classmethod
    def from_4x4(cls, T) -> "Pose":
        T = jnp.asarray(T)
        return cls(R=T[..., :3, :3], t=T[..., :3, 3])

    @classmethod
    def from_aa_t(cls, w, t) -> "Pose":
        """From axis-angle rotation vector + translation."""
        return cls(R=rot.so3_exp(jnp.asarray(w)), t=jnp.asarray(t))

    @classmethod
    def exp(cls, delta) -> "Pose":
        """se(3) exponential of ``delta = (w, v)`` (..., 6).

        Uses the first-order retraction ``R = exp(w), t = v`` (the same
        retraction pixloc's optimizer applies per LM step; the difference from
        the full SE(3) exp is O(|w||v|) and absorbed by the iteration).
        """
        delta = jnp.asarray(delta)
        return cls(R=rot.so3_exp(delta[..., :3]), t=delta[..., 3:])

    # -- algebra -------------------------------------------------------------
    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def compose(self, other: "Pose") -> "Pose":
        """``self * other``: apply ``other`` first, then ``self``."""
        return Pose(
            R=jnp.matmul(self.R, other.R, precision=_HI),
            t=jnp.einsum("...ij,...j->...i", self.R, other.t, precision=_HI) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def inv(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(R=Rt, t=-jnp.einsum("...ij,...j->...i", Rt, self.t, precision=_HI))

    def transform(self, points: jax.Array) -> jax.Array:
        """Apply to points (..., N, 3) or (..., 3)."""
        points = jnp.asarray(points)
        if points.ndim >= 2 and points.shape[-2] != 3:
            # (..., N, 3): broadcast pose over N.
            return (
                jnp.einsum("...ij,...nj->...ni", self.R, points, precision=_HI)
                + self.t[..., None, :]
            )
        return jnp.einsum("...ij,...j->...i", self.R, points, precision=_HI) + self.t

    def retract(self, delta: jax.Array) -> "Pose":
        """Left-multiplicative update: ``exp(delta) * self`` (LM step)."""
        return Pose.exp(delta) @ self

    # -- conversions / metrics ----------------------------------------------
    def to_4x4(self) -> jax.Array:
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            (*self.batch_shape, 1, 4),
        )
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def to_quat_t(self):
        return rot.rotmat_to_quat(self.R), self.t

    @property
    def center(self) -> jax.Array:
        """If self is world-to-camera, this is the camera center in world."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t, precision=_HI)

    def magnitude(self):
        """(rotation degrees, translation norm) — matches the pixloc
        ``T_delta.magnitude()`` contract used by the early-stop rule
        (reference pixtrack/optimizers/pixtrack_optimizer.py:12)."""
        w = rot.so3_log(self.R)
        dr = jnp.linalg.norm(w, axis=-1) * (180.0 / jnp.pi)
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    def geodesic_to(self, other: "Pose") -> jax.Array:
        """Rotation angle (radians) between the two poses' rotations."""
        return rot.geodesic_distance(self.R, other.R)

    def astype(self, dtype) -> "Pose":
        return Pose(R=self.R.astype(dtype), t=self.t.astype(dtype))

    def __getitem__(self, idx) -> "Pose":
        return Pose(R=self.R[idx], t=self.t[idx])
