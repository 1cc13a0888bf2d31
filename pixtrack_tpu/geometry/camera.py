"""Pinhole / radial cameras as a JAX pytree with analytic projection Jacobians.

Replaces the reference's ``pixloc.pixlib.geometry.Camera`` (inferred from call
sites: ``Camera.from_colmap``, ``camera.scale``, ``world2image`` at
pixtrack/localization/pixloc_pose_refiners.py:336-348) and the COLMAP camera
models consumed by pixtrack/utils/colmap2ingp.py:222-259.

Pixel convention: projections return *index-centered* coordinates, i.e.
``(0, 0)`` is the **center** of the top-left pixel (so they can be used
directly as bilinear interpolation coordinates into an (H, W) array).
COLMAP intrinsics place the center of the top-left pixel at ``(0.5, 0.5)``;
``Camera.from_colmap`` therefore subtracts 0.5 from the principal point.

All params are stored in one flat vector so a batch of heterogeneous-model
cameras stays a single array; the distortion model (none / 1 or 2 radial
coefficients) is selected by data, not by Python branching, so everything
vmaps and jits.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from pixtrack_tpu.geometry.pose import Pose

# COLMAP model-name <-> id mapping (public COLMAP convention).
CAMERA_MODEL_IDS = {
    "SIMPLE_PINHOLE": 0,
    "PINHOLE": 1,
    "SIMPLE_RADIAL": 2,
    "RADIAL": 3,
    "OPENCV": 4,
}
CAMERA_MODEL_NAMES = {v: k for k, v in CAMERA_MODEL_IDS.items()}
# number of params per COLMAP model
CAMERA_MODEL_NUM_PARAMS = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8}


@flax.struct.dataclass
class Camera:
    """Camera intrinsics.

    Fields (all batchable over leading axes):
      size: (..., 2) = (width, height) in pixels (float).
      f:    (..., 2) = (fx, fy).
      c:    (..., 2) = (cx, cy) in index-centered convention.
      k:    (..., 2) = radial distortion (k1, k2); zeros = pinhole.
    """

    size: jax.Array
    f: jax.Array
    c: jax.Array
    k: jax.Array

    # -- constructors -------------------------------------------------------
    @classmethod
    def pinhole(cls, fx, fy, cx, cy, width, height) -> "Camera":
        return cls(
            size=jnp.asarray([width, height], jnp.float32),
            f=jnp.asarray([fx, fy], jnp.float32),
            c=jnp.asarray([cx, cy], jnp.float32),
            k=jnp.zeros(2, jnp.float32),
        )

    @classmethod
    def from_colmap(cls, model, params, width, height) -> "Camera":
        """Build from a COLMAP camera row (name or model id + params array)."""
        if isinstance(model, (int,)):
            model = CAMERA_MODEL_NAMES[model]
        params = jnp.asarray(params, jnp.float32)
        if model == "SIMPLE_PINHOLE":
            f = jnp.stack([params[0], params[0]])
            c = params[1:3]
            k = jnp.zeros(2)
        elif model == "PINHOLE":
            f = params[0:2]
            c = params[2:4]
            k = jnp.zeros(2)
        elif model == "SIMPLE_RADIAL":
            f = jnp.stack([params[0], params[0]])
            c = params[1:3]
            k = jnp.stack([params[3], jnp.zeros(())])
        elif model == "RADIAL":
            f = jnp.stack([params[0], params[0]])
            c = params[1:3]
            k = params[3:5]
        elif model == "OPENCV":
            # fx fy cx cy k1 k2 p1 p2 — tangential terms dropped (they are
            # zero in every reference config; YCB uses pure OPENCV K).
            f = params[0:2]
            c = params[2:4]
            k = params[4:6]
        else:
            raise ValueError(f"unsupported COLMAP camera model {model!r}")
        return cls(
            size=jnp.asarray([width, height], jnp.float32),
            f=f,
            c=c - 0.5,  # COLMAP corner convention -> index-centered
            k=k,
        )

    # -- basic ops -----------------------------------------------------------
    @property
    def width(self):
        return self.size[..., 0]

    @property
    def height(self):
        return self.size[..., 1]

    def scale(self, s) -> "Camera":
        """Rescale image by factor ``s`` (scalar or (sx, sy)).

        Matches the reference's ``Camera.scale`` semantics used to build the
        0.5x reference-render camera (pixloc_pose_refiners.py:336-340).
        """
        s = jnp.broadcast_to(jnp.asarray(s, self.f.dtype), self.f.shape)
        # index-centered c transforms as c' = (c + 0.5) * s - 0.5
        return Camera(
            size=self.size * s,
            f=self.f * s,
            c=(self.c + 0.5) * s - 0.5,
            k=self.k,
        )

    def crop(self, left_top, size) -> "Camera":
        lt = jnp.asarray(left_top, self.c.dtype)
        return Camera(
            size=jnp.asarray(size, self.size.dtype),
            f=self.f,
            c=self.c - lt,
            k=self.k,
        )

    def K(self) -> jax.Array:
        """3x3 intrinsic matrix (index-centered convention)."""
        fx, fy = self.f[..., 0], self.f[..., 1]
        cx, cy = self.c[..., 0], self.c[..., 1]
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, zeros, cx], -1),
                jnp.stack([zeros, fy, cy], -1),
                jnp.stack([zeros, zeros, ones], -1),
            ],
            axis=-2,
        )

    # -- projection -----------------------------------------------------------
    def _distort(self, uv: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Radial distortion of normalized coords; returns (uv_d, radial factor)."""
        r2 = jnp.sum(uv * uv, axis=-1, keepdims=True)
        k1 = self.k[..., None, 0:1] if uv.ndim > self.k.ndim else self.k[..., 0:1]
        k2 = self.k[..., None, 1:2] if uv.ndim > self.k.ndim else self.k[..., 1:2]
        factor = 1.0 + r2 * (k1 + r2 * k2)
        return uv * factor, factor

    def project(self, p_cam: jax.Array, eps: float = 1e-4):
        """Project camera-frame points (..., N, 3) -> pixels (..., N, 2).

        Returns (p2d, valid) where valid = in front of camera and inside image.
        """
        z = p_cam[..., 2:3]
        in_front = z[..., 0] > eps
        z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
        uv = p_cam[..., 0:2] / z_safe
        uv_d, _ = self._distort(uv)
        f = self.f[..., None, :] if p_cam.ndim > self.f.ndim else self.f
        c = self.c[..., None, :] if p_cam.ndim > self.c.ndim else self.c
        p2d = uv_d * f + c
        valid = in_front & self.in_image(p2d)
        return p2d, valid

    def in_image(self, p2d: jax.Array, pad: float = 0.0) -> jax.Array:
        size = self.size[..., None, :] if p2d.ndim > self.size.ndim else self.size
        ok = (p2d >= pad) & (p2d <= size - 1.0 - pad)
        return ok[..., 0] & ok[..., 1]

    def project_jacobian(self, p_cam: jax.Array, eps: float = 1e-4) -> jax.Array:
        """d p2d / d p_cam, analytic: (..., N, 2, 3).

        Includes the radial-distortion term (exact for k2 = 0; first-order in
        k2's cross term otherwise — the LM solver only needs a descent
        direction, and our SfM pipelines undistort to pinhole before tracking).
        """
        x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
        iz = 1.0 / z_safe
        u, v = x * iz, y * iz
        uv = jnp.stack([u, v], axis=-1)
        r2 = u * u + v * v
        k1 = self.k[..., 0]
        k2 = self.k[..., 1]
        k1 = k1[..., None] if p_cam.ndim > self.k.ndim else k1
        k2 = k2[..., None] if p_cam.ndim > self.k.ndim else k2
        g = 1.0 + r2 * (k1 + r2 * k2)  # radial factor
        dg_dr2 = k1 + 2.0 * k2 * r2

        # d(uv_d)/d(uv) = g*I + 2*dg_dr2 * uv uv^T
        duu = g + 2.0 * dg_dr2 * u * u
        duv = 2.0 * dg_dr2 * u * v
        dvv = g + 2.0 * dg_dr2 * v * v

        # d(uv)/d(p_cam) = [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]]
        fx = self.f[..., 0]
        fy = self.f[..., 1]
        fx = fx[..., None] if p_cam.ndim > self.f.ndim else fx
        fy = fy[..., None] if p_cam.ndim > self.f.ndim else fy

        j00 = fx * duu * iz
        j01 = fx * duv * iz
        j02 = fx * (-(duu * u + duv * v) * iz)
        j10 = fy * duv * iz
        j11 = fy * dvv * iz
        j12 = fy * (-(duv * u + dvv * v) * iz)
        row0 = jnp.stack([j00, j01, j02], axis=-1)
        row1 = jnp.stack([j10, j11, j12], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    def world2image(self, T_w2c: Pose, p3d_world: jax.Array):
        """World points -> pixels under world-to-camera pose. (p2d, valid)."""
        p_cam = T_w2c.transform(p3d_world)
        return self.project(p_cam)

    def fov_deg(self, axis: int = 0) -> jax.Array:
        """Field of view in degrees along ``axis`` (0 = x/width, 1 = y/height).

        Mirrors the reference's testbed.fov computation
        (run_vis_on_poses.py:38: atan(w / (2 fx)) * 2 * 180 / pi with fov_axis=0).
        """
        return (
            jnp.arctan2(self.size[..., axis] / 2.0, self.f[..., axis])
            * 2.0
            * 180.0
            / jnp.pi
        )
