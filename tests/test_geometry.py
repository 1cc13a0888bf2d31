"""Unit tests for the geometry core: rotations, poses, cameras, transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pixtrack_tpu.geometry import (
    Camera,
    NerfTransform,
    Pose,
    geodesic_distance,
    quat_to_rotmat,
    rotmat_to_quat,
    so3_exp,
    so3_log,
)
from pixtrack_tpu.geometry import nerf_transform as nt


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=np.random.RandomState(0)).as_matrix()


class TestRotation:
    def test_exp_log_roundtrip(self, rng):
        # Round-trip is only well-defined for |w| < pi; keep well inside.
        w = rng.normal(size=(32, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 2.6, (32, 1))
        w = w.astype(np.float32)
        R = so3_exp(jnp.asarray(w))
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)

    def test_exp_matches_scipy(self, rng):
        w = rng.normal(size=(16, 3)).astype(np.float64)
        R_ours = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        R_scipy = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)

    def test_exp_at_zero(self):
        R = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        # differentiable at zero
        g = jax.jacobian(lambda w: so3_exp(w))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_quat_roundtrip(self, rng):
        R = random_rotations(rng, 24).astype(np.float32)
        q = rotmat_to_quat(jnp.asarray(R))
        R2 = quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_quat_matches_scipy(self, rng):
        R = random_rotations(rng, 8)
        q_ours = np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)))
        q_scipy = ScipyRot.from_matrix(R).as_quat()  # xyzw
        q_scipy = np.concatenate([q_scipy[:, 3:4], q_scipy[:, :3]], axis=1)
        q_scipy *= np.sign(q_scipy[:, 0:1] + 1e-12)
        np.testing.assert_allclose(np.abs(q_ours), np.abs(q_scipy), atol=1e-5)

    def test_geodesic(self, rng):
        R1 = ScipyRot.from_euler("z", 30, degrees=True).as_matrix()
        R2 = np.eye(3)
        ang = geodesic_distance(jnp.asarray(R1, jnp.float32), jnp.asarray(R2, jnp.float32))
        assert abs(float(ang) - np.deg2rad(30)) < 1e-5


class TestPose:
    def test_compose_inv(self, rng):
        R = random_rotations(rng, 8).astype(np.float32)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        T = Pose.from_Rt(R, t)
        I = T @ T.inv()
        np.testing.assert_allclose(np.asarray(I.R), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), np.zeros((8, 3)), atol=1e-5)

    def test_transform_points(self, rng):
        R = random_rotations(rng, 1)[0].astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        p = rng.normal(size=(100, 3)).astype(np.float32)
        T = Pose.from_Rt(R, t)
        out = np.asarray(T.transform(p))
        np.testing.assert_allclose(out, p @ R.T + t, atol=1e-5)
        # inverse undoes
        back = np.asarray(T.inv().transform(out))
        np.testing.assert_allclose(back, p, atol=1e-4)

    def test_4x4_roundtrip(self, rng):
        R = random_rotations(rng, 4).astype(np.float32)
        t = rng.normal(size=(4, 3)).astype(np.float32)
        T = Pose.from_Rt(R, t)
        T2 = Pose.from_4x4(T.to_4x4())
        np.testing.assert_allclose(np.asarray(T2.R), R, atol=1e-6)
        np.testing.assert_allclose(np.asarray(T2.t), t, atol=1e-6)

    def test_magnitude(self):
        w = np.deg2rad(10.0) * np.array([0, 0, 1.0], np.float32)
        T = Pose.from_aa_t(w, np.array([3.0, 4.0, 0.0], np.float32))
        dr, dt = T.magnitude()
        assert abs(float(dr) - 10.0) < 1e-3
        assert abs(float(dt) - 5.0) < 1e-5

    def test_retract_identity_delta(self, rng):
        R = random_rotations(rng, 1)[0].astype(np.float32)
        T = Pose.from_Rt(R, np.array([1.0, 2.0, 3.0], np.float32))
        T2 = T.retract(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T2.R), R, atol=1e-6)

    def test_center(self, rng):
        R = random_rotations(rng, 1)[0].astype(np.float32)
        c = np.array([1.0, -2.0, 0.5], np.float32)
        T_w2c = Pose.from_Rt(R, -R @ c)
        np.testing.assert_allclose(np.asarray(T_w2c.center), c, atol=1e-5)


class TestCamera:
    def make_cam(self):
        return Camera.pinhole(500.0, 510.0, 320.0, 240.0, 640, 480)

    def test_project_center(self):
        cam = self.make_cam()
        p2d, valid = cam.project(jnp.asarray([[0.0, 0.0, 2.0]]))
        np.testing.assert_allclose(np.asarray(p2d)[0], [320.0, 240.0], atol=1e-5)
        assert bool(valid[0])

    def test_behind_camera_invalid(self):
        cam = self.make_cam()
        _, valid = cam.project(jnp.asarray([[0.0, 0.0, -1.0]]))
        assert not bool(valid[0])

    def test_jacobian_matches_autodiff(self, rng):
        cam = Camera(
            size=jnp.asarray([640.0, 480.0]),
            f=jnp.asarray([500.0, 510.0]),
            c=jnp.asarray([320.0, 240.0]),
            k=jnp.asarray([0.05, -0.01]),
        )
        p = jnp.asarray(
            rng.normal(size=(20, 3)).astype(np.float32) * 0.3
            + np.array([0, 0, 2.0], np.float32)
        )
        J_analytic = np.asarray(cam.project_jacobian(p))

        def proj_one(pt):
            p2d, _ = cam.project(pt[None])
            return p2d[0]

        J_auto = np.asarray(jax.vmap(jax.jacobian(proj_one))(p))
        np.testing.assert_allclose(J_analytic, J_auto, atol=1e-2, rtol=1e-3)

    def test_scale(self):
        cam = self.make_cam()
        cam2 = cam.scale(0.5)
        p = jnp.asarray([[0.3, -0.2, 1.5]])
        p2d, _ = cam.project(p)
        p2d2, _ = cam2.project(p)
        # index-centered: p' = (p + 0.5) * s - 0.5
        np.testing.assert_allclose(
            np.asarray(p2d2), (np.asarray(p2d) + 0.5) * 0.5 - 0.5, atol=1e-4
        )

    def test_from_colmap_simple_radial(self):
        cam = Camera.from_colmap("SIMPLE_RADIAL", [400.0, 321.0, 241.0, 0.01], 640, 480)
        assert float(cam.f[0]) == 400.0 and float(cam.f[1]) == 400.0
        np.testing.assert_allclose(np.asarray(cam.c), [320.5, 240.5])
        assert float(cam.k[0]) == pytest.approx(0.01)

    def test_world2image_consistency(self, rng):
        cam = self.make_cam()
        R = ScipyRot.from_euler("yx", [15, -10], degrees=True).as_matrix().astype(np.float32)
        t = np.array([0.1, -0.1, 2.0], np.float32)
        T = Pose.from_Rt(R, t)
        pw = rng.normal(size=(50, 3)).astype(np.float32) * 0.2
        p2d, valid = cam.world2image(T, jnp.asarray(pw))
        p_cam = np.asarray(T.transform(pw))
        expect = p_cam[:, :2] / p_cam[:, 2:3] * [500.0, 510.0] + [320.0, 240.0]
        np.testing.assert_allclose(np.asarray(p2d), expect, atol=1e-3)


class TestNerfTransform:
    def make_tf(self, rng):
        R4 = np.eye(4)
        R4[:3, :3] = ScipyRot.from_euler("xyz", [20, -35, 50], degrees=True).as_matrix()
        return NerfTransform(
            centroid=rng.normal(size=3),
            avglen=2.7,
            R=R4,
            totp=rng.normal(size=3) * 0.1,
        )

    def test_point_roundtrip(self, rng):
        tf = self.make_tf(rng)
        x = rng.normal(size=(40, 3))
        np.testing.assert_allclose(tf.points_nerf_to_sfm(tf.points_sfm_to_nerf(x)), x, atol=1e-9)

    def test_pose_roundtrip(self, rng):
        tf = self.make_tf(rng)
        c2w = np.eye(4)
        c2w[:3, :3] = ScipyRot.from_euler("zyx", [10, 40, -25], degrees=True).as_matrix()
        c2w[:3, 3] = [0.4, -1.2, 2.0]
        back = tf.pose_nerf_to_sfm(tf.pose_sfm_to_nerf(c2w))
        np.testing.assert_allclose(back, c2w, atol=1e-9)

    def test_pose_rotation_stays_orthonormal(self, rng):
        tf = self.make_tf(rng)
        c2w = np.eye(4)
        c2w[:3, 3] = [1.0, 2.0, 3.0]
        out = tf.pose_sfm_to_nerf(c2w)
        RtR = out[:3, :3].T @ out[:3, :3]
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-10)

    def test_camera_center_maps_like_point(self, rng):
        # The translation column of the transformed pose must equal the point
        # map of the original camera center (cameras ride the world map).
        tf = self.make_tf(rng)
        c2w = np.eye(4)
        c2w[:3, :3] = ScipyRot.from_euler("xy", [30, 60], degrees=True).as_matrix()
        c2w[:3, 3] = [0.3, 0.1, -0.7]
        out = tf.pose_sfm_to_nerf(c2w)
        np.testing.assert_allclose(out[:3, 3], tf.points_sfm_to_nerf(c2w[:3, 3]), atol=1e-12)

    def test_save_load(self, rng, tmp_path):
        tf = self.make_tf(rng)
        p = tmp_path / "nerf2sfm.pkl"
        tf.save(p)
        tf2 = NerfTransform.load(p)
        np.testing.assert_allclose(tf2.centroid, tf.centroid)
        np.testing.assert_allclose(tf2.R, tf.R)
        assert tf2.avglen == pytest.approx(tf.avglen)

    def test_ngp_roundtrip(self, rng):
        x = rng.normal(size=(10, 3))
        np.testing.assert_allclose(nt.ngp_to_nerf_points(nt.nerf_to_ngp_points(x)), x, atol=1e-12)
        c2w = np.eye(4)
        c2w[:3, :3] = ScipyRot.from_euler("xz", [12, -70], degrees=True).as_matrix()
        c2w[:3, 3] = [0.5, 0.25, -0.1]
        np.testing.assert_allclose(nt.ngp_to_nerf_pose(nt.nerf_to_ngp_pose(c2w)), c2w, atol=1e-12)

    def test_identity_transform_point_semantics(self):
        # With identity params (centroid 0, avglen 3 -> s=1, R=I, totp=0) the
        # map reduces to the bare axis fix: (x, y, z) -> (y, x, -z).
        tf = NerfTransform.identity()
        out = tf.points_sfm_to_nerf(np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(out, [2.0, 1.0, -3.0], atol=1e-12)
