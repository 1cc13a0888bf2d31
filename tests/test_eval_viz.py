"""Tests for evaluation metrics and visualization overlays."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as SR

from pixtrack_tpu.eval.metrics import (
    add_error,
    add_s_error,
    auc_of_threshold_curve,
    evaluate_trajectory,
    pose_errors,
    threshold_accuracy,
    umeyama_alignment,
)


class TestMetrics:
    def test_add_zero_for_identical_poses(self, rng):
        R = SR.from_euler("xyz", [10, 20, 30], degrees=True).as_matrix()
        t = np.array([0.1, 0.2, 0.3])
        pts = rng.normal(size=(100, 3))
        assert add_error(R, t, R, t, pts) == 0.0
        assert add_s_error(R, t, R, t, pts) == pytest.approx(0.0, abs=1e-12)

    def test_add_translation_offset(self, rng):
        R = np.eye(3)
        pts = rng.normal(size=(50, 3))
        err = add_error(R, np.zeros(3), R, np.array([0.05, 0, 0]), pts)
        assert err == pytest.approx(0.05)

    def test_add_s_handles_symmetry(self, rng):
        """Rotating a circle of points about its axis: ADD large, ADD-S ~ 0."""
        theta = np.linspace(0, 2 * np.pi, 360, endpoint=False)
        pts = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], 1)
        Rz = SR.from_euler("z", 37, degrees=True).as_matrix()
        add = add_error(Rz, np.zeros(3), np.eye(3), np.zeros(3), pts)
        adds = add_s_error(Rz, np.zeros(3), np.eye(3), np.zeros(3), pts)
        assert add > 0.3
        assert adds < 0.02

    def test_pose_errors(self):
        R1 = SR.from_euler("y", 5, degrees=True).as_matrix()
        r, t = pose_errors(R1, [0, 0, 0.02], np.eye(3), [0, 0, 0])
        assert r == pytest.approx(5.0, abs=1e-4)
        assert t == pytest.approx(0.02)

    def test_umeyama_recovers_similarity(self, rng):
        src = rng.normal(size=(40, 3))
        R = SR.from_euler("zx", [25, -40], degrees=True).as_matrix()
        s, t = 1.7, np.array([1.0, -2.0, 0.5])
        dst = s * src @ R.T + t
        s2, R2, t2 = umeyama_alignment(src, dst)
        assert s2 == pytest.approx(s, rel=1e-6)
        np.testing.assert_allclose(R2, R, atol=1e-8)
        np.testing.assert_allclose(t2, t, atol=1e-8)

    def test_threshold_accuracy(self):
        acc = threshold_accuracy([0.01, 0.06, 0.02], [2.0, 1.0, 9.0], 0.05, 5.0)
        assert acc == pytest.approx(1 / 3)

    def test_auc_bounds(self, rng):
        assert auc_of_threshold_curve([0.0] * 10, 0.1) == pytest.approx(1.0)
        assert auc_of_threshold_curve([1.0] * 10, 0.1) == pytest.approx(0.0)
        mid = auc_of_threshold_curve(rng.uniform(0, 0.1, 100), 0.1)
        assert 0.3 < mid < 0.7

    def test_evaluate_trajectory(self, rng):
        gt = []
        est = []
        for i in range(10):
            R = SR.from_euler("y", 3 * i, degrees=True).as_matrix()
            t = np.array([0.01 * i, 0, 1.0])
            gt.append((R, t))
            Rn = SR.from_euler("y", 3 * i + 0.5, degrees=True).as_matrix()
            est.append((Rn, t + [0.005, 0, 0]))
        pts = rng.normal(size=(64, 3)) * 0.1
        out = evaluate_trajectory(est, gt, model_points=pts, add_auc_threshold=0.1)
        assert out["acc_5cm5deg"] == 1.0
        assert out["success_10cm10deg"] == 1.0
        assert out["mean_r_deg"] == pytest.approx(0.5, abs=1e-3)
        assert 0 < out["mean_add"] < 0.01
        assert 0.8 < out["add_auc"] <= 1.0


class TestViz:
    def test_draw_overlays(self, rng):
        import jax.numpy as jnp

        from pixtrack_tpu.geometry import Camera, Pose
        from pixtrack_tpu.viz.overlay import (
            blend_images,
            draw_aabb_box,
            draw_error_text,
            draw_object_center,
            draw_pose_axes,
        )

        img = np.zeros((120, 160, 3), np.uint8)
        cam = Camera.pinhole(100.0, 100.0, 79.5, 59.5, 160, 120)
        T = Pose.from_Rt(np.eye(3, dtype=np.float32), np.array([0, 0, 1.0], np.float32))
        out = draw_pose_axes(img, cam, T, length=0.2)
        assert out.sum() > 0  # something was drawn
        out2 = draw_object_center(out, cam, T, np.zeros(3))
        out3 = draw_aabb_box(out2, cam, T, [-0.2] * 3, [0.2] * 3)
        out4 = draw_error_text(out3, 0.03, 2.5)
        assert out4.shape == img.shape
        # blending: black foreground passes background through
        bg = np.full_like(img, 100)
        blended = blend_images(np.zeros_like(img), bg)
        np.testing.assert_array_equal(blended, bg)

    def test_render_pose_overlays_end_to_end(self, tmp_path):
        import pickle
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic_world import build_world

        from pixtrack_tpu.viz.overlay import render_pose_overlays, write_video

        scene, testbed, nerf2sfm, camera, gt, frames = build_world(res=64, n_frames=2)
        poses = {}
        import jax.numpy as jnp

        for i, (name, img) in enumerate(frames):
            poses[name] = {
                "T_refined": np.asarray(gt[i].to_4x4()),
                "camera": {
                    "size": np.asarray(camera.size),
                    "f": np.asarray(camera.f),
                    "c": np.asarray(camera.c),
                    "k": np.asarray(camera.k),
                },
                "query_path": name,  # not on disk -> render-only path
            }
        pkl = tmp_path / "poses.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(poses, f)
        paths = render_pose_overlays(
            pkl, scene, testbed, nerf2sfm, tmp_path / "results",
            camera=camera, object_center=np.zeros(3), spp=1,
        )
        assert len(paths) == 2
        import cv2

        img = cv2.imread(paths[0])
        assert img is not None and img.shape == (64, 64, 3)
        write_video(paths, tmp_path / "overlay.mp4", fps=5)
        assert (tmp_path / "overlay.mp4").exists()
