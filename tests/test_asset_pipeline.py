"""Tests for NeRF-dataset creation (colmap2ingp role) and featuremetric
refinement (pixsfm role)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Camera
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.mapping.featuremetric import (
    FeatureMetricConfig,
    keypoint_adjustment,
    point_adjustment,
)
from pixtrack_tpu.mapping.nerf_dataset import (
    closest_point_to_rays,
    compute_nerf_transform,
    estimate_aabb_from_scene,
    write_transforms_json,
)
from pixtrack_tpu.tracking.render_bridge import render_nerf_view

from synthetic_world import build_world, make_scene, make_testbed


@pytest.fixture(scope="module")
def world():
    return build_world(res=128, n_frames=3)


class TestNerfDataset:
    def test_closest_point_to_rays(self):
        # rays through a common point
        target = np.array([1.0, 2.0, 3.0])
        rng = np.random.default_rng(0)
        origins = rng.normal(size=(10, 3)) * 5
        dirs = target - origins
        x = closest_point_to_rays(origins, dirs)
        np.testing.assert_allclose(x, target, atol=1e-9)

    def test_compute_transform_centers_object(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tf = compute_nerf_transform(scene)
        # all reference cameras look at the SfM origin -> totp should map the
        # origin region near the NeRF-space origin after normalization
        origin_nerf = tf.points_sfm_to_nerf(np.zeros(3))
        assert np.linalg.norm(origin_nerf) < 0.3, origin_nerf
        # cameras end up at distance ~3 (avg camera distance normalized to 3)
        cams = []
        for iid in scene.image_ids:
            c2w = np.asarray(scene.pose_w2c(int(iid)).inv().to_4x4())
            cams.append(tf.pose_sfm_to_nerf(c2w)[:3, 3])
        d = np.linalg.norm(np.stack(cams) - origin_nerf, axis=1)
        assert abs(d.mean() - 3.0) < 0.3

    def test_transforms_json_roundtrip(self, world, tmp_path):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tf = compute_nerf_transform(scene)
        meta = write_transforms_json(scene, tf, tmp_path / "transforms.json")
        assert (tmp_path / "transforms.json").exists()
        with open(tmp_path / "transforms.json") as f:
            loaded = json.load(f)
        assert len(loaded["frames"]) == len(scene.image_ids)
        # rotation part orthonormal
        M = np.asarray(loaded["frames"][0]["transform_matrix"])
        np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3), atol=1e-8)
        tf.save(tmp_path / "nerf2sfm.pkl")
        tf2 = NerfTransform.load(tmp_path / "nerf2sfm.pkl")
        np.testing.assert_allclose(tf2.totp, tf.totp)

    def test_estimate_aabb(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tf = compute_nerf_transform(scene)
        aabb = estimate_aabb_from_scene(scene, tf)
        lo, hi = np.asarray(aabb[0]), np.asarray(aabb[1])
        assert np.all(hi > lo)
        # grid-space box should sit inside the unit cube neighborhood
        assert np.all(lo > -0.5) and np.all(hi < 1.5)


class TestFeaturemetric:
    def test_keypoint_adjustment_reduces_spread(self, world):
        """Perturb one observation of each track; KA should pull it back
        toward feature-metric agreement."""
        scene, testbed, nerf2sfm, camera, gt, frames = world
        # two identical images -> identical features; tracks = same keypoint
        img = frames[0][1]
        rng = np.random.default_rng(0)
        from pixtrack_tpu.mapping.detector import detect_keypoints

        kp, _ = detect_keypoints(img, max_keypoints=64, nms_radius=3)
        kp = kp + 0.5  # corner convention
        n = len(kp)
        images = {1: img, 2: img}
        noise = rng.uniform(-2.0, 2.0, size=(n, 2))
        keypoints = {1: kp.copy(), 2: kp + noise}
        tracks = [[(1, i), (2, i)] for i in range(n)]
        ex = FeatureExtractor(HandcraftedExtractor(), resize=None)
        out = keypoint_adjustment(
            images, keypoints, tracks, ex,
            FeatureMetricConfig(num_iters=15, max_shift_px=4.0),
        )
        # adjusted obs 2 should be closer to the true (unperturbed) location
        d_before = np.linalg.norm(noise, axis=1)
        d_after = np.linalg.norm(out[2] - kp, axis=1)
        improved = (d_after < d_before - 0.1).mean()
        assert d_after.mean() < d_before.mean() * 0.8, (
            f"before {d_before.mean():.2f} after {d_after.mean():.2f}"
        )

    def test_point_adjustment_bounded_by_prior(self, world):
        """PA must stay anchored near the triangulated solution.

        Accuracy *gains* from featuremetric PA require learned view-invariant
        features (the pixsfm/S2DNet premise); with handcrafted features the
        view-dependent component pushes along rays, so the contract tested
        here is the position prior bounding the adjustment.
        """
        scene, testbed, nerf2sfm, camera, gt, frames = world
        images = {}
        for iid in scene.image_ids[:4]:
            T = scene.pose_w2c(int(iid))
            images[int(iid)] = render_nerf_view(testbed, nerf2sfm, T, camera, spp=1)
        ex = FeatureExtractor(HandcraftedExtractor(), resize=None)
        xyz2 = point_adjustment(
            scene, images, ex,
            FeatureMetricConfig(num_iters=8, position_prior=50.0), max_views=4,
        )
        assert xyz2.shape == scene.xyz.shape
        assert np.all(np.isfinite(xyz2))
        move = np.linalg.norm(xyz2 - scene.xyz, axis=1)
        assert move.mean() < 0.03, f"mean adjustment {move.mean()}"
        assert move.max() < 0.2, f"max adjustment {move.max()}"
        # stronger prior -> smaller movement (the anchor actually acts)
        xyz3 = point_adjustment(
            scene, images, ex,
            FeatureMetricConfig(num_iters=8, position_prior=500.0), max_views=4,
        )
        move3 = np.linalg.norm(xyz3 - scene.xyz, axis=1)
        assert move3.mean() < move.mean()
