"""Tracker-lineage tests: roll math pinning (r3) and variant smoke tracking
(r1/r2/r5 static disk refs, r6/r7 render-at-db-pose) on the synthetic world."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.tracking.render_bridge import render_nerf_view
from pixtrack_tpu.tracking.variants import (
    RollTracker,
    StaticRefConfig,
    StaticRefTracker,
    make_tracker_r1,
    make_tracker_r3,
    make_tracker_r5,
    make_tracker_r6,
    post_opt_rotation,
    pre_opt_rotation,
    roll_of_pose,
    rotate_image,
)

from synthetic_world import build_world, look_at_w2c


@pytest.fixture(scope="module")
def world():
    return build_world(res=128, n_frames=6)


@pytest.fixture(scope="module")
def mapping_dir(world, tmp_path_factory):
    """Render every scene reference view to disk (the pixsfm/dataset/mapping
    role) so disk-reference variants have images to load."""
    scene, testbed, nerf2sfm, camera, gt, frames = world
    d = tmp_path_factory.mktemp("mapping")
    import cv2

    for iid in scene.image_ids:
        img = render_nerf_view(testbed, nerf2sfm, scene.pose_w2c(iid), camera, spp=1)
        name = scene.images[int(iid)].name
        cv2.imwrite(str(d / name), img[..., ::-1])
    return str(d)


def pose_error(T: Pose, T_gt: Pose):
    dR, dt = (T @ T_gt.inv()).magnitude()
    return float(dR), float(dt)


class TestRollMath:
    def test_pre_opt_rotation_matches_cv2_coordinate_map(self):
        """project(pre_opt_rotation(T, a), X) must equal the cv2 rotation
        matrix applied to project(T, X) — the exactness of r3's trick."""
        import cv2

        cam = Camera.pinhole(140.0, 140.0, 63.5, 63.5, 128, 128)
        T = look_at_w2c(np.array([0.4, 0.3, 1.5]))
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-0.2, 0.2, (50, 3)).astype(np.float32))
        p2d, valid = cam.world2image(T, X)
        p2d = np.asarray(p2d)

        for a_deg in (30.0, -72.0, 145.0):
            M = cv2.getRotationMatrix2D((63.5, 63.5), a_deg, 1.0)
            expected = p2d @ M[:, :2].T + M[:, 2]
            T_rot = pre_opt_rotation(T, np.deg2rad(a_deg))
            p2d_rot, _ = cam.world2image(T_rot, X)
            np.testing.assert_allclose(np.asarray(p2d_rot), expected, atol=1e-3)

    def test_post_opt_inverts_pre_opt(self):
        T = look_at_w2c(np.array([0.4, 0.3, 1.5]))
        for a in (0.3, -1.2):
            T2 = post_opt_rotation(pre_opt_rotation(T, a), a)
            dR, dt = pose_error(T2, T)
            assert dR < 1e-4 and dt < 1e-6

    def test_roll_of_pose_upright_is_zero(self):
        # camera on the equator looking at origin with world-z as up: the up
        # axis projects straight up in the image
        T = look_at_w2c(np.array([0.0, 0.0, 1.5]), up=np.array([0.0, 1.0, 0.0]))
        roll = roll_of_pose(T, up_world=(0.0, 1.0, 0.0))
        assert abs(roll) < 1e-6

    def test_roll_correction_zeroes_roll(self):
        """The tracker invariant: rotating the image by the measured roll
        (== applying pre_opt_rotation with it) leaves zero residual roll."""
        T = look_at_w2c(np.array([0.0, 0.0, 1.5]), up=np.array([0.0, 1.0, 0.0]))
        for a in (0.4, -0.9):
            T_roll = pre_opt_rotation(T, a)  # inject an in-plane roll
            r = roll_of_pose(T_roll, up_world=(0.0, 1.0, 0.0))
            T_fixed = pre_opt_rotation(T_roll, r)
            assert abs(roll_of_pose(T_fixed, up_world=(0.0, 1.0, 0.0))) < 1e-5

    def test_rotate_image_rotates_content(self):
        img = np.zeros((64, 64, 3), np.uint8)
        img[10:20, 28:36] = 255  # patch above center
        out = rotate_image(img, 90.0)  # CCW: patch moves to the left side
        ys, xs = np.nonzero(out[..., 0] > 128)
        assert xs.mean() < 28 and abs(ys.mean() - 31.5) < 4


def _extractor():
    return FeatureExtractor(HandcraftedExtractor(), resize=None)


def _run_variant(tracker, camera, frames, gt, skip=1):
    tracker.camera = camera
    tracker.run(frames)
    errs = []
    for i, (name, _) in enumerate(frames):
        rec = tracker.pose_history[name]
        T = Pose.from_4x4(jnp.asarray(rec["T_refined"], jnp.float32))
        errs.append(pose_error(T, gt[i]))
    return errs[skip:]


class TestLineage:
    def test_r5_static_disk_refs(self, world, mapping_dir):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tr = make_tracker_r5(
            scene, _extractor(), mapping_dir,
            align_cfg=AlignConfig(num_iters=50, robust_c=1.0),
        )
        tr.config.covis_threshold = 10
        tr.config.cost_threshold_min = 0.2
        errs = _run_variant(tr, camera, frames, gt)
        assert np.median([e[0] for e in errs]) < 10.0, errs
        assert np.median([e[1] for e in errs]) < 0.3, errs

    def test_r1_fixed_reference(self, world, mapping_dir):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tr = make_tracker_r1(
            scene, _extractor(), mapping_dir,
            align_cfg=AlignConfig(num_iters=50, robust_c=1.0),
        )
        tr.config.cost_threshold_min = 0.2
        first_ref = list(tr.reference_ids)
        _run_variant(tr, camera, frames[:3], gt)
        assert tr.reference_ids == first_ref  # never re-selects

    def test_r6_render_at_db_pose(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tr = make_tracker_r6(
            scene, _extractor(), testbed, nerf2sfm,
            align_cfg=AlignConfig(num_iters=50, robust_c=1.0),
        )
        tr.config.covis_threshold = 10
        tr.config.cost_threshold_min = 0.2
        errs = _run_variant(tr, camera, frames, gt)
        assert np.median([e[0] for e in errs]) < 8.0, errs

    def test_r3_roll_tracking(self, world, mapping_dir):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tr = make_tracker_r3(
            scene, _extractor(), mapping_dir, up_world=(0.0, 1.0, 0.0),
            align_cfg=AlignConfig(num_iters=50, robust_c=1.0),
        )
        tr.config.covis_threshold = 10
        tr.config.cost_threshold_min = 0.2
        errs = _run_variant(tr, camera, frames, gt)
        assert np.median([e[0] for e in errs]) < 10.0, errs
        # roll is recorded in every pose record (the r3 output contract)
        rec = tr.pose_history[frames[-1][0]]
        assert "tracked_roll" in rec and "tracked_center" in rec
