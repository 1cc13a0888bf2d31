"""Tests for the asset-creation pipeline: detect, match, triangulate, augment."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.mapping.augment import (
    augment_scene,
    augmented_name,
    rotation_affine,
    verify_augmentation_consistency,
)
from pixtrack_tpu.mapping.detector import detect_and_describe, detect_keypoints
from pixtrack_tpu.mapping.matcher import (
    epipolar_filter,
    exhaustive_pairs,
    match_descriptors,
)
from pixtrack_tpu.mapping.triangulate import build_tracks, triangulate_scene

from synthetic_world import (
    _BLOB_CENTERS_GRID,
    _BLOB_RADII_GRID,
    _grid_to_sfm,
    build_world,
    look_at_w2c,
    make_testbed,
)
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.tracking.render_bridge import render_nerf_view


@pytest.fixture(scope="module")
def views():
    """A few rendered views of the blob with GT poses."""
    res = 160
    camera = Camera.pinhole(res * 1.2, res * 1.2, (res - 1) / 2, (res - 1) / 2, res, res)
    testbed = make_testbed()
    nerf2sfm = NerfTransform.identity()
    poses = []
    images = []
    for i in range(5):
        ang = 0.15 * i
        center = 1.6 * np.array([np.sin(ang), 0.15, np.cos(ang)])
        T = look_at_w2c(center)
        poses.append(T)
        images.append(render_nerf_view(testbed, nerf2sfm, T, camera, spp=1))
    return camera, poses, images


class TestDetector:
    def test_detect_on_checkerboard(self):
        img = np.zeros((96, 96), np.float32)
        img[::2] = 0  # base
        sq = 12
        for i in range(0, 96, sq):
            for j in range(0, 96, sq):
                if (i // sq + j // sq) % 2 == 0:
                    img[i : i + sq, j : j + sq] = 1.0
        kp, scores = detect_keypoints(img, max_keypoints=200, border=8, nms_radius=3)
        assert len(kp) > 20
        # corners should be near multiples of sq
        rounded = np.abs((kp - 0.0) % sq)
        near = np.minimum(rounded, sq - rounded)
        assert np.median(near.max(axis=1)) < 2.5

    def test_detect_describe_shapes(self, views):
        camera, poses, images = views
        kp, sc, desc = detect_and_describe(images[0], max_keypoints=256, nms_radius=2)
        assert kp.shape[1] == 2
        assert len(kp) == len(sc) == len(desc)
        norms = np.linalg.norm(desc, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestMatcher:
    def test_self_match_identity(self, views):
        camera, poses, images = views
        kp, sc, desc = detect_and_describe(images[0], max_keypoints=256, nms_radius=2)
        m0, s0 = match_descriptors(desc, desc, ratio=1.1)
        matched = m0 >= 0
        assert matched.mean() > 0.9
        np.testing.assert_array_equal(m0[matched], np.nonzero(matched)[0])

    def test_cross_view_matching(self, views):
        camera, poses, images = views
        kp0, _, d0 = detect_and_describe(images[0], max_keypoints=512, nms_radius=2)
        kp1, _, d1 = detect_and_describe(images[1], max_keypoints=512, nms_radius=2)
        m0, s0 = match_descriptors(d0, d1)
        assert (m0 >= 0).sum() > 12, f"only {(m0 >= 0).sum()} matches"

    def test_gated_matching_vetoes_aliases(self):
        """match_descriptors_gated must reject a fine-descriptor alias whose
        coarse gate disagrees, and keep the true pair (the cross-face-alias
        veto, assets/negative/descriptor_ab_r4_eval.json protocol)."""
        from pixtrack_tpu.mapping.matcher import match_descriptors_gated

        rng = np.random.default_rng(0)
        fine = rng.normal(size=(4, 16)).astype(np.float32)
        fine /= np.linalg.norm(fine, axis=1, keepdims=True)
        # view-1 keypoint 2 is a near-exact fine-descriptor alias of
        # keypoint 0 (an EXACT tie slips the distance-ratio test through
        # its 1e-12 epsilon floor — d_best = 0 passes any ratio)
        f1 = fine.copy()
        f1[0] = fine[0] + 0.02 * fine[2]   # true match, slightly off
        f1[2] = fine[0] + 0.02 * fine[1]   # alias, equally close
        f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
        coarse = np.eye(4, dtype=np.float32)  # distinct per keypoint
        c1 = coarse.copy()
        # without the gate, 0 -> {0, 2} is ambiguous: ratio test kills it
        m_plain, _ = match_descriptors(fine, f1, ratio=0.95)
        assert m_plain[0] == -1
        # the gate vetoes the alias (coarse sim 0 < tau), rescuing the match
        m_gated, _ = match_descriptors_gated(
            fine, f1, coarse, c1, gate_threshold=0.5, ratio=0.95
        )
        assert m_gated[0] == 0
        # and a keypoint whose ONLY candidate is gate-vetoed stays unmatched
        m_cross, _ = match_descriptors_gated(
            fine[:1], f1[2:3], coarse[:1], c1[1:2], gate_threshold=0.5
        )
        assert m_cross[0] == -1

    def test_epipolar_filter_keeps_true_matches(self, views):
        camera, poses, images = views
        kp0, _, d0 = detect_and_describe(images[0], max_keypoints=512, nms_radius=2)
        kp1, _, d1 = detect_and_describe(images[1], max_keypoints=512, nms_radius=2)
        m0, _ = match_descriptors(d0, d1)
        K = np.asarray(camera.K(), np.float64)
        T01 = poses[1] @ poses[0].inv()
        m_f = epipolar_filter(
            kp0, kp1, m0, K, K,
            np.asarray(T01.R, np.float64), np.asarray(T01.t, np.float64),
            threshold_px=3.0,
        )
        kept = (m_f >= 0).sum()
        total = (m0 >= 0).sum()
        assert kept > 0.5 * total, f"epipolar filter kept {kept}/{total}"

    def test_exhaustive_pairs(self):
        assert len(exhaustive_pairs(["a", "b", "c"])) == 3


class TestTriangulation:
    def test_end_to_end_scene(self, views):
        camera, poses, images = views
        from pixtrack_tpu.sfm import colmap_io

        kps, descs = {}, {}
        for i, img in enumerate(images):
            kp, _, d = detect_and_describe(img, max_keypoints=512, nms_radius=2)
            kps[i + 1] = kp + 0.5  # store corner-convention like COLMAP h5
            descs[i + 1] = d
        matches = {}
        K = np.asarray(camera.K(), np.float64)
        for (a, b) in exhaustive_pairs(list(range(1, 6))):
            m0, _ = match_descriptors(descs[a], descs[b])
            Tab = poses[b - 1] @ poses[a - 1].inv()
            m0 = epipolar_filter(
                kps[a] - 0.5, kps[b] - 0.5, m0, K, K,
                np.asarray(Tab.R, np.float64), np.asarray(Tab.t, np.float64),
            )
            matches[(a, b)] = m0

        cam_rec = {
            1: colmap_io.CameraRecord(
                1, "PINHOLE", 160, 160,
                np.array([160 * 1.2, 160 * 1.2, 80.0, 80.0]),
            )
        }
        image_meta = {}
        for i, T in enumerate(poses):
            q, t = T.to_quat_t()
            image_meta[i + 1] = {
                "name": f"v{i}.png",
                "qvec": np.asarray(q), "tvec": np.asarray(t), "camera_id": 1,
            }
        scene = triangulate_scene(image_meta, kps, matches, cam_rec)
        assert len(scene.point_ids) > 10, f"only {len(scene.point_ids)} points"
        # triangulated points must lie near the blob surface
        centers = _grid_to_sfm(_BLOB_CENTERS_GRID)
        radii = _BLOB_RADII_GRID * 3.0  # grid -> sfm scale
        d = np.linalg.norm(scene.xyz[:, None, :] - centers[None], axis=-1)
        surf_dist = np.abs(d - radii[None]).min(axis=1)
        assert np.median(surf_dist) < 0.03, f"median surface dist {np.median(surf_dist)}"
        # reprojection errors recorded small
        assert np.median(scene.point_errors) < 2.0

    def test_build_tracks_rejects_inconsistent(self):
        kps = {1: np.zeros((3, 2)), 2: np.zeros((3, 2)), 3: np.zeros((3, 2))}
        matches = {
            (1, 2): np.array([0, -1, -1]),
            (2, 3): np.array([0, -1, -1]),
            # inconsistent: links kp1 of img1 into the same track twice
        }
        tracks = build_tracks(kps, matches)
        assert tracks == [[(1, 0), (2, 0), (3, 0)]]


class TestAugmentation:
    def test_affine_rotates_center_fixed(self):
        M = rotation_affine(90, 100, 80)
        center = np.array([50, 40, 1.0])
        np.testing.assert_allclose(M @ center, [50, 40], atol=1e-9)

    def test_augmented_scene_consistency(self, views):
        camera, poses, images = views
        from pixtrack_tpu.sfm import colmap_io
        from synthetic_world import make_scene

        scene = make_scene(camera, n_refs=4, n_points=200)
        aug = augment_scene(scene, angles=(90, 180))
        assert len(aug.images) == 3 * len(scene.images)
        # every augmented image's projections land on its rotated keypoints
        err = verify_augmentation_consistency(scene, aug)
        assert err < 1.0, f"augmentation reprojection discrepancy {err}px"
        # tracks got longer
        assert aug.track_lengths.sum() == 3 * scene.track_lengths.sum()
        assert augmented_name("img.png", 90) == "img_rot090.png"

    def test_augmented_scene_io_roundtrip(self, views, tmp_path):
        camera, poses, images = views
        from synthetic_world import make_scene
        from pixtrack_tpu.sfm.scene import SceneModel

        scene = make_scene(camera, n_refs=3, n_points=100)
        aug = augment_scene(scene, angles=(120,))
        aug.save(tmp_path)
        aug2 = SceneModel.load(tmp_path)
        assert len(aug2.images) == len(aug.images)
        np.testing.assert_allclose(aug2.xyz, aug.xyz)
