"""Tests for COLMAP IO, database, feature store, and SceneModel."""

import numpy as np
import pytest

from pixtrack_tpu.sfm import colmap_io, feature_store
from pixtrack_tpu.sfm.database import ColmapDatabase, create_db_from_scene, pair_id_from_image_ids, image_ids_from_pair_id
from pixtrack_tpu.sfm.scene import SceneModel


def make_synthetic_model(rng, n_images=6, n_points=50):
    """A consistent little scene: cameras on a ring looking at points near origin."""
    cameras = {
        1: colmap_io.CameraRecord(1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320.0, 240.0, 0.001]))
    }
    xyz = rng.normal(size=(n_points, 3)) * 0.3
    images = {}
    tracks = {k: ([], []) for k in range(n_points)}
    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        center = np.array([2 * np.sin(ang), 0.3, 2 * np.cos(ang)])
        # camera looks at origin
        z = -center / np.linalg.norm(center)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)  # world->cam rows
        t = -R @ center
        # quaternion from R
        from scipy.spatial.transform import Rotation as SR

        q = SR.from_matrix(R).as_quat()  # xyzw
        qvec = np.array([q[3], q[0], q[1], q[2]])
        # observations: subset of points
        obs_ids = rng.choice(n_points, size=min(30, n_points), replace=False)
        xys = rng.uniform(0, 600, size=(len(obs_ids), 2))
        p3d_ids = obs_ids.astype(np.int64)
        for row, pid in enumerate(obs_ids):
            tracks[pid][0].append(i + 1)
            tracks[pid][1].append(row)
        images[i + 1] = colmap_io.ImageRecord(
            i + 1, qvec, t, 1, f"frame_{i:04d}.png", xys, p3d_ids
        )
    points = {}
    for pid in range(n_points):
        iids, idxs = tracks[pid]
        if not iids:
            continue
        points[pid] = colmap_io.Point3DRecord(
            pid, xyz[pid], np.array([200, 100, 50], np.uint8), 0.5,
            np.array(iids, np.int32), np.array(idxs, np.int32),
        )
    return cameras, images, points


class TestColmapIO:
    @pytest.mark.parametrize("ext", [".bin", ".txt"])
    def test_roundtrip(self, rng, tmp_path, ext):
        cams, imgs, pts = make_synthetic_model(rng)
        colmap_io.write_model(cams, imgs, pts, tmp_path, ext)
        cams2, imgs2, pts2 = colmap_io.read_model(tmp_path, ext)
        assert set(cams2) == set(cams)
        assert cams2[1].model == "SIMPLE_RADIAL"
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        assert set(imgs2) == set(imgs)
        for iid in imgs:
            np.testing.assert_allclose(imgs2[iid].qvec, imgs[iid].qvec)
            np.testing.assert_allclose(imgs2[iid].xys, imgs[iid].xys)
            np.testing.assert_array_equal(imgs2[iid].point3D_ids, imgs[iid].point3D_ids)
            assert imgs2[iid].name == imgs[iid].name
        assert set(pts2) == set(pts)
        for pid in pts:
            np.testing.assert_allclose(pts2[pid].xyz, pts[pid].xyz)
            np.testing.assert_array_equal(pts2[pid].image_ids, pts[pid].image_ids)

    def test_bin_matches_reference_layout(self, rng, tmp_path):
        """Parse our own bin files with an independent struct-based reader to
        pin the byte layout (guards against silent format drift)."""
        import struct

        cams, imgs, pts = make_synthetic_model(rng, n_images=2, n_points=5)
        colmap_io.write_model(cams, imgs, pts, tmp_path, ".bin")
        raw = (tmp_path / "cameras.bin").read_bytes()
        (n,) = struct.unpack_from("<Q", raw, 0)
        assert n == 1
        cam_id, model_id, w, h = struct.unpack_from("<iiQQ", raw, 8)
        assert (cam_id, model_id, w, h) == (1, 2, 640, 480)
        params = struct.unpack_from("<4d", raw, 8 + 4 + 4 + 16)
        np.testing.assert_allclose(params, cams[1].params)


class TestDatabase:
    def test_pair_id_roundtrip(self):
        assert image_ids_from_pair_id(pair_id_from_image_ids(3, 7)) == (3, 7)
        assert pair_id_from_image_ids(7, 3) == pair_id_from_image_ids(3, 7)

    def test_db_roundtrip(self, rng, tmp_path):
        db_path = tmp_path / "database.db"
        with ColmapDatabase(db_path) as db:
            cam_id = db.add_camera(2, 640, 480, np.array([500.0, 320, 240, 0.0]))
            i1 = db.add_image("a.png", cam_id)
            i2 = db.add_image("b.png", cam_id)
            kp = rng.uniform(0, 640, (100, 2)).astype(np.float32)
            db.add_keypoints(i1, kp)
            db.add_keypoints(i2, kp + 1)
            m = np.stack([np.arange(40), np.arange(40) + 5], axis=1)
            db.add_matches(i1, i2, m)
            db.add_two_view_geometry(i1, i2, m)
        with ColmapDatabase(db_path) as db:
            kp2 = db.get_keypoints(i1)
            assert kp2.shape == (100, 4)  # extended to affine
            np.testing.assert_allclose(kp2[:, :2], kp)
            m2 = db.get_matches(i1, i2)
            np.testing.assert_array_equal(m2, m)
            # reversed query flips columns back
            m3 = db.get_matches(i2, i1)
            np.testing.assert_array_equal(m3, m[:, ::-1])
            assert db.image_name_to_id() == {"a.png": i1, "b.png": i2}

    def test_create_db_from_scene(self, rng, tmp_path):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        db = create_db_from_scene(scene, tmp_path / "db.db")
        assert db.image_name_to_id()["frame_0000.png"] == 1
        db.close()


class TestFeatureStore:
    def test_features_roundtrip(self, rng, tmp_path):
        p = tmp_path / "features.h5"
        kp = rng.uniform(0, 640, (77, 2)).astype(np.float32)
        desc = rng.normal(size=(77, 128)).astype(np.float32)
        feature_store.write_features(p, "dir/img.png", kp, desc, image_size=(640, 480))
        d = feature_store.read_features(p, "dir/img.png")
        np.testing.assert_allclose(d["keypoints"], kp)
        np.testing.assert_allclose(d["descriptors"], desc)
        assert feature_store.list_feature_names(p) == ["dir/img.png"]

    def test_matches_roundtrip(self, rng, tmp_path):
        p = tmp_path / "matches.h5"
        m0 = np.full(50, -1, np.int32)
        m0[5] = 10
        m0[6] = 11
        feature_store.write_matches(p, "a.png", "b.png", m0)
        m, _ = feature_store.read_matches(p, "a.png", "b.png")
        np.testing.assert_array_equal(m, m0)
        pairs = feature_store.matches_as_pairs(m)
        np.testing.assert_array_equal(pairs, [[5, 10], [6, 11]])


class TestSceneModel:
    def test_basic(self, rng, tmp_path):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        assert len(scene.image_ids) == 6
        assert scene.name2id["frame_0002.png"] == 3
        # pose: camera center should be on the ring (radius ~2.02)
        T = scene.pose_w2c(1)
        c = np.asarray(T.center)
        assert abs(np.linalg.norm(c) - np.linalg.norm([2 * 0, 0.3, 2])) < 1e-3

    def test_covisibility_symmetry(self, rng):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        cov = scene.covisibility().toarray()
        assert (cov == cov.T).all()
        assert (np.diag(cov) == 0).all()
        # each pair of images shares *some* points with 30/50 sampling
        assert cov.max() > 0

    def test_point_selection_and_packing(self, rng):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        idx = scene.p3d_indices_for_images([1], min_track_length=1)
        assert len(idx) == 30  # each image observes 30 points
        xyz, mask = scene.pack_points(idx, pad_multiple=64)
        assert xyz.shape == (64, 3)
        assert mask.sum() == 30
        # min_track_length filter reduces the set
        idx2 = scene.p3d_indices_for_images([1], min_track_length=5)
        assert len(idx2) <= len(idx)

    def test_save_load_roundtrip(self, rng, tmp_path):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        scene.save(tmp_path)
        scene2 = SceneModel.load(tmp_path)
        np.testing.assert_allclose(scene2.xyz, scene.xyz)
        assert scene2.names == scene.names
        np.testing.assert_array_equal(
            scene2.covisibility().toarray(), scene.covisibility().toarray()
        )

    def test_covisibility_dict_format(self, rng, tmp_path):
        cams, imgs, pts = make_synthetic_model(rng)
        scene = SceneModel(cams, imgs, pts)
        d = scene.covisibility_dict()
        assert set(d.keys()) == set(scene.names)
        some = d["frame_0000.png"]
        assert all(isinstance(v, int) for v in some.values())
        import pickle

        scene.save_covisibility(tmp_path / "covis.pkl")
        with open(tmp_path / "covis.pkl", "rb") as f:
            d2 = pickle.load(f)
        assert d2 == d
