"""Incremental (unposed) SfM: recover a synthetic camera rig up to a
similarity transform — the COLMAP-mapper-role test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.mapping.incremental import (
    estimate_relative_pose,
    incremental_sfm,
    refine_pose_reprojection,
)
from pixtrack_tpu.sfm import colmap_io

from synthetic_world import build_world, look_at_w2c
from pixtrack_tpu.tracking.render_bridge import render_nerf_view


class TestTwoView:
    def test_relative_pose_recovery(self):
        """Known R, t between two views of random 3D points."""
        rng = np.random.default_rng(0)
        X = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
        X[:, 2] += 3.0
        T0 = Pose.identity()
        T1_gt = Pose.from_aa_t(
            np.asarray([0.05, 0.25, -0.1], np.float32),
            np.asarray([0.8, 0.1, 0.05], np.float32),
        )
        x0 = np.asarray(T0.transform(jnp.asarray(X)))
        x1 = np.asarray(T1_gt.transform(jnp.asarray(X)))
        p0 = x0[:, :2] / x0[:, 2:]
        p1 = x1[:, :2] / x1[:, 2:]
        T01, inl = estimate_relative_pose(p0, p1, jax.random.PRNGKey(0))
        assert inl.mean() > 0.9
        # rotation exact; translation up to scale
        dR, _ = (T01 @ T1_gt.inv()).magnitude()
        assert float(dR) < 0.5, float(dR)
        t_est = np.asarray(T01.t)
        t_gt = np.asarray(T1_gt.t)
        cos = abs(t_est @ t_gt) / (
            np.linalg.norm(t_est) * np.linalg.norm(t_gt)
        )
        assert cos > 0.999

    def test_pose_polish(self):
        rng = np.random.default_rng(1)
        cam = Camera.pinhole(140.0, 140.0, 63.5, 63.5, 128, 128)
        X = jnp.asarray(rng.uniform(-0.3, 0.3, (100, 3)).astype(np.float32))
        T_gt = look_at_w2c(np.array([0.3, 0.2, 1.6]))
        uv, _ = cam.world2image(T_gt, X)
        T0 = T_gt.retract(jnp.asarray([0.03, -0.02, 0.01, 0.02, 0.01, -0.03]))
        T = refine_pose_reprojection(
            T0, X, uv, jnp.ones(100), cam, iters=20
        )
        dR, dt = (T @ T_gt.inv()).magnitude()
        assert float(dR) < 0.05 and float(dt) < 1e-3


def _rot_deg(A, B):
    c = (np.trace(A @ B.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


class TestIncrementalSfM:
    def test_reconstructs_textured_object_rig(self, tmp_path):
        """Unposed ring of a textured cube (the mesh-render world: rich in
        corners, like real captured objects — the blob world's smooth
        texture yields too few stable keypoints for any SfM)."""
        from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
        from test_mesh_render import make_cube_obj

        obj = make_cube_obj(tmp_path)
        mesh = load_obj(obj)
        res = 256
        camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                                (res - 1) / 2, res, res)
        views, gt_poses = {}, {}
        n_views = 24
        for i in range(n_views):
            ang = 2 * np.pi * i / n_views
            center = 0.9 * np.array(
                [np.sin(ang), 0.35 + 0.15 * np.sin(2 * ang), np.cos(ang)]
            )
            T = look_at_w2c(center)
            views[i + 1] = render_mesh(mesh, T, camera)
            gt_poses[i + 1] = T

        cam_rec = colmap_io.CameraRecord(
            1, "PINHOLE", res, res,
            np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
        )
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=1024, nms_radius=1, verbose=True,
            match_kw=dict(min_score=0.5, ratio=0.98),
        )

        assert len(rec.images) >= 16, f"registered only {len(rec.images)}"
        assert len(rec.points3D) > 50

        # relative-rotation consistency vs GT (gauge-invariant). The
        # handcrafted detector/descriptor leaves ~1px localization noise;
        # the chain+BA recovers most links to a few degrees (SuperPoint-
        # class features would tighten this across the board).
        ids = sorted(rec.images)
        errs = []
        for a in range(len(ids) - 1):
            i, j = ids[a], ids[a + 1]
            R_est = np.asarray(rec.pose_w2c(j).R) @ np.asarray(rec.pose_w2c(i).R).T
            R_gt = np.asarray(gt_poses[j].R) @ np.asarray(gt_poses[i].R).T
            cosang = (np.trace(R_est @ R_gt.T) - 1) / 2
            errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        # With the homography +/-t branch fix, pairwise links are ~1-4 deg
        # and the whole ring stays globally consistent (measured r1: global
        # median 4.7 deg, centers to ~7% of the rig radius). Gates leave
        # headroom for RANSAC-draw variation.
        assert np.median(errs) < 10.0, errs

        # gauge-correct GLOBAL consistency: D_i = R_gt_i^T R_est_i must be
        # one constant rotation (comparing R_est R_gt^T instead conjugates
        # the gauge and reads as fake error)
        D = {
            i: np.asarray(gt_poses[i].R).T @ np.asarray(rec.pose_w2c(i).R)
            for i in ids
        }
        ref = min(
            ids,
            key=lambda i: np.median(
                [_rot_deg(D[i], D[j]) for j in ids]
            ),
        )
        global_devs = [_rot_deg(D[i], D[ref]) for i in ids]
        assert np.median(global_devs) < 12.0, global_devs

        # camera centers after similarity alignment: within 20% of radius
        c_est = np.stack([
            -np.asarray(rec.pose_w2c(i).R).T @ np.asarray(rec.pose_w2c(i).t)
            for i in ids
        ])
        c_gt = np.stack([
            -np.asarray(gt_poses[i].R).T @ np.asarray(gt_poses[i].t)
            for i in ids
        ])
        E0 = c_est - c_est.mean(0)
        G0 = c_gt - c_gt.mean(0)
        U, S, Vt = np.linalg.svd(G0.T @ E0)
        Dm = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        sc = np.trace(np.diag(S) @ Dm) / (E0 ** 2).sum()
        cerr = np.linalg.norm(sc * E0 @ (U @ Dm @ Vt).T - G0, axis=1)
        assert np.median(cerr) < 0.2 * np.linalg.norm(G0, axis=1).mean(), cerr

        # mean reprojection error of the model (self-consistency)
        errors = rec.point_errors
        assert np.mean(errors) < 1.5, np.mean(errors)
