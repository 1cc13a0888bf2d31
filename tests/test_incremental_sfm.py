"""Incremental (unposed) SfM: recover a synthetic camera rig up to a
similarity transform — the COLMAP-mapper-role test.

Two rig scales: a FAST default (16 views at 192 px — the regression gate,
runs in ~2-4 min on this box) and the FULL 24-view 256 px rig from round 1,
slow-marked (>9 min serial; run with ``-m slow``)."""

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


def _render_cube_rig(tmp_path, n_views: int, res: int):
    """Unposed ring of a textured cube (the mesh-render world: rich in
    corners, like real captured objects — the blob world's smooth texture
    yields too few stable keypoints for any SfM)."""
    from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
    from test_mesh_render import make_cube_obj

    mesh = load_obj(make_cube_obj(tmp_path))
    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                            (res - 1) / 2, res, res)
    views, gt_poses = {}, {}
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
    return views, gt_poses, cam_rec


def _check_rig_reconstruction(
    rec, gt_poses, n_views: int,
    min_registered: int, min_points: int,
    pairwise_gate_deg: float, global_gate_deg: float,
    center_gate_frac: float, reproj_gate_px: float,
):
    assert len(rec.images) >= min_registered, f"registered {len(rec.images)}"
    assert len(rec.points3D) > min_points

    # relative-rotation consistency vs GT (gauge-invariant)
    ids = sorted(rec.images)
    errs = []
    for a in range(len(ids) - 1):
        i, j = ids[a], ids[a + 1]
        R_est = np.asarray(rec.pose_w2c(j).R) @ np.asarray(rec.pose_w2c(i).R).T
        R_gt = np.asarray(gt_poses[j].R) @ np.asarray(gt_poses[i].R).T
        errs.append(_rot_deg(R_est, R_gt))
    assert np.median(errs) < pairwise_gate_deg, errs

    # gauge-correct GLOBAL consistency: D_i = R_gt_i^T R_est_i must be one
    # constant rotation (comparing R_est R_gt^T instead conjugates the
    # gauge and reads as fake error)
    D = {
        i: np.asarray(gt_poses[i].R).T @ np.asarray(rec.pose_w2c(i).R)
        for i in ids
    }
    ref = min(
        ids, key=lambda i: np.median([_rot_deg(D[i], D[j]) for j in ids])
    )
    global_devs = [_rot_deg(D[i], D[ref]) for i in ids]
    assert np.median(global_devs) < global_gate_deg, global_devs

    # camera centers after similarity alignment
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
    assert np.median(cerr) < center_gate_frac * np.linalg.norm(
        G0, axis=1
    ).mean(), cerr

    # mean reprojection error of the model (self-consistency)
    assert np.mean(rec.point_errors) < reproj_gate_px, np.mean(rec.point_errors)
    return np.median(global_devs), np.median(cerr), np.mean(rec.point_errors)


class TestIncrementalSfM:
    def test_reconstructs_partial_arc_fast(self, tmp_path):
        """6 views over a 110 deg arc at 160 px (22 deg baselines): the
        default mapper regression gate, sized for the fast tier (VERDICT
        r4 #7 — the decisive gates must run on every change; the r4 8-view
        176 px version took ~200 s alone on this 1-core box; 17-deg steps
        over only 6 views left the similarity-aligned centers too weakly
        conditioned for the gate). The richer 10-view 192 px arc and the
        24-view 256 px ring + loop closure are pinned by the slow tier; a
        full 360 ring at 192 px is NOT reliable with the handcrafted
        detector (22.5 deg baselines mis-assemble; measured 100 deg+
        pairwise breaks)."""
        from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
        from test_mesh_render import make_cube_obj

        mesh = load_obj(make_cube_obj(tmp_path))
        res = 160
        camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                                (res - 1) / 2, res, res)
        views, gt_poses = {}, {}
        for i in range(6):
            ang = np.deg2rad(22.0) * i
            center = 0.9 * np.array(
                [np.sin(ang), 0.4 + 0.1 * np.sin(2 * ang), np.cos(ang)]
            )
            T = look_at_w2c(center)
            views[i + 1] = render_mesh(mesh, T, camera)
            gt_poses[i + 1] = T
        cam_rec = colmap_io.CameraRecord(
            1, "PINHOLE", res, res,
            np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
        )
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=512, nms_radius=1, verbose=True,
            match_kw=dict(min_score=0.5, ratio=0.98),
        )
        _check_rig_reconstruction(
            rec, gt_poses, 6,
            min_registered=5, min_points=80,
            pairwise_gate_deg=5.0, global_gate_deg=8.0,
            center_gate_frac=0.25, reproj_gate_px=1.0,
        )

    @pytest.mark.slow
    def test_reconstructs_arc_10view_192px(self, tmp_path):
        """The 10-view 192 px arc whose numbers are quoted in
        ARCHITECTURE.md. History: r2 (no culling) global median 2.9 deg,
        0.53 px; r4 observation culling (the oracle error budget in
        assets/sfm_error_budget.json showed surviving match mistakes cost
        ~1.7 deg while the geometry stack is exact) -> 1.19 deg, 0.46 px —
        at the oracle-matching bound. With featuremetric KA on top the
        pipeline is sub-degree (see test_arc_10view_ka_subdegree)."""
        from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
        from test_mesh_render import make_cube_obj

        mesh = load_obj(make_cube_obj(tmp_path))
        res = 192
        camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                                (res - 1) / 2, res, res)
        views, gt_poses = {}, {}
        for i in range(10):
            ang = np.deg2rad(17.0) * i
            center = 0.9 * np.array(
                [np.sin(ang), 0.4 + 0.1 * np.sin(2 * ang), np.cos(ang)]
            )
            T = look_at_w2c(center)
            views[i + 1] = render_mesh(mesh, T, camera)
            gt_poses[i + 1] = T
        cam_rec = colmap_io.CameraRecord(
            1, "PINHOLE", res, res,
            np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
        )
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=768, nms_radius=1, verbose=True,
            match_kw=dict(min_score=0.5, ratio=0.98),
        )
        _check_rig_reconstruction(
            rec, gt_poses, 10,
            min_registered=9, min_points=150,
            pairwise_gate_deg=5.0, global_gate_deg=2.0,
            center_gate_frac=0.08, reproj_gate_px=0.7,
        )

    @pytest.mark.slow
    def test_arc_10view_ka_subdegree(self, tmp_path):
        """The headline accuracy gate (VERDICT r2 #4 / r4 #6): observation
        culling + featuremetric KA + the final featuremetric-BA polish
        reach SUB-DEGREE global rotation and sub-0.3 px reprojection on
        the 10-view arc (measured: r4 0.92 deg with culling+KA; r5 0.837
        deg with featuremetric_ba rounds=2 on top) — the pixel-perfect-SfM
        territory of reference scripts/run_reconstruction.py:52-61.

        r5 floor investigation (scripts_dev/fmba_experiment.py): the
        remaining ~0.8 deg is PER-VIEW pose noise (pairwise relative
        rotations off by 0.24-1.56 deg, median 0.81, with uncorrelated
        axes), i.e. the pose-vs-structure trade-off of near-planar
        per-view observation sets — NOT residual keypoint noise. Five
        refinement families (fmba rounds sweep, KA-round-2 on converged
        structure incl. 2x-upsampled features, extra BA at two robust
        widths, warp-compensated photometric LK with planarity gating)
        all move camera CENTERS 2-3x closer (0.070 -> 0.019-0.026 of rig
        radius) but none breaks the ~0.84 deg rotation floor; sub-0.5 deg
        on THIS rig would need denser per-view coverage, not better
        localization."""
        from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
        from test_mesh_render import make_cube_obj

        mesh = load_obj(make_cube_obj(tmp_path))
        res = 192
        camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                                (res - 1) / 2, res, res)
        views, gt_poses = {}, {}
        for i in range(10):
            ang = np.deg2rad(17.0) * i
            center = 0.9 * np.array(
                [np.sin(ang), 0.4 + 0.1 * np.sin(2 * ang), np.cos(ang)]
            )
            T = look_at_w2c(center)
            views[i + 1] = render_mesh(mesh, T, camera)
            gt_poses[i + 1] = T
        cam_rec = colmap_io.CameraRecord(
            1, "PINHOLE", res, res,
            np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
        )
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=768, nms_radius=1,
            match_kw=dict(min_score=0.5, ratio=0.98),
            featuremetric_ka=True,
            featuremetric_ba_rounds=2,  # the reconstruct CLI default
        )
        _check_rig_reconstruction(
            rec, gt_poses, 10,
            min_registered=9, min_points=150,
            pairwise_gate_deg=3.0, global_gate_deg=1.1,
            center_gate_frac=0.08, reproj_gate_px=0.35,
        )

    def test_reconstruct_with_featuremetric_ka(self, tmp_path):
        """The pixsfm keypoint-adjustment role wired into the mapper
        (featuremetric_ka=True, the `reconstruct` CLI default): verified
        tracks are feature-metrically refined before any geometry runs.
        Small partial-arc rig (17 deg baselines) — a smoke gate that the KA
        stage composes with the full pipeline."""
        from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
        from test_mesh_render import make_cube_obj

        mesh = load_obj(make_cube_obj(tmp_path))
        res = 144
        camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                                (res - 1) / 2, res, res)
        views, gt_poses = {}, {}
        for i in range(5):
            ang = np.deg2rad(17.0) * i
            center = 0.9 * np.array([np.sin(ang), 0.4, np.cos(ang)])
            T = look_at_w2c(center)
            views[i + 1] = render_mesh(mesh, T, camera)
            gt_poses[i + 1] = T
        cam_rec = colmap_io.CameraRecord(
            1, "PINHOLE", res, res,
            np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
        )
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=448, nms_radius=1,
            match_kw=dict(min_score=0.5, ratio=0.98),
            featuremetric_ka=True,
            featuremetric_ba_rounds=1,  # + the r5 fmba polish composes
        )
        assert len(rec.images) >= 4, f"registered {len(rec.images)}"
        assert len(rec.points3D) > 20
        assert np.mean(rec.point_errors) < 2.0

    @pytest.mark.slow
    def test_reconstructs_textured_object_rig(self, tmp_path):
        """The full 24-view 256 px rig (round-1 gates). With the homography
        +/-t branch fix, pairwise links are ~1-4 deg and the whole ring is
        globally consistent (measured r1: global median 4.7 deg, centers to
        ~7% of the rig radius); gates leave headroom for RANSAC draws."""
        views, gt_poses, cam_rec = _render_cube_rig(tmp_path, 24, 256)
        rec = incremental_sfm(
            views, cam_rec, max_keypoints=1024, nms_radius=1, verbose=True,
            match_kw=dict(min_score=0.5, ratio=0.98),
        )
        _check_rig_reconstruction(
            rec, gt_poses, 24,
            min_registered=16, min_points=50,
            pairwise_gate_deg=10.0, global_gate_deg=12.0,
            center_gate_frac=0.2, reproj_gate_px=1.5,
        )
