"""End-to-end asset-pipeline + tracking gate (VERDICT r2 #7).

Drives the FULL production CLI chain on the mesh world — the offline
stand-in for the reference's premier_protein run
(images_pipeline.sh:1-4 + run_inference.sh:1-6):

    reconstruct -> train-nerf (short) -> nerf-sfm -> augment
        -> track (production extractor) -> eval

as ONE pipeline at production configuration, asserting the reference
artifact contract (transforms.json, nerf2sfm.pkl, aug_sfm bins,
poses.pkl — SURVEY.md §2.4) and that the tracked trajectory recovers the
ground-truth orbit after similarity (gauge) alignment.

Everything here goes through ``pipelines.cli.main`` with string argv —
the exact surface a user drives — not through library calls.
"""

import json
import pickle

import numpy as np
import pytest

from pixtrack_tpu.geometry import Camera
from pixtrack_tpu.pipelines.assets import layout
from pixtrack_tpu.pipelines.cli import main as cli

from synthetic_world import look_at_w2c
from test_mesh_render import make_cube_obj

RES = 160


def _ring_pose(ang: float, el: float = 0.35):
    center = 0.9 * np.array([np.sin(ang), el, np.cos(ang)])
    return look_at_w2c(center)


def _render_views(mesh, poses, camera, out_dir, prefix):
    import cv2

    from pixtrack_tpu.mapping.mesh_render import render_mesh

    out_dir.mkdir(parents=True, exist_ok=True)
    for i, T in enumerate(poses):
        img = render_mesh(mesh, T, camera)
        cv2.imwrite(
            str(out_dir / f"{prefix}_{i:04d}.png"),
            np.asarray(img)[..., ::-1],
        )


@pytest.mark.slow
def test_full_cli_pipeline(tmp_path):
    from pixtrack_tpu.mapping.mesh_render import load_obj

    obj_dir = tmp_path / "object"
    mesh = load_obj(make_cube_obj(tmp_path))
    # focal matches the reconstruct CLI's un-calibrated camera heuristic
    # (infer_camera_from_image: f = 1.2 * max(w, h)) so the recovered SfM
    # is not biased by an intrinsics mismatch the real pipeline would
    # resolve with EXIF/calibration
    camera = Camera.pinhole(
        1.2 * RES, 1.2 * RES, (RES - 1) / 2, (RES - 1) / 2, RES, RES
    )

    # --- mapping captures: 14-view ring with elevation wobble ------------
    rng = np.random.default_rng(0)
    map_poses = [
        _ring_pose(2 * np.pi * i / 14, el=0.35 + rng.uniform(-0.06, 0.06))
        for i in range(14)
    ]
    raw = tmp_path / "captures"
    _render_views(mesh, map_poses, camera, raw, "map")

    # --- 1. reconstruct (run_reconstruction.py role) ----------------------
    cli(["reconstruct", "--object_path", str(obj_dir),
         "--images", str(raw)])
    paths = layout(obj_dir)
    assert (paths["ref_sfm"] / "images.bin").exists()

    # --- 2. train-nerf (short budget; production is 10k steps) -----------
    cli(["train-nerf", "--object_path", str(obj_dir),
         "--n_steps", "400", "--batch_rays", "8192", "--save_every", "0"])
    assert paths["snapshot"].exists()
    assert paths["transforms"].exists()       # colmap2ingp contract
    assert paths["nerf2sfm"].exists()

    # --- 3. NeRF re-render + triangulation (create_nerf_dataset_and_sfm) -
    cli(["nerf-sfm", "--object_path", str(obj_dir), "--spp", "1"])
    assert (paths["nerf_sfm"] / "points3D.bin").exists()

    # --- 4. rotation augmentation (augment_sfm.py role) -------------------
    cli(["augment", "--object_path", str(obj_dir)])
    assert (paths["aug_sfm"] / "images.bin").exists()
    assert paths["aug_db"].exists()

    # --- 5. track a fresh query orbit (production extractor default) ------
    # starts at the first mapping view's orientation: the tracker
    # cold-starts from the upright reference pose (r9:77-78, 95-106)
    n_q = 8
    q_poses = [_ring_pose(0.05 * i, el=0.35) for i in range(n_q)]
    qdir = tmp_path / "query"
    _render_views(mesh, q_poses, camera, qdir, "frame")
    out_dir = tmp_path / "out"
    cli(["track", "--object_path", str(obj_dir), "--query", str(qdir),
         "--out_dir", str(out_dir)])
    poses_pkl = out_dir / "poses.pkl"
    assert poses_pkl.exists()

    with open(poses_pkl, "rb") as f:
        recs = pickle.load(f)
    assert len(recs) == n_q
    n_ok = sum(bool(r["success"]) for r in recs.values())
    assert n_ok >= n_q - 2, f"only {n_ok}/{n_q} frames tracked"

    # --- 6. evaluate vs ground truth (GetMetrics.ipynb role) --------------
    # tracked poses live in the reconstruct gauge; similarity-align the
    # trajectory onto the GT mesh-frame orbit (Umeyama, metrics.py)
    from pixtrack_tpu.eval.metrics import evaluate_trajectory

    names = sorted(recs)
    est = [(recs[n]["T_refined"][:3, :3], recs[n]["T_refined"][:3, 3])
           for n in names]
    gt = [(np.asarray(T.R), np.asarray(T.t)) for T in q_poses]
    m = evaluate_trajectory(est, gt, align=True)
    # the short 400-step NeRF bounds template quality; the gate is
    # pipeline integrity + a sane pose recovery, not peak accuracy
    # (accuracy at production budgets is pinned by test_robustness /
    # test_incremental_sfm)
    assert m["median_r_deg"] < 15.0, m
    assert m["median_t"] < 0.25, m

    # --- 7. the eval CLI consumes the poses.pkl + GT contract -------------
    for n, T in zip(names, q_poses):
        recs[n]["gt_pose"] = np.asarray(T.to_4x4())
    with open(poses_pkl, "wb") as f:
        pickle.dump(recs, f)
    cli(["eval", "--poses", str(poses_pkl)])


def test_cli_pipeline_smoke_fast(tmp_path):
    """Thinned e2e CLI smoke for the FAST tier (VERDICT r4 #7): the asset
    chain — reconstruct -> train-nerf -> augment — at minimum viable
    scale with the reference artifact contract asserted (SURVEY.md §2.4),
    so a contract break in any stage surfaces on every change. Tracking
    end-to-end in the fast tier is covered by the `demo` subcommand test
    (test_config_cli) — the full-scale default-config chain INCLUDING
    `track` remains test_full_cli_pipeline (slow; the production track
    path's occupied-bounds sweep alone costs minutes on this 1-core CPU
    box)."""
    from pixtrack_tpu.mapping.mesh_render import load_obj
    from pixtrack_tpu.sfm.scene import SceneModel

    res = 160
    obj_dir = tmp_path / "object"
    mesh = load_obj(make_cube_obj(tmp_path))
    camera = Camera.pinhole(
        1.2 * res, 1.2 * res, (res - 1) / 2, (res - 1) / 2, res, res
    )
    # 6-view partial ARC (22-deg steps): full-ring coverage is the slow
    # gate's job; the asset chain's artifact contract doesn't need 360
    # degrees, and arc registration is the proven cheap configuration
    map_poses = [_ring_pose(np.deg2rad(22.0) * i, el=0.35) for i in range(6)]
    raw = tmp_path / "captures"
    _render_views(mesh, map_poses, camera, raw, "map")

    cli(["reconstruct", "--object_path", str(obj_dir), "--images", str(raw),
         "--no-featuremetric", "--max_keypoints", "384"])
    paths = layout(obj_dir)
    assert (paths["ref_sfm"] / "images.bin").exists()
    rec = SceneModel.load(paths["ref_sfm"])
    assert len(rec.images) >= 5 and len(rec.points3D) >= 25, rec  # 160px is the minimum viable scale for the DEFAULT mapper config

    cli(["train-nerf", "--object_path", str(obj_dir), "--n_steps", "8", "--batch_rays", "1024",
         "--n_coarse", "24", "--n_fine", "0", "--save_every", "0"])
    assert paths["snapshot"].exists()
    assert paths["transforms"].exists()       # colmap2ingp contract
    assert paths["nerf2sfm"].exists()

    cli(["augment", "--object_path", str(obj_dir)])
    assert (paths["aug_sfm"] / "images.bin").exists()
    assert paths["aug_db"].exists()
    aug = SceneModel.load(paths["aug_sfm"])
    assert len(aug.images) > len(rec.images)  # rotation-augmented entries
