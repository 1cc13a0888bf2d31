"""Realistic-imaging robustness suite (VERDICT r1 #5).

Tracks a textured mesh object through nuisance-corrupted query videos with
the FULL production tracker (exact mesh-rendered references via
MeshTestbed, so every error is caused by the query-side nuisance): noise,
exposure/lighting shifts, gamma, motion blur, cluttered backgrounds,
partial occlusion. Stand-in for the unreachable premier_protein / YCB-Video
eval configs (BASELINE.json 2/4; reference
pixtrack/pose_trackers/pixloc_tracker_ycb.py:285,297-303).

The default test runs a mild nuisance mix as a regression gate; the
slow-marked sweep records per-nuisance success rates and ADD-AUC.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.eval.metrics import evaluate_trajectory
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.tracking import PixTrackTracker, TrackerConfig

from mesh_world import apply_query_nuisances, build_mesh_world, clutter_background


@pytest.fixture(scope="module")
def mesh_world(tmp_path_factory):
    return build_mesh_world(
        tmp_path_factory.mktemp("meshworld"), res=192, n_frames=10
    )


def _make_tracker(mesh_world, extractor=None):
    scene, testbed, nerf2sfm, camera, gt, frames, mesh = mesh_world
    # strides (1, 4): at 192 px the stride-16 coarse map is 12x12 —
    # degenerate for the cube's concentrated texture; the coarse level
    # throws the LM and the finer levels never recover (the small-image
    # rule from the r1 perf notes)
    extractor = extractor or FeatureExtractor(
        HandcraftedExtractor(strides=(1, 4)), resize=None
    )
    cfg = TrackerConfig(
        reference_scale=1.0, cold_multiscale=(1,), steady_multiscale=(1,),
        covis_threshold=5, cost_threshold_min=0.08, refine_rounds=2,
        upright_ref_img="ref_0000.png",
    )
    tracker = PixTrackTracker(
        scene, extractor, testbed, nerf2sfm, cfg,
        align_cfg=AlignConfig(num_iters=60, robust_c=1.0),
    )
    tracker.camera = camera
    return tracker


def _track_and_score(mesh_world, nuisance_kwargs, seed=0):
    scene, testbed, nerf2sfm, camera, gt, frames, mesh = mesh_world
    rng = np.random.default_rng(seed)
    bg = clutter_background(np.asarray(frames[0][1]).shape, seed=seed)
    corrupted = [
        (name, apply_query_nuisances(img, alpha, rng, background=bg,
                                     **nuisance_kwargs))
        for name, img, alpha in frames
    ]
    tracker = _make_tracker(mesh_world)
    tracker.run(corrupted)

    est, gts = [], []
    for i, (name, _) in enumerate(corrupted):
        rec = tracker.pose_history[name]
        T = rec["T_refined"]
        est.append((T[:3, :3], T[:3, 3]))
        gts.append((np.asarray(gt[i].R), np.asarray(gt[i].t)))
    summ = evaluate_trajectory(est, gts, model_points=scene.xyz,
                               add_auc_threshold=0.1)
    succ = np.mean([tracker.pose_history[n]["success"] for n, _ in corrupted])
    summ["tracker_success_rate"] = float(succ)
    return summ


class TestRobustness:
    def test_clean_baseline(self, mesh_world):
        """Sanity: the tracker nails the clean mesh video (errors here are
        tracking-machinery bugs, not robustness)."""
        summ = _track_and_score(mesh_world, dict())
        assert summ["median_r_deg"] < 2.0, summ
        assert summ["tracker_success_rate"] >= 0.9, summ

    def test_mild_nuisances(self, mesh_world):
        """Clutter + mild photometric shift + noise.

        Measured with the handcrafted pyramid (r2): median 16 deg rot err,
        ADD-S AUC 0.61 — the quantified version of VERDICT r1 #1
        ("handcrafted gradients/DoG will not survive real lighting, blur,
        and background clutter"). Gates pin survival, not quality; the
        learned-features task owns tightening them."""
        summ = _track_and_score(
            mesh_world,
            dict(noise=0.02, gain=1.15, bias=0.03, gamma=1.1, blur_len=3),
        )
        assert summ["median_r_deg"] < 25.0, summ
        assert summ["add_s_auc"] > 0.4, summ
        assert summ["tracker_success_rate"] >= 0.3, summ

    @pytest.mark.slow
    def test_nuisance_sweep(self, mesh_world):
        """Per-nuisance sweep; prints the table the README cites."""
        grid = {
            "clean": dict(),
            "noise": dict(noise=0.05),
            "exposure": dict(gain=1.4, bias=0.08, gamma=1.25),
            "blur": dict(blur_len=7),
            "occlusion": dict(occluder_frac=0.25),
            "combined": dict(noise=0.03, gain=1.2, bias=0.05, gamma=1.15,
                             blur_len=5, occluder_frac=0.15),
        }
        results = {}
        for name, kw in grid.items():
            summ = _track_and_score(mesh_world, kw, seed=1)
            results[name] = {
                "median_r_deg": round(summ["median_r_deg"], 2),
                "median_t": round(summ["median_t"], 4),
                "success_rate": round(summ["tracker_success_rate"], 2),
                "add_auc": round(summ.get("add_auc", float("nan")), 3),
            }
            print(f"[robustness] {name}: {results[name]}")
        # the tracker must survive every single-nuisance axis
        for name in ("clean", "noise", "exposure", "blur", "occlusion"):
            assert results[name]["success_rate"] >= 0.6, (name, results)
