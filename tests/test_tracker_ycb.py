"""YCBTracker integration test on synthetic frames wrapped in the YCB tuple
protocol (path, image, gt Pose, camera) — tracker-level coverage of the GT
cold start, full-model reference search, 10cm/10deg gating, GT
relocalization, and summary() ADD metrics (reference
pixtrack/pose_trackers/pixloc_tracker_ycb.py:101-130,285,297-303)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.tracking.tracker_ycb import YCBTracker, ycb_tracker_config

from synthetic_world import build_world


@pytest.fixture(scope="module")
def world():
    return build_world(res=128, n_frames=6)


def _ycb_frames(world):
    scene, testbed, nerf2sfm, camera, gt, frames = world
    return [
        (name, img, gt[i], camera) for i, (name, img) in enumerate(frames)
    ]


def _make_tracker(world, **cfg_overrides):
    scene, testbed, nerf2sfm, camera, gt, frames = world
    extractor = FeatureExtractor(HandcraftedExtractor(), resize=None)
    cfg = ycb_tracker_config(
        reference_scale=1.0, cold_multiscale=(1,), steady_multiscale=(1,),
        cost_threshold_min=0.05, refine_rounds=2, **cfg_overrides,
    )
    return YCBTracker(
        scene, extractor, testbed, nerf2sfm, cfg,
        align_cfg=AlignConfig(num_iters=40, robust_c=1.0),
    )


class TestYCBTracker:
    def test_tracks_with_gt_protocol(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tracker = _make_tracker(world)
        seq = _ycb_frames(world)
        tracker.run(seq)

        # per-frame GT errors recorded and within the 10cm/10deg gate
        assert len(tracker.errors) == len(seq)
        rs = [e["r"] for e in tracker.errors]
        ts = [e["t"] for e in tracker.errors]
        assert np.median(rs) < 5.0, rs
        assert np.median(ts) < 0.05, ts
        for rec in tracker.pose_history.values():
            assert {"gt_pose", "t_error", "r_error_deg"} <= set(rec)
            assert rec["success"]

        # summary(): trajectory metrics + ADD/ADD-S with the model cloud
        summ = tracker.summary(model_points=scene.xyz)
        assert summ["mean_r_deg"] < 6.0
        assert {"mean_r_deg", "mean_t"} <= set(summ)
        add_keys = [k for k in summ if "add" in k.lower()]
        assert add_keys, f"no ADD metrics in summary: {sorted(summ)}"

    def test_full_model_reference_search(self, world):
        """Reference selection must pick the geodesic-nearest model image
        over the FULL db (ycb:117-130), not covisibility neighbors."""
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tracker = _make_tracker(world)
        # pose near reference ring position 3 (not a covis neighbor of 1)
        tracker.pose = scene.pose_w2c(scene.image_ids[3])
        tracker.cache_hit = False
        ids = tracker.update_reference_ids()
        assert ids[0] == int(scene.image_ids[3])

    def test_gate_fails_bad_frame_and_relocalizes_to_gt(self, world):
        """A noise frame must fail the 10cm/10deg GT gate; the next frame
        relocalizes by snapping to the dataset GT pose (ycb:101-115)."""
        scene, testbed, nerf2sfm, camera, gt, frames = world
        tracker = _make_tracker(world)
        rng = np.random.default_rng(7)
        seq = _ycb_frames(world)
        noise = ("noise.png",
                 rng.integers(0, 256, (128, 128, 3)).astype(np.uint8),
                 gt[3], camera)
        seq = seq[:3] + [noise] + seq[4:]
        tracker.run(seq)

        assert not tracker.pose_history["noise.png"]["success"]
        assert tracker.relocalization_count >= 1
        # recovered on the following frame (GT snap + refine)
        rec = tracker.pose_history["frame_0004.png"]
        assert rec["success"]
        assert rec["r_error_deg"] < 5.0 and rec["t_error"] < 0.05
