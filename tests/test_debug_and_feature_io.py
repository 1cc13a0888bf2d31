"""DebugTracker observer (per-iteration optimizer traces) and the
reference_features.h5 store round-trip + tracker consumption."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.tracking import PixTrackTracker, TrackerConfig
from pixtrack_tpu.tracking.debug import DebugTracker
from pixtrack_tpu.tracking.feature_io import (
    load_reference_features,
    precompute_reference_features,
    save_reference_features,
)
from pixtrack_tpu.tracking.render_bridge import render_nerf_view
from pixtrack_tpu.tracking.variants import StaticRefConfig, StaticRefTracker

from synthetic_world import build_world


@pytest.fixture(scope="module")
def world():
    return build_world(res=96, n_frames=3)


class TestDebugTracker:
    def test_traces_recorded(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        extractor = FeatureExtractor(HandcraftedExtractor(), resize=None)
        cfg = TrackerConfig(
            reference_scale=1.0, cold_multiscale=(1,), steady_multiscale=(1,),
            covis_threshold=10, cost_threshold_min=0.1,
        )
        tracker = PixTrackTracker(
            scene, extractor, testbed, nerf2sfm, cfg,
            align_cfg=AlignConfig(num_iters=25, robust_c=1.0),
        )
        dbg = DebugTracker(debug=1)
        tracker.refiner.attach_tracker(dbg)
        tracker.camera = camera
        for i, q in enumerate(frames):
            dbg.start_frame(q[0])
            tracker.run_single_frame(q)
        assert len(dbg.frames) == 3
        fr = dbg.frames[1]
        assert fr["levels"], "no per-level traces"
        lv = fr["levels"][0]
        assert lv["num_iters"] >= 1
        assert len(lv["costs"]) == lv["num_iters"]
        assert np.isfinite(lv["costs"]).all()
        # costs should not increase over accepted steps (LM is monotone in
        # the accepted sequence)
        acc = lv["costs"][lv["accepted"]]
        if len(acc) > 2:
            assert acc[-1] <= acc[0] + 1e-6
        assert "T_refined" in fr

    def test_debug2_records_dense_maps(self, world):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        extractor = FeatureExtractor(HandcraftedExtractor(), resize=None)
        tracker = PixTrackTracker(
            scene, extractor, testbed, nerf2sfm,
            TrackerConfig(reference_scale=1.0, cold_multiscale=(1,),
                          covis_threshold=10, cost_threshold_min=0.1),
            align_cfg=AlignConfig(num_iters=10, robust_c=1.0),
        )
        dbg = DebugTracker(debug=2)
        tracker.refiner.attach_tracker(dbg)
        tracker.camera = camera
        dbg.start_frame(frames[0][0])
        tracker.run_single_frame(frames[0])
        assert dbg.frames[0]["dense"], "no dense maps at debug=2"
        assert dbg.frames[0]["dense"][0]["fmap"].ndim == 3
        assert "p3d" in dbg.frames[0]


class TestReferenceFeatureStore:
    def test_roundtrip_and_tracker_consumption(self, world, tmp_path):
        scene, testbed, nerf2sfm, camera, gt, frames = world
        extractor = FeatureExtractor(HandcraftedExtractor(), resize=None)
        cfg = StaticRefConfig(
            use_mask=False, cold_multiscale=(1,), steady_multiscale=(1,),
            reference_scale=1.0, covis_threshold=10, cost_threshold_min=0.2,
        )
        tr = StaticRefTracker(
            scene, extractor, testbed, nerf2sfm, cfg,
            align_cfg=AlignConfig(num_iters=25, robust_c=1.0),
        )

        # offline producer: render at each db pose (first 4 refs)
        def render_fn(rid, pose):
            img = render_nerf_view(testbed, nerf2sfm, pose, camera, spp=1)
            return img, camera, None

        path = str(tmp_path / "reference_features.h5")
        precompute_reference_features(
            tr.refiner, scene, render_fn, path, image_ids=scene.image_ids[:4]
        )

        loaded = load_reference_features(path)
        assert len(loaded) == 4
        rid = int(scene.image_ids[0])
        rf = loaded[rid]
        assert rf.p3d.ndim == 2 and len(rf.feats) >= 1
        assert rf.ref_ids == [rid]

        # tracker consumes the h5 instead of extracting
        cfg2 = StaticRefConfig(
            use_mask=False, cold_multiscale=(1,), steady_multiscale=(1,),
            reference_scale=1.0, covis_threshold=10, cost_threshold_min=0.2,
            features_h5=path,
        )
        tr2 = StaticRefTracker(
            scene, extractor, testbed, nerf2sfm, cfg2,
            align_cfg=AlignConfig(num_iters=25, robust_c=1.0),
        )
        assert len(tr2._static_refs) == 4
        tr2.camera = camera
        tr2.run(frames[:2])
        rec = tr2.pose_history[frames[1][0]]
        T = Pose.from_4x4(jnp.asarray(rec["T_refined"], jnp.float32))
        dR, dt = (T @ gt[1].inv()).magnitude()
        assert float(dR) < 10.0
