"""The PRODUCTION batched video tracker (parallel/video.py
make_production_video_tracker + track_video_batch, CLI `track-batch`):
built from real tracker assets (Testbed, SceneModel, NerfTransform,
FeatureExtractor) and chained over time on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.nerf.render import RenderConfig
from pixtrack_tpu.parallel.mesh import make_mesh
from pixtrack_tpu.parallel.video import (
    make_production_video_tracker,
    track_video_batch,
)
from pixtrack_tpu.tracking.render_bridge import render_nerf_view
from tests.synthetic_world import look_at_w2c, make_scene, make_testbed


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_production_batch_tracker_chains_videos():
    H = W = 96
    camera = Camera.pinhole(100.0, 100.0, (W - 1) / 2, (H - 1) / 2, W, H)
    testbed = make_testbed(n_coarse=48)
    nerf2sfm = NerfTransform.identity()
    scene = make_scene(camera, n_refs=8, n_points=400)
    mesh = make_mesh(n_devices=8, tp=1)

    # B videos x T frames: slow orbits from different start angles
    B, T_len = 4, 3
    rng = np.random.default_rng(0)
    gts, vids = [], []
    for b in range(B):
        ang0 = 0.3 + 0.8 * b
        traj, frames = [], []
        for k in range(T_len):
            ang = ang0 + 0.02 * k
            center = 1.6 * np.array([np.sin(ang), 0.15, np.cos(ang)])
            T = look_at_w2c(center)
            traj.append(T)
            frames.append(np.asarray(
                render_nerf_view(testbed, nerf2sfm, T, camera, spp=1),
                np.float32) / 255.0)
        gts.append(traj)
        vids.append(np.stack(frames))
    videos = np.stack(vids)  # (B, T, H, W, 3)

    run = make_production_video_tracker(
        mesh, testbed, nerf2sfm,
        FeatureExtractor(HandcraftedExtractor(strides=(1, 4))),
        scene, camera, reference_scale=0.5, n_points=400,
        align_cfg=AlignConfig(num_iters=30),
        rcfg=RenderConfig(n_coarse=48, n_fine=0, perturb=False),
    )

    # init near each video's first GT (the track-batch CLI cold start is the
    # upright reference; here a perturbed GT isolates the chaining math)
    R0, t0 = [], []
    for b in range(B):
        delta = rng.uniform(-1, 1, 6) * np.array([0.01] * 3 + [0.015] * 3)
        T0 = gts[b][0].retract(jnp.asarray(delta, jnp.float32))
        R0.append(np.asarray(T0.R))
        t0.append(np.asarray(T0.t))

    out = track_video_batch(run, np.stack(R0), np.stack(t0), videos)
    assert out["R"].shape == (T_len, B, 3, 3)
    assert np.all(np.isfinite(out["cost"]))

    # every video's final frame tracked through the chain
    for b in range(B):
        T_fin = Pose.from_Rt(out["R"][-1, b], out["t"][-1, b])
        rot = np.rad2deg(float(T_fin.geodesic_to(gts[b][-1])))
        terr = float(np.linalg.norm(np.asarray(T_fin.t)
                                    - np.asarray(gts[b][-1].t)))
        assert rot < 3.0, f"video {b}: {rot} deg"
        assert terr < 0.06, f"video {b}: {terr}"
