"""dp-sharded offline video tracking on the virtual 8-device CPU mesh:
a batch of frames refines in parallel and every frame's pose error shrinks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import HandcraftedExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import C_CAM, P_W
from pixtrack_tpu.nerf.render import RenderConfig, rays_from_camera, render_rays
from pixtrack_tpu.parallel.mesh import make_mesh
from pixtrack_tpu.parallel.video import make_sharded_video_tracker
from tests.synthetic_world import look_at_w2c, sphere_surface_points


class _BlobField:
    def apply(self, params, xT, dT=None, method=None):
        from pixtrack_tpu.nerf.dataset import blob_scene_T

        return blob_scene_T(xT)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_video_tracking_refines_all_frames():
    mesh = make_mesh(n_devices=8, tp=1)
    H = W = 96
    camera = Camera.pinhole(100.0, 100.0, (W - 1) / 2, (H - 1) / 2, W, H)
    ref_camera = Camera.pinhole(50.0, 50.0, (W // 2 - 1) / 2, (H // 2 - 1) / 2,
                                W // 2, H // 2)
    field = _BlobField()
    aabb = jnp.asarray([[0.3] * 3, [0.7] * 3])
    rcfg = RenderConfig(n_coarse=48, n_fine=0, perturb=False)
    p3d = jnp.asarray(sphere_surface_points(n=400, seed=0))

    P_W_j = jnp.asarray(P_W, jnp.float32)
    C_CAM_j = jnp.asarray(C_CAM, jnp.float32)

    def c2w_nerf_of(T):
        Tinv = T.inv()
        return P_W_j @ Tinv.R @ C_CAM_j, P_W_j @ Tinv.t

    def render_query(T):
        Rn, tn = c2w_nerf_of(T)
        c2w = jnp.concatenate([Rn, tn[:, None]], axis=1)
        c2w = jnp.concatenate(
            [c2w, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
        )
        o, d = rays_from_camera(c2w, 100.0, 100.0, (W - 1) / 2, (H - 1) / 2, W, H)
        out = render_rays(field, None, o, d, aabb, rcfg)
        rgb = out["rgb"] + (1.0 - out["alpha"][:, None])
        return rgb.reshape(H, W, 3)

    B = 8
    gts, inits, queries = [], [], []
    rng = np.random.default_rng(3)
    for i in range(B):
        ang = 0.3 + 0.25 * i
        center = 1.6 * np.array([np.sin(ang), 0.15, np.cos(ang)])
        T_gt = look_at_w2c(center)
        gts.append(T_gt)
        queries.append(render_query(T_gt))
        delta = rng.uniform(-1, 1, 6) * np.array([0.01] * 3 + [0.015] * 3)
        inits.append(T_gt.retract(jnp.asarray(delta, jnp.float32)))

    # stride 16 on a 96px image is a 6x6 feature map — degenerate coarse
    # signal that can throw the pose; small-image configs use (1, 4)
    run = make_sharded_video_tracker(
        mesh, field, HandcraftedExtractor(strides=(1, 4)), p3d, camera, ref_camera, aabb,
        c2w_nerf_of, align_cfg=AlignConfig(num_iters=30), rcfg=rcfg,
    )
    R0 = jnp.stack([T.R for T in inits])
    t0 = jnp.stack([T.t for T in inits])
    Q = jnp.stack(queries)
    R1, t1, cost, iters = run(R0, t0, Q)

    # every frame must land at the handcrafted-feature bias floor for this
    # tiny resolution (rot ~1-2 deg) with translation tightened on average
    t_before, t_after = [], []
    for i in range(B):
        rot_after = np.rad2deg(float(Pose.from_Rt(R1[i], t1[i]).geodesic_to(gts[i])))
        assert rot_after < 3.0, f"frame {i} diverged: {rot_after} deg"
        t_before.append(float(jnp.linalg.norm(inits[i].t - gts[i].t)))
        t_after.append(float(jnp.linalg.norm(t1[i] - gts[i].t)))
        assert t_after[-1] < 0.05
    assert np.mean(t_after) < np.mean(t_before)
    assert np.all(np.isfinite(np.asarray(cost)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_dryrun_video_step_nan_regression():
    """Regression for the r3 multichip artifact NaN (fixed in 1ad0271):
    the dryrun's sharded video-step configuration must yield FINITE costs
    and poses for valid geometry, and +inf (the LM's empty-validity cost,
    lm.py::_mean_cost — NOT NaN, NOT a vacuous 0.0) when every point falls
    behind the camera. Runs the same make_sharded_video_tracker path the
    driver's dryrun_multichip gate uses, at fast-tier shapes."""
    from pixtrack_tpu.geometry.nerf_transform import C_CAM, P_W

    mesh = make_mesh(n_devices=8, tp=1)
    Hq = Wq = 48
    camera = Camera.pinhole(50.0, 50.0, (Wq - 1) / 2, (Hq - 1) / 2, Wq, Hq)
    refcam = Camera.pinhole(25.0, 25.0, (Wq // 2 - 1) / 2, (Hq // 2 - 1) / 2,
                            Wq // 2, Hq // 2)
    P_W_j = jnp.asarray(P_W, jnp.float32)
    C_CAM_j = jnp.asarray(C_CAM, jnp.float32)

    def c2w_nerf_of(T):
        Tinv = T.inv()
        return P_W_j @ Tinv.R @ C_CAM_j, P_W_j @ Tinv.t

    rng = np.random.default_rng(0)
    p3d = jnp.asarray(rng.uniform(-0.25, 0.25, (128, 3)).astype(np.float32))
    vt = make_sharded_video_tracker(
        mesh, _BlobField(), HandcraftedExtractor(strides=(1, 4)), p3d,
        camera, refcam, [[0.0] * 3, [1.0] * 3], c2w_nerf_of,
        align_cfg=AlignConfig(num_iters=3),
        rcfg=RenderConfig(n_coarse=8, n_fine=0, perturb=False),
    )
    B = 8
    Q = jnp.asarray(rng.uniform(size=(B, Hq, Wq, 3)).astype(np.float32))

    # valid geometry: points in front of the camera -> everything finite
    T_ok = Pose.identity((B,)).retract(
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.6]), (B, 1))
    )
    R1, t1, cost, _ = vt(T_ok.R, T_ok.t, Q)
    assert np.all(np.isfinite(np.asarray(cost)))
    assert np.all(np.isfinite(np.asarray(R1)))
    assert np.all(np.isfinite(np.asarray(t1)))

    # degenerate geometry: every point behind the camera -> +inf BY DESIGN
    # (the r3 bug scored this 0.0 and the NaN sailed into the artifact)
    T_bad = Pose.identity((B,)).retract(
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, -1.6]), (B, 1))
    )
    _, _, cost_bad, _ = vt(T_bad.R, T_bad.t, Q)
    cb = np.asarray(cost_bad)
    assert np.all(np.isposinf(cb)), f"expected +inf empty-validity cost, got {cb}"
