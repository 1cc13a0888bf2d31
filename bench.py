"""Benchmark: steady-state tracking throughput on one TPU chip.

Measures the FULL r9 steady-state per-frame hot path at reference-production
shapes (640x480 query, reference_scale 0.5 -> 320x240 reference render,
THRESH=0 cache semantics == a fresh NeRF reference render EVERY frame,
r9:145-205,207-225), all fused into one jitted program per frame:

  1. object mask (TPU-native SfM point splat + on-device morphology — the
     gather-free replacement for the reference's per-frame depth render);
  2. masked query feature-pyramid extraction (max-edge-1024 policy);
  3. NeRF reference render at the current pose estimate through the
     DISTILLED MXU-only field (nerf/distill.py — the production render
     path; zero gathers, production shape: octaves 8, 4x128 trunk);
  4. reference feature extraction + 3D point observation;
  5. coarse-to-fine feature-metric LM refine (3 levels x 4096 points,
     num_iters=150 budget, reference early-stop rule).

Timing is honest for the axon tunnel: frames are CHAINED (pose feeds the
next frame) so device execution serializes, and the result is host-copied
once at the end — `block_until_ready` alone does NOT sync through the
tunnel (see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: tracking FPS vs the 30 FPS v5e target (BASELINE.json).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pixtrack_tpu.align.lm import AlignConfig, align_pyramid
    from pixtrack_tpu.align.observations import build_level_data, observe_points
    from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
    from pixtrack_tpu.geometry import Camera, Pose
    from pixtrack_tpu.nerf.distill import init_distilled
    from pixtrack_tpu.nerf.render import RenderConfig, rays_from_camera, render_rays
    from pixtrack_tpu.tracking.mask import splat_object_mask

    rng = np.random.default_rng(0)
    H, W = 480, 640
    camera = Camera.pinhole(600.0, 600.0, (W - 1) / 2, (H - 1) / 2, W, H)
    extractor = FeatureExtractor(HandcraftedExtractor(), resize=1024)
    align_cfg = AlignConfig(num_iters=150)

    # production-shape distilled render field (weights irrelevant to cost)
    baked = init_distilled(jax.random.PRNGKey(0))
    # coarse-only reference renders: the importance-sampling machinery
    # (resample + merge-sort + second field eval) costs ~15x a plain
    # evaluation on TPU and adds nothing for feature extraction
    rcfg = RenderConfig(n_coarse=64, n_fine=0, perturb=False, chunk=1 << 17)
    aabb = jnp.asarray([[0.3] * 3, [0.7] * 3])

    import scipy.ndimage as ndi

    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    img = ndi.gaussian_filter(img, (3, 3, 0))
    img = ((img - img.min()) / np.ptp(img)).astype(np.float32)

    p3d = np.stack(
        [
            rng.uniform(-0.4, 0.4, 4096),
            rng.uniform(-0.3, 0.3, 4096),
            rng.uniform(1.2, 2.0, 4096),
        ],
        axis=1,
    ).astype(np.float32)
    p3d_j = jnp.asarray(p3d)
    pmask = jnp.ones(len(p3d), bool)
    T_gt = Pose.from_aa_t(
        np.deg2rad([1.0, -2.0, 0.5]).astype(np.float32),
        np.asarray([0.01, 0.02, 0.0], np.float32),
    )

    # reference camera: query camera scaled by reference_scale 0.5 (r9:81)
    rW, rH = W // 2, H // 2
    ref_camera = Camera.pinhole(300.0, 300.0, (rW - 1) / 2, (rH - 1) / 2, rW, rH)
    c2w_nerf = np.eye(4, dtype=np.float32)
    c2w_nerf[2, 3] = 1.8

    def render_reference(bkd):
        """320x240 render through the baked field (chunked like render_image)."""
        origins, dirs = rays_from_camera(
            jnp.asarray(c2w_nerf), 300.0, 300.0, (rW - 1) / 2, (rH - 1) / 2, rW, rH
        )
        n = origins.shape[0]
        chunk = rcfg.chunk
        n_pad = (n + chunk - 1) // chunk * chunk
        origins = jnp.concatenate([origins, jnp.zeros((n_pad - n, 3))], 0)
        dirs = jnp.concatenate([dirs, jnp.ones((n_pad - n, 3))], 0)
        outs = [
            render_rays(bkd, None, origins[s : s + chunk], dirs[s : s + chunk],
                        aabb, rcfg)
            for s in range(0, n_pad, chunk)
        ]
        rgb = jnp.concatenate([o["rgb"] for o in outs])[:n].reshape(rH, rW, 3)
        return rgb

    @jax.jit
    def frame_step(bkd, R, t, query_image):
        T = Pose.from_Rt(R, t)
        # 1. gather-free object mask
        mask = splat_object_mask(T, camera, p3d_j, (H, W))
        q = query_image * mask[..., None]
        # 2. reference render at the current pose (THRESH=0: every frame)
        ref_img = render_reference(bkd)
        # 3. reference features + observations
        ref_pyr = extractor.model(ref_img)
        f_ref, w_ref, v_ref = observe_points(ref_pyr, T, ref_camera, p3d_j, pmask)
        # 4. query pyramid + 5. LM refine
        pyr = extractor.model(q)
        levels = build_level_data(pyr, f_ref, w_ref, v_ref, p3d_j, pmask)
        final, _ = align_pyramid(T, levels, camera, align_cfg)
        return final.T.R, final.T.t, final.cost

    T0 = T_gt.retract(jnp.asarray([0.02, -0.02, 0.01, 0.02, 0.03, -0.01]))
    q_j = jnp.asarray(img)

    # compile + correctness pass
    R, t, cost = frame_step(baked, T0.R, T0.t, q_j)
    _ = float(cost)

    # measure: chained frames, one host sync at the end
    n_iters = 20
    t0 = time.perf_counter()
    R, t = T0.R, T0.t
    for _ in range(n_iters):
        R, t, cost = frame_step(baked, R, t, q_j)
    _ = float(cost)  # forces the whole chain
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "steady_state_tracking_fps_640x480",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
