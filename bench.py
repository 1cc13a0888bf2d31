"""Benchmark: steady-state tracking throughput on one TPU chip.

Measures the full per-frame tracking hot path at reference-production shapes
(640x480 query, r9 steady-state semantics):
  1. NeRF depth render at the query camera (the per-frame object mask,
     r9:207-214) — 640x480 rays through the hash-grid field;
  2. on-device mask morphology + query masking;
  3. query feature-pyramid extraction (max-edge-1024 policy);
  4. coarse-to-fine feature-metric LM refine (3 levels x 4096 points,
     num_iters=150 budget with the reference early-stop rule).

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
    from pixtrack_tpu.nerf.field import init_field
    from pixtrack_tpu.nerf.render import RenderConfig, render_image
    from pixtrack_tpu.tracking.mask import depth_to_object_mask

    rng = np.random.default_rng(0)
    H, W = 480, 640
    camera = Camera.pinhole(600.0, 600.0, (W - 1) / 2, (H - 1) / 2, W, H)
    extractor = FeatureExtractor(HandcraftedExtractor(), resize=1024)
    align_cfg = AlignConfig(num_iters=150)

    # full-size hash-grid field (instant-ngp base config), random weights —
    # render cost is representative of a trained model
    field, params = init_field(jax.random.PRNGKey(0))
    rcfg = RenderConfig(n_coarse=32, n_fine=0, perturb=False, chunk=1 << 15)
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
    T_gt = Pose.from_aa_t(
        np.deg2rad([1.0, -2.0, 0.5]).astype(np.float32),
        np.asarray([0.01, 0.02, 0.0], np.float32),
    )

    # reference observations (amortized across frames in steady state)
    pyr0 = extractor(img)
    f_ref, w_ref, v_ref = observe_points(
        pyr0, T_gt, camera, jnp.asarray(p3d), jnp.ones(len(p3d), bool)
    )

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0

    @jax.jit
    def frame_step(R, t, query_image):
        # 1. depth render for the mask
        out = render_image(
            field, params, jnp.asarray(c2w),
            600.0, 600.0, (W - 1) / 2, (H - 1) / 2, W, H,
            aabb, rcfg,
        )
        mask = depth_to_object_mask(out["depth"])
        # 2. masked query
        q = query_image * mask[..., None]
        # 3. feature pyramid  4. LM refine
        pyr = extractor.model(q)
        levels = build_level_data(
            pyr, f_ref, w_ref, v_ref, jnp.asarray(p3d), jnp.ones(len(p3d), bool)
        )
        final, _ = align_pyramid(Pose.from_Rt(R, t), levels, camera, align_cfg)
        return final.T.R, final.T.t, final.cost

    T0 = T_gt.retract(jnp.asarray([0.02, -0.02, 0.01, 0.02, 0.03, -0.01]))
    args = (T0.R, T0.t, jnp.asarray(img))

    # compile
    out = frame_step(*args)
    jax.block_until_ready(out)

    # measure
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = frame_step(*args)
    jax.block_until_ready(out)
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
