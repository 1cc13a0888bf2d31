"""Data-parallel offline video tracking: frames sharded over the device mesh.

The reference is strictly single-GPU (SURVEY.md §2.2: no distributed stack);
its only throughput axis is intra-device batching. On TPU the natural
scale-out for OFFLINE workloads (YCB eval sweeps, re-tracking a library of
videos, hyperparameter searches) is embarrassingly parallel over frames /
videos / objects: shard the frame batch over the mesh's ``dp`` axis and run
the full r9 steady-state step (mask -> reference render -> observe -> query
pyramid -> LM refine, pixtrack_tpu/tracking + bench.py semantics) on every
frame simultaneously; XLA partitions the vmapped program with zero
collectives in the hot path.

Design notes:
- Reference renders for all frames are evaluated as ONE ray batch
  (concatenate each frame's rays) rather than vmapping render_rays: the
  fused Pallas MLP kernel (nerf/fused_mlp.py) has no batching rule, and one
  big ray batch is also the better MXU shape.
- Per-frame init poses come from the caller (e.g. the previous chunk's
  results, or GT neighborhoods for eval protocols) — offline tracking has
  all frames on disk, so chunk-parallel + per-chunk serial chaining
  reproduces the online tracker's trajectory semantics at (chunk-size)x
  throughput.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixtrack_tpu.align.lm import AlignConfig, align_pyramid
from pixtrack_tpu.align.observations import build_level_data, observe_points
from pixtrack_tpu.geometry.camera import Camera
from pixtrack_tpu.geometry.pose import Pose
from pixtrack_tpu.nerf.render import RenderConfig, rays_from_camera, render_rays
from pixtrack_tpu.tracking.mask import splat_object_mask


def make_sharded_video_tracker(
    mesh: Mesh,
    field,
    extractor,
    p3d: jax.Array,
    camera: Camera,
    ref_camera: Camera,
    aabb,
    c2w_nerf_of,
    align_cfg: Optional[AlignConfig] = None,
    rcfg: Optional[RenderConfig] = None,
    background: float = 1.0,
    black_outside: bool = False,
    params=None,
):
    """Build a jitted fn(R (B,3,3), t (B,3), queries (B,H,W,3)) ->
    (R', t', cost (B,), iters (B,)) with the batch axis sharded over
    ``mesh``'s 'dp' axis.

    ``c2w_nerf_of(T) -> (3,3), (3,)`` maps an SfM w2c Pose to the NeRF-space
    camera-to-world rotation/translation (object-specific NerfTransform,
    traced)."""
    align_cfg = align_cfg or AlignConfig()
    rcfg = rcfg or RenderConfig(n_coarse=48, n_fine=0, perturb=False)
    H = int(float(camera.height))
    W = int(float(camera.width))
    rH = int(float(ref_camera.height))
    rW = int(float(ref_camera.width))
    pmask = jnp.ones(p3d.shape[0], bool)
    aabb = jnp.asarray(aabb, jnp.float32)

    # intrinsics resolved at build time (inside jit they would be tracers)
    rfx, rfy = float(ref_camera.f[0]), float(ref_camera.f[1])
    rcx, rcy = float(ref_camera.c[0]), float(ref_camera.c[1])

    def rays_of(T):
        Rn, tn = c2w_nerf_of(T)
        c2w = jnp.concatenate([Rn, tn[:, None]], axis=1)
        c2w = jnp.concatenate(
            [c2w, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
        )
        return rays_from_camera(c2w, rfx, rfy, rcx, rcy, rW, rH)

    def per_frame(T, ref_img, query):
        mask = splat_object_mask(T, camera, p3d, (H, W))
        q = query * mask[..., None]
        ref_pyr = extractor(ref_img)
        f_ref, w_ref, v_ref = observe_points(ref_pyr, T, ref_camera, p3d, pmask)
        pyr = extractor(q)
        levels = build_level_data(pyr, f_ref, w_ref, v_ref, p3d, pmask)
        final, states = align_pyramid(T, levels, camera, align_cfg)
        iters = sum(s.num_iters for s in states)
        return final.T.R, final.T.t, final.cost, iters

    dp_spec = lambda x: NamedSharding(  # noqa: E731
        mesh, P("dp", *([None] * (max(x.ndim, 1) - 1)))
    )

    @jax.jit
    def run(R, t, queries):
        R = jax.lax.with_sharding_constraint(R, dp_spec(R))
        t = jax.lax.with_sharding_constraint(t, dp_spec(t))
        queries = jax.lax.with_sharding_constraint(queries, dp_spec(queries))
        T = Pose.from_Rt(R, t)
        # one big ray batch for all frames' reference renders
        origins, dirs = jax.vmap(rays_of)(T)  # (B, rH*rW, 3)
        B = origins.shape[0]
        out = render_rays(
            field, params, origins.reshape(B * rH * rW, 3),
            dirs.reshape(B * rH * rW, 3), aabb, rcfg,
        )
        rgb = out["rgb"] + (1.0 - out["alpha"][:, None]) * background
        if black_outside:
            # production reference-render convention (render_bridge.py:58-61
            # and tracking/fused._render_ref): background composited into the
            # object interior, hard black OUTSIDE the silhouette
            rgb = jnp.where(out["alpha"][:, None] > 1e-2, rgb, 0.0)
        ref_imgs = rgb.reshape(B, rH, rW, 3)
        return jax.vmap(per_frame)(T, ref_imgs, queries)

    return run


def make_production_video_tracker(
    mesh: Mesh,
    testbed,
    nerf2sfm,
    extractor,
    scene,
    camera: Camera,
    reference_scale: float = 0.5,
    n_points: int = 4096,
    align_cfg: Optional[AlignConfig] = None,
    rcfg: Optional[RenderConfig] = None,
):
    """Build the dp-sharded per-frame step from PRODUCTION assets: the
    tracker's testbed render field, object NerfTransform, SfM scene points,
    and feature extractor — the batched counterpart of one
    tracking/fused.py steady-state refine (CLI ``track-batch``)."""
    import numpy as np

    from pixtrack_tpu.geometry.nerf_transform import C_CAM, P_W

    field = testbed._baked if testbed._baked is not None else testbed.field
    params = None if testbed._baked is not None else testbed.params
    aabb = jnp.asarray([testbed.render_aabb.min, testbed.render_aabb.max],
                       jnp.float32)

    xyz = np.asarray(scene.xyz, np.float32)
    if len(xyz) > n_points:
        sel = np.random.default_rng(0).choice(len(xyz), n_points, replace=False)
        xyz = xyz[sel]
    p3d = jnp.asarray(xyz)

    cam_id = scene.images[int(scene.image_ids[0])].camera_id
    ref_camera = scene.camera(cam_id).scale(reference_scale)

    PW = jnp.asarray(P_W, jnp.float32)
    CCAM = jnp.asarray(C_CAM, jnp.float32)
    R3 = jnp.asarray(nerf2sfm.R3, jnp.float32)
    centroid = jnp.asarray(nerf2sfm.centroid, jnp.float32)
    totp = jnp.asarray(nerf2sfm.totp, jnp.float32)
    scale = jnp.float32(nerf2sfm.scale)

    def c2w_nerf_of(T):
        Tinv = T.inv()
        Rm = PW @ Tinv.R @ CCAM
        t = PW @ Tinv.t
        t = R3 @ ((t - centroid) * scale) - totp
        return R3 @ Rm, t

    # FeatureExtractor exposes .traced for embedding in larger programs;
    # bare pyramid callables (HandcraftedExtractor) are used as-is
    ext_fn = getattr(extractor, "traced", extractor)

    return make_sharded_video_tracker(
        mesh, field, ext_fn, p3d, camera, ref_camera, aabb, c2w_nerf_of,
        align_cfg=align_cfg,
        rcfg=rcfg or RenderConfig(
            n_coarse=testbed.n_coarse, n_fine=testbed.n_fine, perturb=False
        ),
        black_outside=True,  # match render_nerf_view query/reference domain
        params=params,
    )


def track_video_batch(run, R0, t0, videos):
    """Chain the sharded per-frame step over time for B videos in lockstep.

    ``videos``: (B, T, H, W, 3) float [0,1] (pad shorter videos by repeating
    their last frame; trailing results for padded steps repeat the converged
    pose). Each timestep is ONE sharded dispatch refining all B videos'
    frame k from their own frame k-1 estimates — per-video trajectories
    chain exactly like the single-video tracker, at B-way throughput.

    Returns dict of stacked (T, B, ...) arrays: R, t, cost, num_iters.
    """
    import numpy as np

    R, t = jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32)
    out = {"R": [], "t": [], "cost": [], "num_iters": []}
    T_len = videos.shape[1]
    for k in range(T_len):
        R, t, cost, iters = run(R, t, videos[:, k])
        out["R"].append(R)
        out["t"].append(t)
        out["cost"].append(cost)
        out["num_iters"].append(iters)
    # one host sync for the whole batch
    np.asarray(out["cost"][-1])
    return {k: np.asarray(jnp.stack(v)) for k, v in out.items()}
