"""Fused steady-state tracking: the whole r9 per-frame hot path as ONE
jitted device program, driven by the production ``PixTrackTracker``.

Why this exists: the step-by-step tracker path (tracker.refine) dispatches
5+ separate device programs per frame (mask, render, two extractions, LM)
with numpy cache bookkeeping between them — semantically exactly r9
(r9:216-275), but the host round-trips between programs put a hard ceiling
on closed-loop FPS. This module compiles the same steady-state semantics —

  1. relocalize to the upright reference pose if the previous frame failed
     (base_pose_tracker.py:21-28 + r9:95-106);
  2. object mask from the SfM cloud, applied only while tracking is good
     (r9:207-214, 222-225);
  3. dynamic reference render at the current estimate with the
     reference_scale camera (r9:145-152, THRESH=0 => fresh every frame);
  4. per-3D-point reference observations with silhouette-interior
     weighting, using the geodesic-nearest reference image's point
     selection (r9:120-143, 162-205);
  5. query pyramid extraction + coarse-to-fine LM with the reference
     early-stop rule (pixtrack_optimizer.py:6-18);
  6. success gate: finite cost <= the adaptive 110%-of-first-frame
     threshold (r9:255-268); the refined pose is carried to the next frame
     only on success

— into a single XLA program whose inputs/outputs stay on device, so frames
chain with zero host syncs (one host copy at the very end of a sequence).

Documented deltas from the stepwise path (all conservative):
  - reference selection is geodesic-nearest over ALL db reference images,
    not just covisible neighbors of the current one (the covis filter in r9
    exists to cheapen a CPU search; on device the full argmin is one op and
    selects a superset-optimal reference);
  - K (num_refs) is fixed to 1 (the production default; best-of-K stays on
    the stepwise path);
  - relocalization refines at the steady multiscale rather than the cold
    [4, 1] schedule (a failed frame re-enters through the same program);
  - the feature cache is bypassed (cache_thresh_rad = 0 semantics — the
    production default — i.e. a fresh reference render every frame).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.align.lm import align_pyramid
from pixtrack_tpu.align.interpolate import interpolate_scalar
from pixtrack_tpu.align.observations import build_level_data, observe_points
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.rotation import geodesic_distance, quat_to_rotmat
from pixtrack_tpu.nerf.render import RenderConfig, rays_from_camera, render_rays
from pixtrack_tpu.tracking.mask import erode, splat_object_mask


import flax.struct


@flax.struct.dataclass
class FusedFrameOut:
    """Device-resident per-frame outputs (sync once at sequence end)."""

    R: jax.Array
    t: jax.Array
    ok: jax.Array
    cost: jax.Array
    num_iters: jax.Array
    relocalized: jax.Array


class FusedSteadyStep:
    """Compiles and runs the fused steady-state frame program for a tracker.

    Built lazily from a ``PixTrackTracker`` once its query camera is known;
    reuses the tracker's scene, extractor, align config, and testbed render
    field, so the program IS the production configuration.
    """

    def __init__(self, tracker, camera: Camera):
        self.tracker = tracker
        scene = tracker.scene
        cfg = tracker.config
        self.camera = camera
        self.H = int(round(float(camera.height)))
        self.W = int(round(float(camera.width)))

        # --- per-reference packed point selections (static shapes) ----------
        ids = list(scene.image_ids)
        packs = [tracker.refiner.select_points([i]) for i in ids]
        P = max(int(p.shape[0]) for p, _ in packs)
        p3d = np.zeros((len(ids), P, 3), np.float32)
        pmask = np.zeros((len(ids), P), bool)
        for k, (xyz, m) in enumerate(packs):
            n = int(xyz.shape[0])
            p3d[k, :n] = np.asarray(xyz, np.float32)
            pmask[k, :n] = np.asarray(m)
        self.p3d_pack = jnp.asarray(p3d)
        self.pmask_pack = jnp.asarray(pmask)

        ks = [scene._imgidx[int(i)] for i in ids]
        self.ref_Rs = quat_to_rotmat(jnp.asarray(scene.qvecs[ks], jnp.float32))

        # all-points cloud for the splat mask
        self.p3d_all = jnp.asarray(scene.xyz.astype(np.float32))

        # upright relocalization pose (r9:95-106)
        T0 = scene.pose_w2c(tracker.reference_ids[0])
        self.R_up = jnp.asarray(T0.R, jnp.float32)
        self.t_up = jnp.asarray(T0.t, jnp.float32)

        # reference camera (reference_scale, r9:81)
        cam_id = scene.images[int(tracker.reference_ids[0])].camera_id
        self.ref_camera = scene.camera(cam_id).scale(cfg.reference_scale)
        self.rW = int(round(float(self.ref_camera.width)))
        self.rH = int(round(float(self.ref_camera.height)))
        # python-float intrinsics: closure arrays are traced as captured
        # constants inside jit, so float() there would raise
        self._ref_fx = float(self.ref_camera.f[0])
        self._ref_fy = float(self.ref_camera.f[1])
        self._ref_cx = float(self.ref_camera.c[0])
        self._ref_cy = float(self.ref_camera.c[1])

        # render field + NeRF transform constants
        tb = tracker.testbed
        self._field_is_baked = tb._baked is not None
        self.field_arg = tb._baked if self._field_is_baked else tb.params
        self._static_field = tb.field
        self.render_cfg = RenderConfig(
            n_coarse=tb.n_coarse,
            n_fine=tb.n_fine,
            min_transmittance=float(tb.nerf.rendering_min_transmittance),
            perturb=False,
        )
        self.aabb = jnp.asarray(
            [tb.render_aabb.min, tb.render_aabb.max], jnp.float32
        )
        # occupied-bounds ball (Testbed.tighten_render_bounds): per-ray
        # interval tightening at zero gather cost
        self.sphere = (
            None if getattr(tb, "_sphere", None) is None
            else jnp.asarray(tb._sphere, jnp.float32)
        )
        # --- crop window for the reference render (static size, dynamic
        # position). Rays outside the object silhouette composite to
        # alpha ~ 0 and are then thresholded to black (render_bridge.py:58-61)
        # — rendering them is pure waste, and on TPU the render is the
        # dominant closed-loop cost. The SfM cloud's projection at each DB
        # reference pose sizes a static window that covers the silhouette
        # with margin; per frame the window is centered on the cloud's
        # projection at the RENDER pose, so it tracks the rendered content
        # by construction even when the pose estimate is wrong. Pixels the
        # crop skips are exactly those the full render would zero.
        self._crop = None
        if getattr(cfg, "ref_crop", True):
            ext_w = ext_h = 0.0
            xyz_j = jnp.asarray(scene.xyz.astype(np.float32))
            for i in ids:
                Tw = scene.pose_w2c(int(i))
                p2d, vis = self.ref_camera.world2image(Tw, xyz_j)
                p2d, vis = np.asarray(p2d), np.asarray(vis)
                if vis.sum() < 3:
                    continue
                ext_w = max(ext_w, float(np.ptp(p2d[vis, 0])))
                ext_h = max(ext_h, float(np.ptp(p2d[vis, 1])))
            cw = int(-((1.30 * ext_w + 32) // -16) * 16)
            ch = int(-((1.30 * ext_h + 32) // -16) * 16)
            if 0 < ext_w and cw < self.rW and ch < self.rH \
                    and cw * ch < 0.8 * self.rW * self.rH:
                self._crop = (ch, cw)

        n2s = tracker.nerf2sfm
        from pixtrack_tpu.geometry.nerf_transform import C_CAM, P_W

        self._PW = jnp.asarray(P_W, jnp.float32)
        self._CCAM = jnp.asarray(C_CAM, jnp.float32)
        self._n2s_R3 = jnp.asarray(n2s.R3, jnp.float32)
        self._n2s_centroid = jnp.asarray(n2s.centroid, jnp.float32)
        self._n2s_totp = jnp.asarray(n2s.totp, jnp.float32)
        self._n2s_scale = jnp.float32(n2s.scale)

        self._jit = jax.jit(self._frame)

    # ------------------------------------------------------------- pieces ----
    def _c2w_nerf(self, T: Pose) -> jax.Array:
        """Traced NerfTransform.pose_sfm_to_nerf (nerf_transform.py:105-113)."""
        Tinv = T.inv()
        Rm = self._PW @ Tinv.R @ self._CCAM
        t = self._PW @ Tinv.t
        t = self._n2s_R3 @ ((t - self._n2s_centroid) * self._n2s_scale)
        t = t - self._n2s_totp
        Rn = self._n2s_R3 @ Rm
        return jnp.concatenate(
            [
                jnp.concatenate([Rn, t[:, None]], axis=1),
                jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
            ],
            axis=0,
        )

    def _render_ref(self, field_arg, T: Pose):
        """White-background reference render + alpha at pose estimate T.

        With a crop window configured (``self._crop``), only the window's
        rays are rendered and the result stays CROP-SIZED: the returned
        camera is the reference camera shifted by the window offset
        (``Camera.crop``), so downstream projection/observation runs in
        window coordinates. This matches the full render wherever the
        window covers the silhouette, because outside the silhouette the
        full render thresholds to black anyway (render_bridge.py:58-61) —
        and it keeps the reference feature extraction + interior-weight
        morphology at window size instead of the full reference canvas
        (the UNet forward drops ~3x at the bench's 144x144 window).

        Returns (rgb (h, w, 3), alpha (h, w), camera-in-window-coords).
        """
        c2w = self._c2w_nerf(T)
        if self._crop is None:
            ch, cw = self.rH, self.rW
            x0f = y0f = 0.0
        else:
            ch, cw = self._crop
            p2d, vis = self.ref_camera.world2image(T, self.p3d_all)
            any_vis = jnp.any(vis)
            big = jnp.float32(1e9)
            px = jnp.where(vis, p2d[:, 0], big)
            py = jnp.where(vis, p2d[:, 1], big)
            cx = 0.5 * (jnp.min(px, initial=big) + jnp.max(
                jnp.where(vis, p2d[:, 0], -big), initial=-big))
            cy = 0.5 * (jnp.min(py, initial=big) + jnp.max(
                jnp.where(vis, p2d[:, 1], -big), initial=-big))
            cx = jnp.where(any_vis, cx, 0.5 * self.rW)
            cy = jnp.where(any_vis, cy, 0.5 * self.rH)
            x0 = jnp.clip(jnp.round(cx - 0.5 * cw), 0, self.rW - cw)
            y0 = jnp.clip(jnp.round(cy - 0.5 * ch), 0, self.rH - ch)
            x0f, y0f = x0.astype(jnp.float32), y0.astype(jnp.float32)
        o, d = rays_from_camera(
            c2w, self._ref_fx, self._ref_fy, self._ref_cx, self._ref_cy,
            cw, ch, x0=x0f, y0=y0f,
        )
        fld = field_arg if self._field_is_baked else self._static_field
        prm = None if self._field_is_baked else field_arg
        out = render_rays(
            fld, prm, o, d, self.aabb, self.render_cfg, sphere=self.sphere
        )
        # match render_nerf_view exactly: white background composited into
        # the object interior, alpha-thresholded to black outside (the
        # production reference-feature input, render_bridge.py:58-61)
        alpha = out["alpha"]
        rgb = out["rgb"] + (1.0 - alpha[:, None])
        rgb = jnp.where(alpha[:, None] > 1e-2, rgb, 0.0)
        rgb = rgb.reshape(ch, cw, 3)
        alpha = alpha.reshape(ch, cw)
        if self._crop is None:
            return rgb, alpha, self.ref_camera
        cam = self.ref_camera.crop(
            jnp.stack([x0f, y0f]), jnp.asarray([cw, ch], jnp.float32)
        )
        return rgb, alpha, cam

    # ------------------------------------------------------------ program ----
    def _frame(
        self, field_arg, R_prev, t_prev, R_prev2, t_prev2, vel_ok,
        ok_prev, thresh, query_image,
    ):
        # the render field enters as an argument so its tables aren't baked
        # into the executable as constants (testbed._renderer does the same)

        # 1. relocalize on previous failure (base loop + r9:95-106)
        relocalized = ~ok_prev
        # constant-velocity init (documented delta from r9, which starts at
        # the previous pose): T_init = (T_{k-1} T_{k-2}^{-1}) T_{k-1}. On a
        # smooth trajectory this cancels the inter-frame motion, so the LM
        # early-stops in far fewer op-latency-bound while_loop iterations
        # (the dominant closed-loop cost). Gated off unless both previous
        # frames succeeded; relocalization resets it.
        use_vel = vel_ok & ok_prev & jnp.asarray(
            bool(self.tracker.config.motion_model)
        )
        T1 = Pose.from_Rt(R_prev, t_prev)
        D = T1 @ Pose.from_Rt(R_prev2, t_prev2).inv()
        Tv = D @ T1
        # translation-damped extrapolation (TrackerConfig.vel_t_damp):
        # rotation extrapolates fully, translation only partially — full
        # extrapolation amplifies unobservable depth error geometrically
        damp = jnp.float32(self.tracker.config.vel_t_damp)
        t_ext = t_prev + damp * (Tv.t - t_prev)
        R_init = jnp.where(use_vel, Tv.R, R_prev)
        t_init = jnp.where(use_vel, t_ext, t_prev)
        R0 = jnp.where(relocalized, self.R_up, R_init)
        t0 = jnp.where(relocalized, self.t_up, t_init)
        T = Pose.from_Rt(R0, t0)

        # 2. object mask while tracking is good (r9:222-225)
        mask = splat_object_mask(
            T, self.camera, self.p3d_all, (self.H, self.W),
            dilate_iters=self.tracker.config.mask_dilate_iters,
        )
        use_mask = ok_prev & jnp.asarray(self.tracker.config.use_mask)
        q = query_image * jnp.where(use_mask, mask, 1.0)[..., None]

        # 3. geodesic-nearest reference image's point selection (r9:120-143)
        dists = geodesic_distance(R0[None], self.ref_Rs)
        k = jnp.argmin(dists)
        p3d = self.p3d_pack[k]
        pmask = self.pmask_pack[k]

        # query pyramid: extracted once, shared by all refine rounds
        pyr = self.tracker.refiner.extractor.traced(q)

        def observe_and_align(T_obs):
            """4.+5. reference render at T_obs -> observations -> LM from
            T_obs (one refine round, r9:145-205 + refiners:200-271)."""
            ref_img, ref_alpha, ref_cam = self._render_ref(field_arg, T_obs)
            ref_pyr = self.tracker.refiner.extractor.traced(ref_img)
            f_ref, w_ref, v_ref = observe_points(
                ref_pyr, T_obs, ref_cam, p3d, pmask
            )
            # silhouette-interior weighting (refiner._observe_reference)
            interior = erode((ref_alpha > 0.5).astype(jnp.float32), size=7)
            p2d_img, _ = ref_cam.world2image(T_obs, p3d)
            wi, _ = interpolate_scalar(interior, p2d_img)
            w_ref = tuple(w * wi for w in w_ref)
            levels = build_level_data(pyr, f_ref, w_ref, v_ref, p3d, pmask)
            return align_pyramid(
                T_obs, levels, self.camera, self.tracker.refiner.align_cfg
            )

        # refine rounds: each re-renders the reference at the latest
        # estimate, contracting view-dependent feature bias (statically
        # unrolled; tracker.refine's refine_rounds loop, tracker.py:263-275)
        final, states = observe_and_align(T)
        iters = sum(s.num_iters for s in states)
        for _ in range(max(1, int(self.tracker.config.refine_rounds)) - 1):
            final, states = observe_and_align(final.T)
            iters = iters + sum(s.num_iters for s in states)

        # 6. adaptive success gate (r9:255-268)
        ok = (
            jnp.isfinite(final.cost)
            & (final.cost <= thresh)
            & (final.num_valid >= self.tracker.refiner.min_points_opt)
        )
        R_out = jnp.where(ok, final.T.R, R0)
        t_out = jnp.where(ok, final.T.t, t0)
        return FusedFrameOut(
            R=R_out, t=t_out, ok=ok, cost=final.cost,
            num_iters=iters, relocalized=relocalized,
        )

    # -------------------------------------------------------------- public ----
    def __call__(
        self, R, t, ok, thresh, query_image, R_prev=None, t_prev=None,
        vel_ok=None,
    ) -> FusedFrameOut:
        """One fused frame. (R, t, ok) is the previous frame's state;
        (R_prev, t_prev, vel_ok) is the frame before that for the
        constant-velocity init (omit to disable extrapolation)."""
        if R_prev is None:
            R_prev, t_prev = R, t
            vel_ok = jnp.asarray(False)
        return self._jit(
            self.field_arg, R, t, R_prev, t_prev, vel_ok, ok, thresh,
            query_image,
        )


def run_fused(
    tracker,
    frames: Sequence[Tuple[str, np.ndarray]],
    camera: Optional[Camera] = None,
) -> List[FusedFrameOut]:
    """Track a frame sequence through the fused steady-state program.

    Frame 0 runs the stepwise cold-start path (multiscale [4, 1] from the
    upright pose, exactly tracker.refine) to set the adaptive cost
    threshold; every following frame is one fused device dispatch chained
    on the previous frame's device-resident pose. Results are synced to the
    host once at the end and written into the tracker's pose_history/trace
    (poses.pkl-compatible).

    Returns the per-frame FusedFrameOut list (frames[1:]).
    """
    from pixtrack_tpu.tracking.refiner import infer_camera_from_image

    name0, img0 = frames[0]
    if camera is None:
        camera = infer_camera_from_image(np.asarray(img0))
    tracker.camera = camera

    # cold start through the production stepwise path
    tracker.cold_start = True
    tracker.refine((name0, np.asarray(img0)))
    thresh = jnp.float32(tracker.cost_threshold or np.inf)

    step = getattr(tracker, "_fused_step", None)
    if step is None or step.camera is not camera:
        step = FusedSteadyStep(tracker, camera)
        tracker._fused_step = step
    R = jnp.asarray(tracker.pose.R, jnp.float32)
    t = jnp.asarray(tracker.pose.t, jnp.float32)
    ok = jnp.asarray(bool(tracker.success))

    outs: List[FusedFrameOut] = []
    queries = [
        (name, jnp.asarray(np.asarray(img), jnp.float32) / (255.0 if np.asarray(img).dtype == np.uint8 else 1.0))
        for name, img in frames[1:]
    ]
    R2, t2, vel_ok = R, t, jnp.asarray(False)
    for name, q in queries:
        out = step(R, t, ok, thresh, q, R_prev=R2, t_prev=t2, vel_ok=vel_ok)
        R2, t2, vel_ok = R, t, ok
        R, t, ok = out.R, out.t, out.ok
        outs.append(out)

    # one host sync for the whole sequence
    final = np.asarray(outs[-1].cost)
    del final
    for (name, _), out in zip(queries, outs):
        okv = bool(np.asarray(out.ok))
        T_ref = Pose.from_Rt(np.asarray(out.R), np.asarray(out.t))
        nm = str(name).split("/")[-1]
        tracker.pose_history[nm] = {
            "success": okv,
            "T_init": np.asarray(T_ref.to_4x4()),  # fused: init not retained
            "T_refined": np.asarray(T_ref.to_4x4()),
            "camera": {
                "size": np.asarray(camera.size),
                "f": np.asarray(camera.f),
                "c": np.asarray(camera.c),
                "k": np.asarray(camera.k),
            },
            "cost": float(np.asarray(out.cost)),
            "reference_ids": list(tracker.reference_ids),
            "query_path": str(name),
        }
        tracker.trace.append(
            {
                "frame": nm,
                "cost": float(np.asarray(out.cost)),
                "num_iters": int(np.asarray(out.num_iters)),
                "cache_hit": False,
                "success": okv,
                "fused": True,
            }
        )
        if bool(np.asarray(out.relocalized)):
            tracker.relocalization_count += 1
    tracker.pose = Pose.from_Rt(np.asarray(R), np.asarray(t))
    tracker.success = bool(np.asarray(ok))
    return outs
