"""Mesh-world accuracy experiments (VERDICT r4 #2 follow-through).

The shipped mesh benchmark (bench.py::mesh_world) lands at ADD AUC 0.685 /
rot med 1.63 deg. This harness isolates where the error comes from and
sweeps the knobs that could close it, on the real TPU chip:

  open        closed-loop protocol exactly as bench.py (baseline)
  rounds2     refine_rounds=2 (re-render reference at the converged pose)
  openloop    init every frame at prev GT + fixed perturbation (no drift):
              remaining error = SYSTEMATIC bias (NeRF-vs-mesh appearance
              mismatch + SfM point error), not chaining dynamics
  oracle      reference rendered by the EXACT mesh rasterizer instead of
              the distilled NeRF: remaining error = SfM/alignment floor,
              difference vs openloop = NeRF fidelity cost

Usage: python scripts_dev/mesh_bench_experiment.py [variant ...]

Measured (TPU chip, 2026-08-21):
  closed r1 (bench baseline)  ADD AUC 0.685  ADD-S 0.750  rot med 1.63
      center med 0.037d  ok 18/20  41.4 FPS   <- ships (>=30 FPS gate)
  closed r2 (refine_rounds=2) ADD AUC 0.732  ADD-S 0.781  rot med 1.79
      center med 0.044d  ok 17/20  22.6 FPS   <- +0.05 AUC but FAILS the
      30 FPS gate (re-render + second LM pass double the frame cost,
      iters 119 vs 60); not shipped
  coarse96: setting testbed.n_coarse after FusedSteadyStep construction
      does not propagate (numbers bit-identical to r1) — the step
      captures the render config at build time; rebuild the step to
      sweep sampling.
  Both variants share the same single rot-excursion frame (max 23 deg,
  cost-gated as failure) — the drift driver is one hard viewpoint, not
  accumulation; the adaptive gate correctly flags it.
"""

import json as _json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    import jax.numpy as jnp

    from pixtrack_tpu.align.lm import AlignConfig
    from pixtrack_tpu.eval.metrics import (
        add_error,
        add_s_error,
        auc_of_threshold_curve,
    )
    from pixtrack_tpu.features import default_extractor
    from pixtrack_tpu.geometry import Camera
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
    from pixtrack_tpu.nerf.distill import load_distilled
    from pixtrack_tpu.nerf.testbed import Testbed
    from pixtrack_tpu.sfm.scene import SceneModel
    from pixtrack_tpu.tracking import PixTrackTracker, TrackerConfig
    from pixtrack_tpu.tracking.fused import FusedSteadyStep
    from mesh_world import sample_mesh_surface
    from synthetic_world import look_at_w2c

    H, W = 480, 640
    camera = Camera.pinhole(600.0, 600.0, (W - 1) / 2, (H - 1) / 2, W, H)

    mw = REPO / "assets" / "mesh_world"
    meta = _json.loads((mw / "meta.json").read_text())
    field = load_distilled(mw / "field.npz")
    scene = SceneModel.load(mw / "aug_sfm")
    nerf2sfm = NerfTransform.load(mw / "nerf2sfm.pkl")
    mesh = load_obj(mw / "src" / "house.obj")
    diameter = float(meta["diameter"])

    def make_testbed():
        tb = Testbed()
        tb.set_baked_field(field)
        tb.render_aabb.min = [float(v) for v in meta["aabb"][0]]
        tb.render_aabb.max = [float(v) for v in meta["aabb"][1]]
        tb.n_coarse, tb.n_fine = 48, 0
        tb.tighten_render_bounds()
        return tb

    # same upright pick + GT orbit as bench.py::mesh_world
    V = mesh["vertices"]
    center = V.mean(axis=0)
    want_el = 0.35
    best, v0 = None, None
    for i in scene.image_ids:
        T_i = scene.pose_w2c(int(i))
        c = np.asarray(T_i.inv().t)
        v = c - center
        el_i = float(np.arcsin(v[1] / np.linalg.norm(v)))
        roll_dev = float(np.rad2deg(
            T_i.geodesic_to(look_at_w2c(c, target=center))))
        if roll_dev > 5.0:
            continue
        if best is None or abs(el_i - want_el) < best[0]:
            best = (abs(el_i - want_el), int(i))
            v0 = v
    upright = scene.images[best[1]].name
    dist = float(np.linalg.norm(v0))
    ang0 = float(np.arctan2(v0[0], v0[2]))
    el0 = float(np.arcsin(v0[1] / dist))
    n_frames = 20
    gt_poses = []
    for i in range(n_frames + 1):
        ang = ang0 + 0.02 * i
        el = el0 + 0.05 * np.sin(0.4 * i)
        eye = center + dist * np.array(
            [np.cos(el) * np.sin(ang), np.sin(el), np.cos(el) * np.cos(ang)]
        )
        gt_poses.append(look_at_w2c(eye, target=center))

    frames = [
        (f"frame_{i:04d}.png",
         render_mesh(mesh, T, camera, background=(0.0, 0.0, 0.0)))
        for i, T in enumerate(gt_poses)
    ]
    add_pts = sample_mesh_surface(mesh, 512, seed=3)
    extractor = default_extractor(resize=1024)

    def report(tag, Rs, ts, oks, iters, fps=None):
        adds, add_ss, rot_errs, t_errs = [], [], [], []
        for k, (Re, te) in enumerate(zip(Rs, ts)):
            T_gt = gt_poses[k + 1]
            Rg, tg = np.asarray(T_gt.R), np.asarray(T_gt.t)
            adds.append(add_error(Re, te, Rg, tg, add_pts))
            add_ss.append(add_s_error(Re, te, Rg, tg, add_pts))
            rot_errs.append(np.rad2deg(np.arccos(np.clip(
                (np.trace(Re @ Rg.T) - 1) / 2, -1, 1))))
            # camera-center error is what ADD feels as translation
            ce = np.linalg.norm(-Re.T @ te - (-Rg.T @ tg))
            t_errs.append(ce)
        max_thr = 0.1 * diameter
        print(
            f"[{tag}] ADD AUC {auc_of_threshold_curve(adds, max_thr):.3f} "
            f"ADD-S AUC {auc_of_threshold_curve(add_ss, max_thr):.3f} | "
            f"rot med/max {np.median(rot_errs):.2f}/{np.max(rot_errs):.2f} deg | "
            f"center med {np.median(t_errs):.4f} "
            f"({np.median(t_errs)/diameter:.3f} d) | "
            f"ADD med {np.median(adds):.4f} (0.1d={max_thr:.4f}) | "
            f"ok {sum(oks)}/{len(oks)} | iters {np.mean(iters):.0f}"
            + (f" | fps {fps:.1f}" if fps else ""),
            flush=True,
        )

    def run_closed(tag, rounds=1, n_coarse=48):
        tb = make_testbed()
        tb.n_coarse = n_coarse
        tb.tighten_render_bounds()
        tracker = PixTrackTracker(
            scene, extractor, tb, nerf2sfm,
            TrackerConfig(reference_scale=0.5, cost_threshold_min=0.05,
                          covis_threshold=10, refine_rounds=rounds,
                          upright_ref_img=upright),
            align_cfg=AlignConfig(num_iters=150),
        )
        tracker.camera = camera
        tracker.cold_start = True
        tracker.refine(frames[0])
        thresh = jnp.float32(tracker.cost_threshold)
        R0 = jnp.asarray(tracker.pose.R, jnp.float32)
        t0_ = jnp.asarray(tracker.pose.t, jnp.float32)
        ok0 = jnp.asarray(bool(tracker.success))
        step = FusedSteadyStep(tracker, camera)
        queries = [jnp.asarray(np.asarray(img), jnp.float32) / 255.0
                   for _, img in frames[1:]]
        R, t, ok = R0, t0_, ok0
        R2, t2, vel_ok = R0, t0_, jnp.asarray(False)
        Rs, ts, oks, iters = [], [], [], []
        for q in queries:
            out = step(R, t, ok, thresh, q, R_prev=R2, t_prev=t2,
                       vel_ok=vel_ok)
            R2, t2, vel_ok = R, t, ok
            R, t, ok = out.R, out.t, out.ok
            Rs.append(np.asarray(R))
            ts.append(np.asarray(t))
            oks.append(bool(np.asarray(out.ok)))
            iters.append(int(np.asarray(out.num_iters)))
        # timed pass
        R, t, ok = R0, t0_, ok0
        R2, t2, vel_ok = R0, t0_, jnp.asarray(False)
        tt = time.perf_counter()
        for q in queries:
            out = step(R, t, ok, thresh, q, R_prev=R2, t_prev=t2,
                       vel_ok=vel_ok)
            R2, t2, vel_ok = R, t, ok
            R, t, ok = out.R, out.t, out.ok
        _ = float(np.asarray(out.cost))
        fps = 1.0 / ((time.perf_counter() - tt) / len(queries))
        report(tag, Rs, ts, oks, iters, fps)

    def run_openloop(tag, rounds=1, oracle_ref=False):
        """Init each frame at PREV GT + fixed perturbation: no drift, so
        the converged error is pure systematic bias."""
        from pixtrack_tpu.align.lm import align_pyramid
        from pixtrack_tpu.align.observations import (
            build_level_data,
            observe_points,
        )
        from pixtrack_tpu.geometry import Pose
        from pixtrack_tpu.tracking.mask import splat_object_mask
        from pixtrack_tpu.tracking.render_bridge import render_nerf_view

        from pixtrack_tpu.geometry.rotation import (
            geodesic_distance,
        )

        tb = make_testbed()
        tracker = PixTrackTracker(
            scene, extractor, tb, nerf2sfm,
            TrackerConfig(reference_scale=0.5, cost_threshold_min=0.05,
                          covis_threshold=10, refine_rounds=1,
                          upright_ref_img=upright),
            align_cfg=AlignConfig(num_iters=150),
        )
        tracker.camera = camera
        fstep = FusedSteadyStep(tracker, camera)  # for packed selections
        rW, rH = W // 2, H // 2
        ref_camera = Camera.pinhole(300.0, 300.0, (rW - 1) / 2,
                                    (rH - 1) / 2, rW, rH)
        perturb = np.asarray([0.004, -0.003, 0.002, 0.003, 0.004, -0.002],
                             np.float32)
        acfg = AlignConfig(num_iters=150)
        Rs, ts, oks, iters = [], [], [], []
        for k in range(1, n_frames + 1):
            T = Pose.from_Rt(gt_poses[k - 1].R, gt_poses[k - 1].t).retract(
                perturb)
            dists = geodesic_distance(
                jnp.asarray(T.R)[None], fstep.ref_Rs)
            ki = int(np.asarray(jnp.argmin(dists)))
            p3d_j = fstep.p3d_pack[ki]
            pmask_j = fstep.pmask_pack[ki]
            mask = splat_object_mask(T, camera, p3d_j, (H, W))
            q = (jnp.asarray(np.asarray(frames[k][1]), jnp.float32) / 255.0
                 ) * mask[..., None]
            if oracle_ref:
                ref_img = jnp.asarray(
                    np.asarray(render_mesh(mesh, T, ref_camera,
                                           background=(0.0, 0.0, 0.0))),
                    jnp.float32) / 255.0
            else:
                ref_img = jnp.asarray(
                    np.asarray(render_nerf_view(tb, nerf2sfm, T, ref_camera,
                                                spp=1)),
                    jnp.float32) / 255.0
            ref_pyr = extractor.traced(ref_img)
            f_ref, w_ref, v_ref = observe_points(ref_pyr, T, ref_camera,
                                                 p3d_j, pmask_j)
            pyr = extractor.traced(q)
            levels = build_level_data(pyr, f_ref, w_ref, v_ref, p3d_j,
                                      pmask_j)
            final, states = align_pyramid(T, levels, camera, acfg)
            for _ in range(rounds - 1):
                T2 = final.T
                if oracle_ref:
                    # would need host render at traced pose; approximate by
                    # rendering at the host copy
                    T2h = Pose.from_Rt(np.asarray(T2.R), np.asarray(T2.t))
                    ref_img = jnp.asarray(
                        np.asarray(render_mesh(mesh, T2h, ref_camera,
                                               background=(0.0, 0.0, 0.0))),
                        jnp.float32) / 255.0
                else:
                    T2h = Pose.from_Rt(np.asarray(T2.R), np.asarray(T2.t))
                    ref_img = jnp.asarray(
                        np.asarray(render_nerf_view(tb, nerf2sfm, T2h,
                                                    ref_camera, spp=1)),
                        jnp.float32) / 255.0
                ref_pyr = extractor.traced(ref_img)
                f_ref, w_ref, v_ref = observe_points(
                    ref_pyr, T2h, ref_camera, p3d_j, pmask_j)
                levels = build_level_data(pyr, f_ref, w_ref, v_ref, p3d_j,
                                          pmask_j)
                final, states = align_pyramid(T2h, levels, camera, acfg)
            Rs.append(np.asarray(final.T.R))
            ts.append(np.asarray(final.T.t))
            oks.append(True)
            iters.append(int(sum(int(np.asarray(s.num_iters))
                                 for s in states)))
        report(tag, Rs, ts, oks, iters)

    variants = sys.argv[1:] or ["open"]
    for v in variants:
        if v == "open":
            run_closed("closed r1 (bench baseline)", rounds=1)
        elif v == "rounds2":
            run_closed("closed r2", rounds=2)
        elif v == "rounds3":
            run_closed("closed r3", rounds=3)
        elif v == "coarse96":
            run_closed("closed r1 n_coarse=96", rounds=1, n_coarse=96)
        elif v == "openloop":
            run_openloop("openloop r1 (no drift)", rounds=1)
        elif v == "openloop2":
            run_openloop("openloop r2", rounds=2)
        elif v == "oracle":
            run_openloop("openloop oracle-ref", rounds=1, oracle_ref=True)
        elif v == "oracle2":
            run_openloop("openloop oracle-ref r2", rounds=2, oracle_ref=True)
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
