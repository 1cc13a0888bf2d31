"""Distill-fidelity measurement (VERDICT r1 #9): train a real NGP on a
textured object, distill it, and measure (a) student-vs-teacher render
PSNR and (b) the tracking-error delta when the tracker's reference renders
come from the student instead of the teacher.

Usage: nohup python scripts_dev/distill_fidelity.py > /tmp/distill_fid.log 2>&1 &
Writes assets/distill_fidelity.json.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from pixtrack_tpu.geometry import Camera, Pose
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
    from pixtrack_tpu.nerf.dataset import NerfDataset
    from pixtrack_tpu.nerf.train import TrainConfig, train, psnr
    from pixtrack_tpu.nerf.testbed import Testbed
    from test_mesh_render import make_cube_obj
    from synthetic_world import look_at_w2c

    t0 = time.time()
    print("backend:", jax.default_backend(), flush=True)
    tmp = Path(tempfile.mkdtemp())
    mesh = load_obj(make_cube_obj(tmp))

    res = 256
    fx = res * 1.1
    camera = Camera.pinhole(fx, fx, (res - 1) / 2, (res - 1) / 2, res, res)
    n2s = NerfTransform.identity()

    # training views: two elevation rings + top views
    views, poses_w2c = [], []
    for i in range(40):
        ang = 2 * np.pi * (i % 20) / 20 + (0.15 if i >= 20 else 0.0)
        el = 0.25 if i < 20 else 0.65
        center = 0.85 * np.array(
            [np.cos(el) * np.sin(ang), np.sin(el), np.cos(el) * np.cos(ang)]
        )
        T = look_at_w2c(center)
        views.append(render_mesh(mesh, T, camera).astype(np.float32) / 255.0)
        poses_w2c.append(T)
    c2w_nerf = np.stack([
        n2s.pose_sfm_to_nerf(np.asarray(T.inv().to_4x4(), np.float64))
        for T in poses_w2c
    ]).astype(np.float32)

    ds = NerfDataset(
        images=np.stack(views), c2w=c2w_nerf,
        fx=fx, fy=fx, cx=(res - 1) / 2, cy=(res - 1) / 2,
        width=res, height=res,
    )
    # cube half-size 0.2 -> grid space (x/3 + 0.5 permuted): ~0.5 +- 0.067;
    # pad generously
    aabb = np.array([[0.38, 0.38, 0.38], [0.62, 0.62, 0.62]], np.float32)

    field, params, info = train(ds, aabb=aabb, cfg=TrainConfig(n_steps=10000))
    print(f"NGP trained in {time.time()-t0:.0f}s, "
          f"final loss {info['history'][-1]}", flush=True)

    # teacher testbed (baked NGP) and student testbed (distilled)
    teacher = Testbed()
    teacher.set_field(field, params, bake=True)
    teacher.render_aabb.min = list(aabb[0])
    teacher.render_aabb.max = list(aabb[1])

    student = Testbed()
    student.set_field(field, params, bake=True)
    student.render_aabb.min = list(aabb[0])
    student.render_aabb.max = list(aabb[1])
    t1 = time.time()
    student.distill(seed=1)
    print(f"distilled in {time.time()-t1:.0f}s", flush=True)

    # ---- (a) render fidelity on held-out views -------------------------------
    from pixtrack_tpu.tracking.render_bridge import render_nerf_view

    psnrs_ts, psnrs_tgt, psnrs_sgt = [], [], []
    for k in range(8):
        ang = 2 * np.pi * (k + 0.5) / 8
        el = 0.45
        center = 0.85 * np.array(
            [np.cos(el) * np.sin(ang), np.sin(el), np.cos(el) * np.cos(ang)]
        )
        T = look_at_w2c(center)
        gt = render_mesh(mesh, T, camera).astype(np.float32) / 255.0
        te = render_nerf_view(teacher, n2s, T, camera, spp=1).astype(np.float32) / 255.0
        st = render_nerf_view(student, n2s, T, camera, spp=1).astype(np.float32) / 255.0
        # compare on the object support (render_nerf_view blacks background)
        m = (te.sum(-1) > 0) | (st.sum(-1) > 0)
        mg = m & (np.abs(gt.sum(-1) - 3.0) > 1e-3)
        psnrs_ts.append(psnr(st[m], te[m]))
        psnrs_tgt.append(psnr(te[mg], gt[mg]))
        psnrs_sgt.append(psnr(st[mg], gt[mg]))
    print(f"PSNR student-vs-teacher: {np.mean(psnrs_ts):.2f} dB "
          f"(teacher-vs-gt {np.mean(psnrs_tgt):.2f}, "
          f"student-vs-gt {np.mean(psnrs_sgt):.2f})", flush=True)

    # ---- (b) tracking delta: teacher vs student reference renders -----------
    from mesh_world import make_mesh_scene
    from pixtrack_tpu.align.lm import AlignConfig
    from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
    from pixtrack_tpu.tracking import PixTrackTracker, TrackerConfig

    tres = 192
    tcam = Camera.pinhole(tres * 1.1, tres * 1.1, (tres - 1) / 2,
                          (tres - 1) / 2, tres, tres)
    scene = make_mesh_scene(mesh, tcam, n_refs=12, n_points=600)
    gt_traj = []
    for i in range(8):
        ang = 0.05 * i
        el = 0.35 + 0.06 * np.sin(0.5 * i)
        center = 0.9 * np.array([np.sin(ang), el, np.cos(ang)])
        gt_traj.append(look_at_w2c(center))
    frames = [
        (f"f{i:03d}.png", render_mesh(mesh, T, tcam))
        for i, T in enumerate(gt_traj)
    ]

    def track_with(tb, label):
        ex = FeatureExtractor(HandcraftedExtractor(strides=(1, 4)), resize=None)
        cfg = TrackerConfig(
            reference_scale=1.0, cold_multiscale=(1,), steady_multiscale=(1,),
            covis_threshold=5, cost_threshold_min=0.08, refine_rounds=2,
            upright_ref_img="ref_0000.png",
        )
        tr = PixTrackTracker(scene, ex, tb, n2s, cfg,
                             align_cfg=AlignConfig(num_iters=60, robust_c=1.0))
        tr.camera = tcam
        tr.run(frames)
        errs = []
        for i, (n, _) in enumerate(frames):
            M = tr.pose_history[n]["T_refined"]
            T = Pose.from_4x4(jnp.asarray(M, jnp.float32))
            dR, dt = (T @ gt_traj[i].inv()).magnitude()
            errs.append(float(dR))
        print(f"[track {label}] rot err mean {np.mean(errs[1:]):.3f} "
              f"median {np.median(errs[1:]):.3f}", flush=True)
        return float(np.mean(errs[1:]))

    err_teacher = track_with(teacher, "teacher")
    err_student = track_with(student, "student")

    out = {
        "psnr_student_vs_teacher_db": round(float(np.mean(psnrs_ts)), 2),
        "psnr_teacher_vs_gt_db": round(float(np.mean(psnrs_tgt)), 2),
        "psnr_student_vs_gt_db": round(float(np.mean(psnrs_sgt)), 2),
        "tracking_rot_err_teacher_deg": round(err_teacher, 3),
        "tracking_rot_err_student_deg": round(err_student, 3),
        "ngp_train_steps": 10000,
        "seconds": round(time.time() - t0, 1),
    }
    with open(REPO / "assets" / "distill_fidelity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
