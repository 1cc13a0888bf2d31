"""Featuremetric-BA experiment on the 10-view arc rig (VERDICT r4 #6).

Measures whether mapping/featuremetric.featuremetric_ba pushes the arc
rig below the keypoint-localization floor (r4: 0.92 deg global median with
culling + KA; oracle-keypoint bound is 0 deg). Caches the expensive mapper
run (incremental_sfm + KA, ~15 min on this box) so BA variants iterate in
seconds.

Usage: python scripts_dev/fmba_experiment.py [variant ...]
Variants: base r1 r2 r1_nopoint r2_all_levels ...
"""

import pickle
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

CACHE = Path("/tmp/fmba_arc_cache.pkl")


def _rot_deg(Ra, Rb):
    c = (np.trace(Ra @ Rb.T) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def metrics(rec, gt_poses):
    ids = sorted(rec.images)
    D = {
        i: np.asarray(gt_poses[i].R).T @ np.asarray(rec.pose_w2c(i).R)
        for i in ids
    }
    ref = min(ids, key=lambda i: np.median([_rot_deg(D[i], D[j]) for j in ids]))
    global_devs = [_rot_deg(D[i], D[ref]) for i in ids]
    c_est = np.stack([
        -np.asarray(rec.pose_w2c(i).R).T @ np.asarray(rec.pose_w2c(i).t)
        for i in ids
    ])
    c_gt = np.stack([
        -np.asarray(gt_poses[i].R).T @ np.asarray(gt_poses[i].t) for i in ids
    ])
    E0 = c_est - c_est.mean(0)
    G0 = c_gt - c_gt.mean(0)
    U, S, Vt = np.linalg.svd(G0.T @ E0)
    Dm = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    sc = np.trace(np.diag(S) @ Dm) / (E0 ** 2).sum()
    cerr = np.linalg.norm(sc * E0 @ (U @ Dm @ Vt).T - G0, axis=1)
    cfrac = np.median(cerr) / np.linalg.norm(G0, axis=1).mean()
    return float(np.median(global_devs)), float(cfrac)


def build_cache():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pixtrack_tpu.geometry import Camera
    from pixtrack_tpu.mapping.incremental import incremental_sfm
    from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
    from pixtrack_tpu.sfm import colmap_io
    from synthetic_world import look_at_w2c
    from test_mesh_render import make_cube_obj

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        mesh = load_obj(make_cube_obj(Path(td)))
    res = 192
    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                            (res - 1) / 2, res, res)
    views, gt_poses = {}, {}
    for i in range(10):
        ang = np.deg2rad(17.0) * i
        center = 0.9 * np.array(
            [np.sin(ang), 0.4 + 0.1 * np.sin(2 * ang), np.cos(ang)]
        )
        T = look_at_w2c(center)
        views[i + 1] = render_mesh(mesh, T, camera)
        gt_poses[i + 1] = T
    cam_rec = colmap_io.CameraRecord(
        1, "PINHOLE", res, res,
        np.array([res * 1.1, res * 1.1, res / 2.0, res / 2.0]),
    )
    t0 = time.time()
    rec = incremental_sfm(
        views, cam_rec, max_keypoints=768, nms_radius=1, verbose=True,
        match_kw=dict(min_score=0.5, ratio=0.98),
        featuremetric_ka=True,
    )
    print(f"mapper: {time.time() - t0:.0f}s")
    with open(CACHE, "wb") as f:
        pickle.dump({
            "cameras": rec.cameras, "images": rec.images,
            "points3D": rec.points3D, "views": views, "gt": gt_poses,
        }, f)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if not CACHE.exists():
        build_cache()
    from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
    from pixtrack_tpu.mapping.featuremetric import (
        FeatureMetricConfig,
        featuremetric_ba,
    )
    from pixtrack_tpu.sfm.scene import SceneModel

    with open(CACHE, "rb") as f:
        d = pickle.load(f)
    scene = SceneModel(d["cameras"], d["images"], d["points3D"])
    views, gt = d["views"], d["gt"]
    g, c = metrics(scene, gt)
    print(f"base (culling+KA): global {g:.3f} deg, centers {c:.4f}")

    ext = FeatureExtractor(HandcraftedExtractor(), resize=1024)
    variants = sys.argv[1:] or ["r1", "r2"]
    for v in variants:
        if v.startswith("ka2"):
            # KA round 2 on converged structure + re-BA (+ optional fmba)
            from pixtrack_tpu.mapping.bundle import bundle_adjust_scene
            from pixtrack_tpu.mapping.featuremetric import (
                refine_scene_keypoints,
            )

            up = 2 if "up2" in v else (3 if "up3" in v else 1)
            t0 = time.time()
            s2 = refine_scene_keypoints(scene, views, ext, upsample=up)
            s2 = bundle_adjust_scene(s2, iters=30)
            g, c = metrics(s2, gt)
            print(f"{v}: global {g:.3f} deg, centers {c:.4f} "
                  f"({time.time() - t0:.0f}s) upsample={up}")
            if "fmba" in v:
                out = featuremetric_ba(s2, views, ext, rounds=1)
                g, c = metrics(out, gt)
                print(f"{v}+fmba: global {g:.3f} deg, centers {c:.4f} "
                      f"({time.time() - t0:.0f}s)")
            if "iter" in v:
                s3 = refine_scene_keypoints(s2, views, ext, upsample=up)
                s3 = bundle_adjust_scene(s3, iters=30)
                g, c = metrics(s3, gt)
                print(f"{v} x2: global {g:.3f} deg, centers {c:.4f} "
                      f"({time.time() - t0:.0f}s)")
            continue
        kw = dict(rounds=1, point_block=True, finest_only=True)
        if v == "r2":
            kw["rounds"] = 2
        elif v == "r3":
            kw["rounds"] = 3
        elif v == "r1_nopoint":
            kw["point_block"] = False
        elif v == "r2_nopoint":
            kw.update(rounds=2, point_block=False)
        elif v == "r2_all_levels":
            kw.update(rounds=2, finest_only=False)
        elif v == "r2_pi60":
            kw.update(rounds=2, pose_iters=60)
        t0 = time.time()
        out = featuremetric_ba(scene, views, ext, **kw)
        g, c = metrics(out, gt)
        print(f"{v}: global {g:.3f} deg, centers {c:.4f} "
              f"({time.time() - t0:.0f}s)  {kw}")


if __name__ == "__main__":
    main()
