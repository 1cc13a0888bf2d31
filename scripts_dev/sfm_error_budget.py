"""SfM error-budget oracle (VERDICT r2 #4 diagnosis).

The 10-view arc plateaus at ~2.6-2.9 deg median global rotation with only
~0.4-0.5 px reprojection residual — 26x the angular noise the residual
implies, i.e. a SYSTEMATIC error, which the r2/r3 analyses attributed to
the handcrafted-descriptor noise floor. This script separates the error
sources by swapping oracle components into the production mapper:

  A. production        — Harris keypoints, patch MNN matching
  B. oracle matches    — same detected keypoints, matches from GT depth
                         (2 px gate): isolates MATCHING error
  C. oracle keypoints  — GT 3D points projected with subpixel accuracy,
                         GT matches: isolates DETECTOR LOCALIZATION error

If B ~= A, matching is not the bottleneck and no learned matcher can fix
the plateau; if C is sub-degree while B is not, keypoint localization
(rasterization aliasing) dominates; if even C plateaus, the
geometry/BA stack itself carries a bias.

Runs on CPU (PYTHONPATH=/root/repo JAX_PLATFORMS=cpu) so the TPU stays
free. Writes assets/sfm_error_budget.json.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pixtrack_tpu.geometry import Camera
    from pixtrack_tpu.mapping.detector import detect_keypoints
    from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
    from pixtrack_tpu.mapping import incremental as inc
    from pixtrack_tpu.sfm import colmap_io
    from test_mesh_render import make_cube_obj
    from synthetic_world import look_at_w2c
    from test_incremental_sfm import _check_rig_reconstruction

    import tempfile

    t0 = time.time()
    print("backend:", jax.default_backend(), flush=True)
    tmp = Path(tempfile.mkdtemp())
    mesh = load_obj(make_cube_obj(tmp))
    res = 192
    fx = res * 1.1
    cx = (res - 1) / 2
    camera = Camera.pinhole(fx, fx, cx, cx, res, res)
    views, gt_poses, depths = {}, {}, {}
    for i in range(10):
        ang = np.deg2rad(17.0) * i
        center = 0.9 * np.array(
            [np.sin(ang), 0.4 + 0.1 * np.sin(2 * ang), np.cos(ang)]
        )
        T = look_at_w2c(center)
        img, depth = render_mesh(mesh, T, camera, return_depth=True)
        views[i + 1] = img
        gt_poses[i + 1] = T
        depths[i + 1] = np.asarray(depth)
    cam_rec = colmap_io.CameraRecord(
        1, "PINHOLE", res, res, np.array([fx, fx, res / 2.0, res / 2.0])
    )
    ids = sorted(views)

    def backproject(kp, i):
        """kp (N, 2) in view i -> (Xw (N, 3), has_depth (N,))."""
        xi = np.clip(np.round(kp[:, 0]).astype(int), 0, res - 1)
        yi = np.clip(np.round(kp[:, 1]).astype(int), 0, res - 1)
        z = depths[i][yi, xi]
        has = z > 0
        Xc = np.stack(
            [(kp[:, 0] - cx) / fx * z, (kp[:, 1] - cx) / fx * z, z], -1
        )
        T = gt_poses[i]
        R, t = np.asarray(T.R), np.asarray(T.t)
        return (Xc - t) @ R, has

    def gt_matches(kp0, i, kp1, j, tol_px=2.0):
        """Depth-verified assignment kp0 -> kp1 (N0,) int32, -1 unmatched."""
        Xw, has = backproject(kp0, i)
        uv, vis = camera.world2image(gt_poses[j], jnp.asarray(Xw, jnp.float32))
        uv = np.asarray(uv)
        vis = np.asarray(vis) & has
        # occlusion check in view j
        T = gt_poses[j]
        Rj, tj = np.asarray(T.R), np.asarray(T.t)
        zc = (Xw @ Rj.T + tj)[:, 2]
        xj = np.clip(np.round(uv[:, 0]).astype(int), 0, res - 1)
        yj = np.clip(np.round(uv[:, 1]).astype(int), 0, res - 1)
        zb = depths[j][yj, xj]
        vis &= (zb > 0) & (np.abs(zb - zc) < 0.03 * np.abs(zc))
        d2 = ((uv[:, None, :] - kp1[None, :, :]) ** 2).sum(-1)
        m = np.full(len(kp0), -1, np.int32)
        best = d2.argmin(1)
        ok = vis & (d2[np.arange(len(kp0)), best] <= tol_px ** 2)
        m[ok] = best[ok]
        return m

    def run(label, keypoints, pair_matches):
        rec = inc.incremental_sfm(
            views, cam_rec, verbose=False,
            keypoints=keypoints, pair_matches=pair_matches,
            max_keypoints=768, nms_radius=1,
            match_kw=dict(min_score=0.5, ratio=0.98),
        )
        g, c, r = _check_rig_reconstruction(
            rec, gt_poses, 10, min_registered=9, min_points=100,
            pairwise_gate_deg=90.0, global_gate_deg=90.0,
            center_gate_frac=9.0, reproj_gate_px=99.0,
        )
        out = {"global_rot_med_deg": round(float(g), 3),
               "center_med_frac": round(float(c), 4),
               "reproj_px": round(float(r), 3)}
        print(f"{label}: {out} ({time.time()-t0:.0f}s)", flush=True)
        return out

    # A. production
    res_a = run("A production", None, None)

    # detected keypoints for B
    kps = {}
    for i in ids:
        kp, _ = detect_keypoints(views[i], max_keypoints=768, nms_radius=1)
        kps[i] = np.asarray(kp, np.float32)

    # B. oracle matches over detected keypoints
    pm = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            m = gt_matches(kps[i], i, kps[j], j)
            if (m >= 0).sum() >= 12:
                pm[(i, j)] = m  # m0-vector format (match_descriptors style)
    res_b = run("B oracle-matches", kps, pm)

    # C. oracle keypoints + oracle matches: GT 3D points projected exactly
    rng = np.random.default_rng(0)
    pts = []
    # sample GT surface points from each view's depth map
    for i in ids[::3]:
        ys, xs = np.nonzero(depths[i] > 0)
        sel = rng.choice(len(ys), size=min(400, len(ys)), replace=False)
        kp = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)
        Xw, has = backproject(kp, i)
        pts.append(Xw[has])
    Xw = np.concatenate(pts)[:800]
    kps_c, vis_c = {}, {}
    for i in ids:
        uv, vis = camera.world2image(gt_poses[i], jnp.asarray(Xw, jnp.float32))
        uv = np.asarray(uv)
        vis = np.asarray(vis)
        T = gt_poses[i]
        Rj, tj = np.asarray(T.R), np.asarray(T.t)
        zc = (Xw @ Rj.T + tj)[:, 2]
        xj = np.clip(np.round(uv[:, 0]).astype(int), 0, res - 1)
        yj = np.clip(np.round(uv[:, 1]).astype(int), 0, res - 1)
        zb = depths[i][yj, xj]
        vis = vis & (zb > 0) & (np.abs(zb - zc) < 0.03 * np.abs(zc))
        # +0.5: incremental_sfm expects corner-convention keypoints
        kps_c[i] = (uv + 0.5).astype(np.float32)
        vis_c[i] = vis
    pm_c = {}
    N = len(Xw)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            both = vis_c[i] & vis_c[j]
            if both.sum() >= 12:
                m = np.full(N, -1, np.int32)
                m[both] = np.nonzero(both)[0] * 0 + np.arange(N)[both]
                pm_c[(i, j)] = m
    res_c = run("C oracle-keypoints", kps_c, pm_c)

    out = {
        "rig": "10-view 17deg arc, 192 px, cube mesh",
        "A_production": res_a,
        "B_oracle_matches": res_b,
        "C_oracle_keypoints": res_c,
        "seconds": round(time.time() - t0, 1),
    }
    (REPO / "assets" / "sfm_error_budget.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
