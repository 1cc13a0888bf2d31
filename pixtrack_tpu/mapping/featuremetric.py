"""Featuremetric refinement: keypoint adjustment + point/bundle adjustment.

The pixel-perfect-sfm role (reference scripts/run_reconstruction.py:22,52-61:
``PixSfM({"dense_features": {"max_edge": 1024}}).reconstruction(...)`` —
C++/Ceres refining keypoints and structure against S2DNet dense features).
TPU-native design: the same dense feature pyramids and bilinear-sampling
machinery as the tracker, with batched LM solves:

- **Keypoint adjustment (KA)**: each track's 2D observations shift to
  minimize feature-metric spread around the track's mean descriptor — a
  batched 2x2 LM per observation, all tracks in parallel.
- **Point adjustment (PA)**: each 3D point moves to minimize feature-metric
  residuals against its observations' descriptors across views — a batched
  3x3 LM per point, all points in parallel (poses fixed, the pipeline's
  common case since reconstruction poses come from renders/GT).
- **Pose adjustment**: per-image 6-DoF feature-metric refinement reusing
  align.lm directly (the tracker's solver IS the BA pose block).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.align.interpolate import interpolate_features
from pixtrack_tpu.features.extractor import FeatureExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.rotation import so3_hat
from pixtrack_tpu.sfm.scene import SceneModel


@dataclasses.dataclass(frozen=True)
class FeatureMetricConfig:
    num_iters: int = 20
    lambda_init: float = 1e-2
    level: int = 0            # pyramid level to refine against (finest)
    max_shift_px: float = 4.0  # KA trust region
    # PA prior on the initial triangulated position: feature-metric point
    # adjustment is weakly constrained along viewing rays (small-baseline
    # views), so anchor to the geometric solution.
    position_prior: float = 10.0


# ---------------------------------------------------------------- KA ----
def _interp_multi(flat, off, Wv, Hv, pts):
    """Bilinear sample + gradient from a MULTI-image flat feature table.

    ``flat`` (S, C) is all images' feature maps concatenated row-major;
    observation b lives in the image whose rows start at ``off[b]`` with
    width ``Wv[b]`` / height ``Hv[b]``. Same index-centered convention as
    align.interpolate.interpolate_features. Returns (values (B, C),
    grads (B, C, 2), valid (B,))."""
    x, y = pts[..., 0], pts[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    valid = (x0i >= 0) & (x0i + 1 <= Wv - 1) & (y0i >= 0) & (y0i + 1 <= Hv - 1)
    x0c = jnp.clip(x0i, 0, Wv - 2)
    y0c = jnp.clip(y0i, 0, Hv - 2)
    base = off + y0c * Wv + x0c
    f00 = jnp.take(flat, base, axis=0)
    f01 = jnp.take(flat, base + 1, axis=0)
    f10 = jnp.take(flat, base + Wv, axis=0)
    f11 = jnp.take(flat, base + Wv + 1, axis=0)
    wx0, wx1 = (1.0 - fx)[..., None], fx[..., None]
    wy0, wy1 = (1.0 - fy)[..., None], fy[..., None]
    values = (f00 * wx0 + f01 * wx1) * wy0 + (f10 * wx0 + f11 * wx1) * wy1
    gx = (f01 - f00) * wy0 + (f11 - f10) * wy1
    gy = (f10 - f00) * wx0 + (f11 - f01) * wx1
    return values, jnp.stack([gx, gy], axis=-1), valid


@functools.partial(jax.jit, static_argnames=("iters", "n_tracks"))
def _ka_solve(flat, off, Wv, Hv, p0, track_idx, lam, max_shift,
              iters: int, n_tracks: int):
    """The whole KA loop on device: per iteration, each observation takes
    one LM step toward its track's CURRENT mean descriptor (the target
    moves with the points — a batched block-coordinate descent on the
    track-spread objective), under a per-observation trust region around
    the initial location."""
    ones = jnp.ones(p0.shape[0], p0.dtype)
    cnt = jax.ops.segment_sum(ones, track_idx, num_segments=n_tracks)
    cnt = jnp.maximum(cnt, 1.0)

    def body(_, p):
        vals, grads, _ = _interp_multi(flat, off, Wv, Hv, p)
        sums = jax.ops.segment_sum(vals, track_idx, num_segments=n_tracks)
        target = sums[track_idx] / cnt[track_idx][:, None]
        r = vals - target
        J = grads  # (B, C, 2)
        g = jnp.einsum("bck,bc->bk", J, r)
        H = jnp.einsum("bck,bcl->bkl", J, J)
        H = H + (
            lam * jnp.diagonal(H, axis1=-2, axis2=-1)[..., None] + 1e-8
        ) * jnp.eye(2)
        delta = -jnp.linalg.solve(H, g[..., None])[..., 0]
        delta = jnp.clip(delta, -1.0, 1.0)
        drift = jnp.clip(p + delta - p0, -max_shift, max_shift)
        return p0 + drift

    return jax.lax.fori_loop(0, iters, body, p0)


def keypoint_adjustment(
    images: Dict[int, np.ndarray],
    keypoints: Dict[int, np.ndarray],
    tracks: List[List[Tuple[int, int]]],
    extractor: FeatureExtractor,
    cfg: FeatureMetricConfig = FeatureMetricConfig(),
) -> Dict[int, np.ndarray]:
    """Refine keypoint locations so tracks agree feature-metrically.

    Returns updated keypoints dict (corner convention preserved).

    Memory/compute layout: one flat (sum_i H_i*W_i, C) feature table for
    all images plus per-observation row offsets — each LM iteration is 4
    gathers per observation and two segment-sums, and the entire
    ``num_iters`` loop is one jitted program (the original per-observation
    feature-map stack materialized B full maps: 2-6 GB of captured
    constants on the 10-view rig and minutes of lowering)."""
    obs = [(ti, iid, kidx) for ti, tr in enumerate(tracks) for iid, kidx in tr]
    new_kp = {iid: kp.copy().astype(np.float64) for iid, kp in keypoints.items()}
    if not obs:
        return new_kp

    # extract finest-level features once per distinct image
    used = sorted({iid for _, iid, _ in obs})
    feats, scales = {}, {}
    for iid in used:
        pyr = extractor(images[iid])
        feats[iid] = np.asarray(pyr.levels[cfg.level], np.float32)
        scales[iid] = np.asarray(pyr.scales[cfg.level])

    offsets, rows = {}, 0
    for iid in used:
        offsets[iid] = rows
        H, W, _ = feats[iid].shape
        rows += H * W
    C = feats[used[0]].shape[-1]
    flat = np.concatenate([feats[i].reshape(-1, C) for i in used])

    iids = [o[1] for o in obs]
    off = np.asarray([offsets[i] for i in iids], np.int32)
    Wv = np.asarray([feats[i].shape[1] for i in iids], np.int32)
    Hv = np.asarray([feats[i].shape[0] for i in iids], np.int32)
    track_idx = np.asarray([o[0] for o in obs], np.int32)
    p0 = np.stack(
        [(new_kp[iid][kidx] - 0.5) * scales[iid] for _, iid, kidx in obs]
    ).astype(np.float32)

    p_final = np.asarray(
        _ka_solve(
            jnp.asarray(flat), jnp.asarray(off), jnp.asarray(Wv),
            jnp.asarray(Hv), jnp.asarray(p0), jnp.asarray(track_idx),
            jnp.float32(cfg.lambda_init), jnp.float32(cfg.max_shift_px),
            iters=cfg.num_iters, n_tracks=len(tracks),
        ),
        np.float64,
    )
    for (ti, iid, kidx), q in zip(obs, p_final):
        new_kp[iid][kidx] = q / scales[iid] + 0.5
    return new_kp


def refine_scene_keypoints(
    scene: SceneModel,
    images: Dict[int, np.ndarray],
    extractor: FeatureExtractor,
    cfg: FeatureMetricConfig = FeatureMetricConfig(),
    upsample: int = 1,
) -> SceneModel:
    """KA ROUND 2 on CONVERGED structure: re-run keypoint adjustment with
    the final model's tracks (post-culling, post-BA — cleaner topology than
    the pre-geometry KA pass), write the refined observations back into the
    image records, and return the scene for the caller to re-BA.

    ``upsample``: extract KA features on an N-x upsampled image (keypoints
    scaled along, trust region scaled along) — halves bilinear-interpolation
    bias, the dominant remaining term once tracks are clean.
    """
    tracks = []
    track_obs = []
    for pid in sorted(scene.points3D):
        rec = scene.points3D[pid]
        tr = [
            (int(i), int(k))
            for i, k in zip(rec.image_ids, rec.point2D_idxs)
            if int(i) in images
        ]
        if len(tr) >= 2:
            tracks.append(tr)
            track_obs.extend(tr)
    if not tracks:
        return scene
    kps = {
        int(iid): np.asarray(im.xys, np.float64).copy()
        for iid, im in scene.images.items()
        if int(iid) in images
    }
    if upsample > 1:
        import cv2

        imgs_u = {
            iid: cv2.resize(img, None, fx=upsample, fy=upsample,
                            interpolation=cv2.INTER_CUBIC)
            for iid, img in images.items()
        }
        kps_u = {iid: kp * upsample for iid, kp in kps.items()}
        cfg_u = dataclasses.replace(
            cfg, max_shift_px=cfg.max_shift_px * upsample
        )
        refined = keypoint_adjustment(imgs_u, kps_u, tracks, extractor, cfg_u)
        refined = {iid: kp / upsample for iid, kp in refined.items()}
    else:
        refined = keypoint_adjustment(images, kps, tracks, extractor, cfg)
    new_images = {}
    for iid, im in scene.images.items():
        if int(iid) in refined:
            im = dataclasses.replace(im, xys=refined[int(iid)])
        new_images[iid] = im
    return SceneModel(scene.cameras, new_images, scene.points3D)


# ---------------------------------------------------------------- PA ----
def point_adjustment(
    scene: SceneModel,
    images: Dict[int, np.ndarray],
    extractor: FeatureExtractor,
    cfg: FeatureMetricConfig = FeatureMetricConfig(),
    max_views: int = 8,
) -> np.ndarray:
    """Refine 3D point positions feature-metrically (poses fixed).

    Each point minimizes sum over observing views of
    || F_v(project_v(X)) - mean_v F_v(project_v(X)) ||^2
    via batched 3x3 LM. Returns refined xyz (M, 3).
    """
    # features + cameras/poses per image
    feats, scales, poses, cams = {}, {}, {}, {}
    for iid in scene.image_ids:
        iid = int(iid)
        img = images.get(iid)
        if img is None:
            continue
        pyr = extractor(img)
        feats[iid] = jnp.asarray(pyr.levels[cfg.level])
        scales[iid] = np.asarray(pyr.scales[cfg.level])
        poses[iid] = scene.pose_w2c(iid)
        cams[iid] = scene.camera_for_image(iid)

    M = len(scene.point_ids)
    V = max_views
    # pad per-point view lists
    fidx_list = sorted(feats.keys())
    fmap_stack = jnp.stack([feats[i] for i in fidx_list])
    f_of = {iid: k for k, iid in enumerate(fidx_list)}

    view_idx = np.zeros((M, V), np.int32)
    view_mask = np.zeros((M, V), np.float32)
    R_stack = np.zeros((M, V, 3, 3), np.float32)
    t_stack = np.zeros((M, V, 3), np.float32)
    K_f = np.zeros((M, V, 2), np.float32)
    K_c = np.zeros((M, V, 2), np.float32)
    sc_stack = np.ones((M, V, 2), np.float32)
    for mi, pid in enumerate(scene.point_ids):
        p = scene.points3D[int(pid)]
        vs = [int(i) for i in p.image_ids if int(i) in feats][:V]
        for vi, iid in enumerate(vs):
            view_idx[mi, vi] = f_of[iid]
            view_mask[mi, vi] = 1.0
            R_stack[mi, vi] = np.asarray(poses[iid].R)
            t_stack[mi, vi] = np.asarray(poses[iid].t)
            K_f[mi, vi] = np.asarray(cams[iid].f)
            K_c[mi, vi] = np.asarray(cams[iid].c)
            sc_stack[mi, vi] = scales[iid]

    xyz = jnp.asarray(scene.xyz, jnp.float32)

    @jax.jit
    def step(xyz, lam):
        # project into all views: (M, V, 2)
        pc = jnp.einsum("mvij,mj->mvi", jnp.asarray(R_stack), xyz) + jnp.asarray(t_stack)
        z = jnp.maximum(pc[..., 2], 1e-4)
        uv = pc[..., :2] / z[..., None]
        p2d = (uv * jnp.asarray(K_f) + jnp.asarray(K_c)) * jnp.asarray(sc_stack)

        def sample(vi_map_idx, q):
            f = fmap_stack[vi_map_idx]
            v, g, ok = interpolate_features(f, q[None])
            return v[0], g[0], ok[0]

        vals, grads, ok = jax.vmap(jax.vmap(sample))(jnp.asarray(view_idx), p2d)
        w = jnp.asarray(view_mask) * ok  # (M, V)
        mean = jnp.einsum("mv,mvc->mc", w, vals) / jnp.maximum(
            jnp.sum(w, 1), 1
        )[:, None]
        r = (vals - mean[:, None, :]) * w[..., None]  # (M, V, C)

        # d p2d / d X = scale * K_f * [1/z, -u/z] chain x R
        iz = 1.0 / z
        J_uv = jnp.stack(
            [
                jnp.stack([iz, jnp.zeros_like(iz), -uv[..., 0] * iz], -1),
                jnp.stack([jnp.zeros_like(iz), iz, -uv[..., 1] * iz], -1),
            ],
            axis=-2,
        )  # (M, V, 2, 3)
        J_pix = (
            J_uv
            * (jnp.asarray(K_f) * jnp.asarray(sc_stack))[..., None]
        )  # scale rows
        J_x = jnp.einsum("mvik,mvkj->mvij", J_pix, jnp.asarray(R_stack))
        J = jnp.einsum("mvcd,mvdk->mvck", grads, J_x)  # (M, V, C, 3)
        Jw = J * w[..., None, None]
        g = jnp.einsum("mvck,mvc->mk", Jw, r)
        H = jnp.einsum("mvck,mvcl->mkl", Jw, J)
        # position prior anchoring to the triangulated solution
        mu = cfg.position_prior
        g = g + mu * (xyz - xyz0)
        H = H + mu * jnp.eye(3)
        H = H + (lam * jnp.diagonal(H, axis1=-2, axis2=-1)[..., None] + 1e-8) * jnp.eye(3)
        delta = -jnp.linalg.solve(H, g[..., None])[..., 0]
        cost = jnp.sum(r * r, axis=(1, 2))
        return jnp.clip(delta, -0.02, 0.02), cost

    xyz0 = xyz
    lam = cfg.lambda_init
    for _ in range(cfg.num_iters):
        delta, cost = step(xyz, lam)
        xyz = xyz + delta
    return np.asarray(xyz)


def _scene_with(scene: SceneModel, poses: Dict[int, Pose],
                xyz: np.ndarray) -> SceneModel:
    """SceneModel with updated per-image poses and packed-order xyz."""
    images = {}
    for iid, im in scene.images.items():
        if int(iid) in poses:
            q, t = poses[int(iid)].to_quat_t()
            im = dataclasses.replace(
                im, qvec=np.asarray(q, np.float64),
                tvec=np.asarray(t, np.float64),
            )
        images[iid] = im
    points = {}
    for k, pid in enumerate(scene.point_ids):
        p = scene.points3D[int(pid)]
        points[int(pid)] = dataclasses.replace(
            p, xyz=np.asarray(xyz[k], np.float64)
        )
    return SceneModel(scene.cameras, images, points)


def featuremetric_ba(
    scene: SceneModel,
    images: Dict[int, np.ndarray],
    extractor: FeatureExtractor,
    rounds: int = 2,
    pose_iters: int = 30,
    cfg: FeatureMetricConfig = FeatureMetricConfig(),
    point_block: bool = True,
    finest_only: bool = True,
    verbose: bool = False,
) -> SceneModel:
    """Joint featuremetric refinement of poses AND points — the
    pixel-perfect-sfm featuremetric-BA role (reference
    scripts/run_reconstruction.py:52-61: PixSfM's Ceres BA against S2DNet
    dense features), as block-coordinate LM on TPU:

      (a) POSE block — each image's 6-DoF pose aligned with the tracker's
          own solver (align.lm) against the LEAVE-ONE-OUT track-mean
          descriptors of its observed points (the mean over the OTHER
          views' current projections — the self view would make the
          objective a fixed point of the current pose);
      (b) POINT block — ``point_adjustment``: each 3D point's batched 3x3
          featuremetric LM against its observations, anchored to the
          geometric solution.

    Keypoint-level geometry (KA + culling + BA) caps the arc rig at the
    keypoint-localization noise floor (~0.9 deg global median,
    assets/sfm_error_budget.json); this stage optimizes poses directly
    against dense features, below keypoint quantization.

    ``finest_only``: align poses on the finest pyramid level only — the
    corrections are sub-pixel, coarse levels only smear them.
    Returns a refined SceneModel (same tracks, new poses + xyz).
    """
    from pixtrack_tpu.align.lm import AlignConfig, align_pyramid
    from pixtrack_tpu.align.observations import (
        aggregate_observations,
        build_level_data,
        observe_points,
    )
    from pixtrack_tpu.features.pyramid import FeaturePyramid

    iids = [int(i) for i in scene.image_ids if int(i) in images]
    if len(iids) < 3:
        return scene
    pyrs = {iid: extractor(images[iid]) for iid in iids}
    poses = {iid: scene.pose_w2c(iid) for iid in iids}
    cams = {iid: scene.camera_for_image(iid) for iid in iids}
    M = len(scene.point_ids)
    if M == 0:
        return scene
    xyz = jnp.asarray(scene.xyz, jnp.float32)
    obs = {iid: np.zeros(M, bool) for iid in iids}
    for k, pid in enumerate(scene.point_ids):
        for im in scene.points3D[int(pid)].image_ids:
            if int(im) in obs:
                obs[int(im)][k] = True
    obs_j = {iid: jnp.asarray(m) for iid, m in obs.items()}

    n_levels = pyrs[iids[0]].num_levels
    lvl_sel = [0] if finest_only else list(range(n_levels))
    align_cfg = AlignConfig(num_iters=pose_iters)

    for r in range(rounds):
        per_view = {
            iid: observe_points(pyrs[iid], poses[iid], cams[iid], xyz,
                                obs_j[iid])
            for iid in iids
        }
        F = [jnp.stack([per_view[i][0][l] for i in iids]) for l in lvl_sel]
        Wg = [jnp.stack([per_view[i][1][l] for i in iids]) for l in lvl_sel]
        Vl = [jnp.stack([per_view[i][2][l] for i in iids]) for l in lvl_sel]
        for vi, iid in enumerate(iids):
            keep = np.ones(len(iids), bool)
            keep[vi] = False
            f_ref, w_ref, valid = [], [], []
            for li in range(len(lvl_sel)):
                f, w, va = aggregate_observations(
                    F[li][keep], Wg[li][keep], Vl[li][keep]
                )
                f_ref.append(f)
                w_ref.append(w)
                valid.append(va)
            pyr = pyrs[iid]
            pyr_sel = FeaturePyramid(
                levels=tuple(pyr.levels[l] for l in lvl_sel),
                scales=tuple(pyr.scales[l] for l in lvl_sel),
                confidences=(
                    None if pyr.confidences is None
                    else tuple(pyr.confidences[l] for l in lvl_sel)
                ),
            )
            levels = build_level_data(
                pyr_sel, tuple(f_ref), tuple(w_ref), tuple(valid),
                xyz, obs_j[iid],
            )
            final, _ = align_pyramid(poses[iid], levels, cams[iid], align_cfg)
            poses[iid] = final.T
        if point_block:
            scene_r = _scene_with(scene, poses, np.asarray(xyz))
            xyz = jnp.asarray(
                point_adjustment(scene_r, images, extractor, cfg), jnp.float32
            )
        if verbose:
            print(f"featuremetric BA round {r + 1}/{rounds} done")
    return _scene_with(scene, poses, np.asarray(xyz))
