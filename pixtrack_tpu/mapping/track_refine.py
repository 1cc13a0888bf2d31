"""Warp-compensated photometric track refinement (sub-0.1 px targets).

The arc-rig error budget (assets/sfm_error_budget.json) shows the mapper is
keypoint-localization-bound: ORACLE correspondence positions give 0 deg
while everything real lands ~0.9 deg, because descriptors (patch or
featuremetric KA) drift systematically with viewpoint — a 17-deg baseline
perspectively distorts every local patch, and matching/refining against
unwarped appearance biases each observation by a few tenths of a pixel in a
view-correlated direction, which BENDS the weakly-constrained arc.

This module removes that bias the photogrammetric way (COLMAP patch-match /
pixel-perfect-sfm territory): for every track observation, align the
observation's local patch against the track's ANCHOR observation under the
plane-induced homography of the point's tangent plane:

  1. normals: local PCA over the k nearest 3D neighbors (cube faces and
     most object surfaces are locally planar), flipped toward the anchor
     camera;
  2. for each (anchor a -> obs b): the exact homography
     H = K_b (R_ab + t_ab n_a^T / d_a) K_a^{-1} maps anchor-patch sample
     coordinates into view b — perspective distortion compensated exactly
     to first geometric order;
  3. a 2-parameter Lucas-Kanade translation solve per observation (batched
     over ALL observations, one jitted program) aligns the warped patch
     photometrically; the refined keypoint replaces the observation.

The caller re-triangulates / re-BAs afterwards. All solves are (2x2);
everything is batched gathers + einsums — TPU-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.sfm.scene import SceneModel


@dataclasses.dataclass(frozen=True)
class TrackRefineConfig:
    patch: int = 9            # patch side (samples), anchor-view pixels
    iters: int = 8            # LK iterations
    max_shift_px: float = 3.0  # trust region around the initial keypoint
    knn: int = 8              # neighbors for normal estimation
    min_grad: float = 1e-4    # reject textureless patches
    max_planarity: float = 0.15  # PCA lambda_min/lambda_mid gate (edges out)
    # accept a refinement only if the warped-photometric residual actually
    # improved (bad normals / occlusions / specularity leave it flat or up)
    accept_ratio: float = 0.8


def estimate_normals(xyz: np.ndarray, knn: int = 8,
                     return_planarity: bool = False):
    """Per-point normal via local PCA (smallest eigenvector of the k-NN
    scatter). Orientation is left unresolved here (callers flip per view).

    ``return_planarity``: also return lambda_min / lambda_mid — near 0 for
    locally planar neighborhoods, ~1 for isotropic scatter. Keypoints on
    OBJECT EDGES (where Harris loves to fire) have non-planar
    neighborhoods and a meaningless tangent plane; callers gate on this.
    """
    n = len(xyz)
    k = min(knn + 1, n)
    d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, 1:k]
    nbrs = xyz[idx]  # (N, k-1, 3)
    ctr = nbrs.mean(axis=1, keepdims=True)
    X = nbrs - ctr
    cov = np.einsum("nkd,nke->nde", X, X)
    w, v = np.linalg.eigh(cov)
    if return_planarity:
        plan = w[:, 0] / np.maximum(w[:, 1], 1e-12)
        return v[:, :, 0], plan
    return v[:, :, 0]  # (N, 3) smallest-eigenvalue direction


def _gray_stack(images: Dict[int, np.ndarray], iids):
    out = {}
    for iid in iids:
        img = np.asarray(images[iid], np.float32)
        if img.dtype == np.uint8 or img.max() > 2.0:
            img = img / 255.0
        if img.ndim == 3:
            img = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
        out[iid] = img.astype(np.float32)
    return out


@jax.jit
def _lk_batch(flat, off, Wv, Hv, Hmats, u_a, grid, patch_a, p0,
              iters: int = 8, max_shift: float = 3.0):
    """Batched warp-compensated LK translation solve.

    flat   (S,)    all target images' grayscale, concatenated row-major
    off/Wv/Hv (B,) per-observation image offsets / widths / heights
    Hmats  (B,3,3) anchor->obs plane-induced homographies (pixel coords)
    u_a    (B,2)   anchor keypoint (anchor-image pixels)
    grid   (P,2)   patch sample offsets (anchor pixels)
    patch_a (B,P)  anchor patch values (mean-removed)
    p0     (B,2)   initial obs keypoint (obs-image pixels)
    Returns (p_refined (B,2), ok (B,))."""

    def bilinear(pts, off_b, W_b, H_b):
        x, y = pts[..., 0], pts[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx, fy = x - x0, y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        valid = (x0i >= 0) & (x0i + 1 <= W_b - 1) & (y0i >= 0) & (
            y0i + 1 <= H_b - 1
        )
        x0c = jnp.clip(x0i, 0, W_b - 2)
        y0c = jnp.clip(y0i, 0, H_b - 2)
        base = off_b + y0c * W_b + x0c
        f00 = flat[base]
        f01 = flat[base + 1]
        f10 = flat[base + W_b]
        f11 = flat[base + W_b + 1]
        v = ((f00 * (1 - fx) + f01 * fx) * (1 - fy)
             + (f10 * (1 - fx) + f11 * fx) * fy)
        gx = (f01 - f00) * (1 - fy) + (f11 - f10) * fy
        gy = (f10 - f00) * (1 - fx) + (f11 - f01) * fx
        return v, jnp.stack([gx, gy], -1), valid

    # warp the anchor patch grid into the obs view through H (exact)
    pts_a = u_a[:, None, :] + grid[None, :, :]            # (B, P, 2)
    ones = jnp.ones(pts_a.shape[:2] + (1,), pts_a.dtype)
    ph = jnp.concatenate([pts_a, ones], -1)               # (B, P, 3)
    q = jnp.einsum("bij,bpj->bpi", Hmats, ph)
    base_b = q[..., :2] / jnp.maximum(jnp.abs(q[..., 2:]), 1e-8) * jnp.sign(
        q[..., 2:]
    )                                                     # (B, P, 2)
    # the warp of the keypoint itself: delta is measured from H(u_a) so the
    # final refined keypoint is H(u_a)+delta, initialized at p0
    u_warp = base_b[:, (grid.shape[0] - 1) // 2, :]       # center sample
    delta0 = p0 - u_warp

    def residual(delta):
        pts = base_b + delta[:, None, :]
        v, g, valid = bilinear(
            pts, off[:, None], Wv[:, None], Hv[:, None]
        )
        vm = v - jnp.sum(jnp.where(valid, v, 0.0), 1, keepdims=True) / (
            jnp.maximum(jnp.sum(valid, 1, keepdims=True), 1)
        )
        r = jnp.where(valid, vm - patch_a, 0.0)           # (B, P)
        gw = jnp.where(valid[..., None], g, 0.0)
        return r, gw, valid

    def body(_, carry):
        delta, _ok = carry
        r, gw, _ = residual(delta)
        Jg = jnp.einsum("bpk,bp->bk", gw, r)              # (B, 2)
        Hm = jnp.einsum("bpk,bpl->bkl", gw, gw)
        tr = jnp.trace(Hm, axis1=-2, axis2=-1)
        ok = tr > 1e-6
        Hm = Hm + (1e-3 * tr[:, None, None] + 1e-9) * jnp.eye(2)
        step = -jnp.linalg.solve(Hm, Jg[..., None])[..., 0]
        step = jnp.clip(step, -1.0, 1.0)
        new = jnp.clip(delta + step, delta0 - max_shift, delta0 + max_shift)
        return new, ok

    r0, _, v0 = residual(delta0)
    cost0 = jnp.sum(r0 * r0, 1) / jnp.maximum(jnp.sum(v0, 1), 1)
    delta, ok = jax.lax.fori_loop(
        0, iters, body, (delta0, jnp.ones(p0.shape[0], bool))
    )
    r1, _, v1 = residual(delta)
    cost1 = jnp.sum(r1 * r1, 1) / jnp.maximum(jnp.sum(v1, 1), 1)
    return u_warp + delta, ok, cost0, cost1


def refine_tracks_photometric(
    scene: SceneModel,
    images: Dict[int, np.ndarray],
    cfg: TrackRefineConfig = TrackRefineConfig(),
) -> SceneModel:
    """Refine every track observation against its anchor view under the
    plane-induced homography. Returns a SceneModel with updated ``xys``
    (the caller should re-triangulate / re-BA)."""
    iids = sorted(int(i) for i in scene.image_ids if int(i) in images)
    if len(iids) < 2 or not scene.points3D:
        return scene
    gray = _gray_stack(images, iids)
    offsets, rows = {}, 0
    for iid in iids:
        offsets[iid] = rows
        H, W = gray[iid].shape
        rows += H * W
    flat = np.concatenate([gray[i].reshape(-1) for i in iids])

    cams = {iid: scene.camera_for_image(iid) for iid in iids}
    poses = {iid: scene.pose_w2c(iid) for iid in iids}
    K = {iid: np.asarray(cams[iid].K(), np.float64) for iid in iids}
    Kinv = {iid: np.linalg.inv(K[iid]) for iid in iids}
    Rt = {
        iid: (np.asarray(poses[iid].R, np.float64),
              np.asarray(poses[iid].t, np.float64))
        for iid in iids
    }

    pids = sorted(scene.points3D)
    xyz = np.stack([scene.points3D[p].xyz for p in pids])
    normals, planarity = estimate_normals(xyz, cfg.knn, return_planarity=True)

    # anchor per track: the observation whose view is most frontal to the
    # estimated plane (max |n . view_dir|) — best-resolved appearance
    P = cfg.patch
    half = (P - 1) / 2.0
    gy, gx = np.mgrid[0:P, 0:P]
    grid = np.stack([gx.ravel() - half, gy.ravel() - half], -1).astype(
        np.float32
    )  # center sample at index (P^2-1)//2

    obs_iid, obs_kidx, obs_Hm, obs_ua, obs_p0, obs_anchor_iid = (
        [], [], [], [], [], []
    )
    for mi, pid in enumerate(pids):
        rec = scene.points3D[pid]
        tr = [
            (int(i), int(k))
            for i, k in zip(rec.image_ids, rec.point2D_idxs)
            if int(i) in gray
        ]
        if len(tr) < 2:
            continue
        if planarity[mi] > cfg.max_planarity:
            continue  # edge/corner point: tangent plane is meaningless
        X = xyz[mi]
        n = normals[mi]

        def frontality(iid):
            R, t = Rt[iid]
            Xc = R @ X + t
            vd = Xc / max(np.linalg.norm(Xc), 1e-9)
            return abs(float(n @ R.T @ vd))

        a_iid, a_kidx = max(tr, key=lambda o: frontality(o[0]))
        Ra, ta = Rt[a_iid]
        Xa = Ra @ X + ta
        # plane in anchor-camera coords: n_a . x = d_a
        n_a = Ra @ n
        if n_a @ Xa > 0:          # flip toward the camera (-z facing)
            n_a = -n_a
        d_a = float(n_a @ Xa)
        if abs(d_a) < 1e-9:
            continue
        u_a = np.asarray(scene.images[a_iid].xys[a_kidx], np.float64) - 0.5
        for (b_iid, b_kidx) in tr:
            if b_iid == a_iid:
                continue
            Rb, tb = Rt[b_iid]
            R_ab = Rb @ Ra.T
            t_ab = tb - R_ab @ ta
            Hm = K[b_iid] @ (R_ab + np.outer(t_ab, n_a) / d_a) @ Kinv[a_iid]
            obs_iid.append(b_iid)
            obs_kidx.append(b_kidx)
            obs_Hm.append(Hm)
            obs_ua.append(u_a)
            obs_p0.append(
                np.asarray(scene.images[b_iid].xys[b_kidx], np.float64) - 0.5
            )
            obs_anchor_iid.append(a_iid)
    if not obs_iid:
        return scene

    B = len(obs_iid)
    # anchor patches (sampled on host once; mean-removed)
    patch_a = np.zeros((B, P * P), np.float32)
    for b in range(B):
        g = gray[obs_anchor_iid[b]]
        Hh, Wh = g.shape
        pts = obs_ua[b][None, :] + grid
        x = np.clip(pts[:, 0], 0, Wh - 1.001)
        y = np.clip(pts[:, 1], 0, Hh - 1.001)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx, fy = x - x0, y - y0
        v = (g[y0, x0] * (1 - fx) * (1 - fy) + g[y0, x0 + 1] * fx * (1 - fy)
             + g[y0 + 1, x0] * (1 - fx) * fy + g[y0 + 1, x0 + 1] * fx * fy)
        patch_a[b] = v - v.mean()

    grad_mag = np.abs(np.diff(patch_a.reshape(B, P, P), axis=2)).mean((1, 2))
    texture_ok = grad_mag > cfg.min_grad

    p_ref, ok, cost0, cost1 = _lk_batch(
        jnp.asarray(flat),
        jnp.asarray([offsets[i] for i in obs_iid], jnp.int32),
        jnp.asarray([gray[i].shape[1] for i in obs_iid], jnp.int32),
        jnp.asarray([gray[i].shape[0] for i in obs_iid], jnp.int32),
        jnp.asarray(np.stack(obs_Hm), jnp.float32),
        jnp.asarray(np.stack(obs_ua), jnp.float32),
        jnp.asarray(grid),
        jnp.asarray(patch_a),
        jnp.asarray(np.stack(obs_p0), jnp.float32),
        iters=cfg.iters,
        max_shift=cfg.max_shift_px,
    )
    p_ref = np.asarray(p_ref, np.float64) + 0.5
    cost0 = np.asarray(cost0)
    cost1 = np.asarray(cost1)
    ok = np.asarray(ok) & texture_ok
    # accept only genuinely improved photometric fits
    ok = ok & (cost1 <= np.maximum(cfg.accept_ratio * cost0, 1e-8))
    # keep refinements inside the trust region of the original keypoint
    shift = np.linalg.norm(
        p_ref - (np.stack(obs_p0) + 0.5), axis=1
    )
    ok = ok & (shift <= cfg.max_shift_px + 1e-6)

    new_images = {
        iid: dataclasses.replace(im, xys=np.asarray(im.xys, np.float64).copy())
        for iid, im in scene.images.items()
    }
    n_applied = 0
    for b in range(B):
        if ok[b]:
            new_images[obs_iid[b]].xys[obs_kidx[b]] = p_ref[b]
            n_applied += 1
    out = SceneModel(scene.cameras, new_images, scene.points3D)
    out._track_refine_applied = n_applied  # debug/telemetry
    return out
