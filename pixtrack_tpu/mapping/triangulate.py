"""Multi-view triangulation against known poses.

Fills hloc's triangulation role (reference create_nerf_dataset_and_sfm.py:
95-105, create_sfm_from_obj.py:123-133: import features/matches into a
COLMAP db, triangulate against given poses). Design: tracks are built by
union-find over pairwise matches, then ALL tracks triangulate in one batched
padded DLT (vmapped SVD-free normal-equation solve) with vectorized
reprojection filtering — no per-point python loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.sfm import colmap_io
from pixtrack_tpu.sfm.scene import SceneModel


class _UnionFind:
    def __init__(self):
        self.parent: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.find(p)
            self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    keypoints: Dict[int, np.ndarray],
    matches: Dict[Tuple[int, int], np.ndarray],
    min_track_length: int = 2,
) -> List[List[Tuple[int, int]]]:
    """Union-find over matches -> tracks of (image_id, keypoint_idx).

    A track containing two observations in the SAME image is inconsistent
    and dropped (standard track-building rule).
    """
    uf = _UnionFind()
    for (i0, i1), m0 in matches.items():
        for k0 in np.nonzero(m0 >= 0)[0]:
            uf.union((i0, int(k0)), (i1, int(m0[k0])))
    groups: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for (img, kp_idx) in list(uf.parent.keys()):
        root = uf.find((img, kp_idx))
        groups.setdefault(root, []).append((img, kp_idx))
    tracks = []
    for obs in groups.values():
        imgs = [o[0] for o in obs]
        if len(obs) >= min_track_length and len(set(imgs)) == len(imgs):
            tracks.append(sorted(obs))
    return tracks


@jax.jit
def _triangulate_padded(P_stack, uv_stack, mask):
    """Batched DLT over padded tracks.

    P_stack  (T, V, 3, 4): per-track projection matrices (padded rows zero)
    uv_stack (T, V, 2):    pixel observations
    mask     (T, V):       validity of each observation

    Solves min ||A x|| via normal equations on the inhomogeneous DLT
    (x, y, z, 1): each observation contributes rows
        u * P3 - P1,  v * P3 - P2.
    """
    p1 = P_stack[..., 0, :]
    p2 = P_stack[..., 1, :]
    p3 = P_stack[..., 2, :]
    r1 = uv_stack[..., 0:1] * p3 - p1  # (T, V, 4)
    r2 = uv_stack[..., 1:2] * p3 - p2
    rows = jnp.concatenate([r1, r2], axis=1)  # (T, 2V, 4)
    m2 = jnp.concatenate([mask, mask], axis=1)[..., None]
    rows = rows * m2
    A = rows[..., :3]
    b = -rows[..., 3]
    AtA = jnp.einsum("tvi,tvj->tij", A, A)
    Atb = jnp.einsum("tvi,tv->ti", A, b)
    AtA = AtA + 1e-9 * jnp.eye(3)
    xyz = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    return xyz


def triangulate_tracks(
    tracks: List[List[Tuple[int, int]]],
    keypoints: Dict[int, np.ndarray],
    poses: Dict[int, Pose],
    cameras: Dict[int, Camera],
    camera_for_image: Dict[int, int],
    max_reproj_error: float = 4.0,
    min_tri_angle_deg: float = 0.5,
) -> Tuple[np.ndarray, List[List[Tuple[int, int]]], np.ndarray]:
    """Triangulate tracks; returns (xyz (M, 3), kept_tracks, errors (M,))."""
    if not tracks:
        return np.zeros((0, 3)), [], np.zeros(0)
    V = max(len(t) for t in tracks)
    T = len(tracks)
    P_stack = np.zeros((T, V, 3, 4), np.float64)
    uv_stack = np.zeros((T, V, 2), np.float64)
    mask = np.zeros((T, V), np.float64)

    Pmats = {}
    for iid, pose in poses.items():
        cam = cameras[camera_for_image[iid]]
        K = np.asarray(cam.K(), np.float64)
        Rt = np.concatenate(
            [np.asarray(pose.R, np.float64), np.asarray(pose.t, np.float64)[:, None]],
            axis=1,
        )
        Pmats[iid] = K @ Rt

    for ti, track in enumerate(tracks):
        for vi, (iid, kidx) in enumerate(track):
            P_stack[ti, vi] = Pmats[iid]
            uv_stack[ti, vi] = keypoints[iid][kidx]
            mask[ti, vi] = 1.0

    xyz = np.asarray(
        _triangulate_padded(
            jnp.asarray(P_stack, jnp.float32),
            jnp.asarray(uv_stack, jnp.float32),
            jnp.asarray(mask, jnp.float32),
        ),
        np.float64,
    )

    # vectorized reprojection filtering
    xyzh = np.concatenate([xyz, np.ones((T, 1))], axis=1)
    proj = np.einsum("tvij,tj->tvi", P_stack, xyzh)  # (T, V, 3)
    z = proj[..., 2]
    uv_hat = proj[..., :2] / np.where(np.abs(z[..., None]) < 1e-9, 1e-9, z[..., None])
    err = np.linalg.norm(uv_hat - uv_stack, axis=-1)
    err = np.where(mask > 0, err, 0.0)
    nobs = mask.sum(axis=1)
    mean_err = err.sum(axis=1) / np.maximum(nobs, 1)
    in_front = np.all((z > 1e-6) | (mask == 0), axis=1)

    # triangulation angle: max pairwise angle between viewing rays
    centers = {iid: np.asarray(p.center, np.float64) for iid, p in poses.items()}
    good_angle = np.zeros(T, bool)
    for ti, track in enumerate(tracks):
        cs = np.stack([centers[iid] for iid, _ in track])
        rays = xyz[ti][None] - cs
        rays /= np.linalg.norm(rays, axis=1, keepdims=True).clip(1e-12)
        cosmax = -1.0
        dots = rays @ rays.T
        ang = np.degrees(np.arccos(np.clip(dots, -1, 1)))
        good_angle[ti] = ang.max() > min_tri_angle_deg

    keep = (mean_err < max_reproj_error) & in_front & good_angle
    kept_tracks = [t for t, k in zip(tracks, keep) if k]
    return xyz[keep], kept_tracks, mean_err[keep]


def triangulate_scene(
    images: Dict[int, dict],
    keypoints: Dict[int, np.ndarray],
    matches: Dict[Tuple[int, int], np.ndarray],
    cameras: Dict[int, colmap_io.CameraRecord],
    min_track_length: int = 2,
    max_reproj_error: float = 4.0,
) -> SceneModel:
    """Build a full SceneModel by triangulating matches against known poses.

    ``images``: {image_id: {"name", "qvec", "tvec", "camera_id"}}.
    """
    tracks = build_tracks(keypoints, matches, min_track_length)
    poses = {
        iid: Pose.from_quat_t(
            np.asarray(im["qvec"], np.float32), np.asarray(im["tvec"], np.float32)
        )
        for iid, im in images.items()
    }
    cams_jax = {
        cid: Camera.from_colmap(rec.model, rec.params, rec.width, rec.height)
        for cid, rec in cameras.items()
    }
    cam_for_img = {iid: im["camera_id"] for iid, im in images.items()}
    # keypoints arrive in corner convention (COLMAP h5 layout); our Camera
    # projects index-centered, so shift observations by -0.5
    kp_ic = {iid: np.asarray(kp, np.float64) - 0.5 for iid, kp in keypoints.items()}
    xyz, kept, errs = triangulate_tracks(
        tracks, kp_ic, poses, cams_jax, cam_for_img,
        max_reproj_error=max_reproj_error,
    )

    # assemble COLMAP records
    img_records: Dict[int, colmap_io.ImageRecord] = {}
    obs_per_image: Dict[int, List[Tuple[float, float, int]]] = {
        iid: [] for iid in images
    }
    point_records: Dict[int, colmap_io.Point3DRecord] = {}
    for pid, (track, p, e) in enumerate(zip(kept, xyz, errs)):
        iids, idxs = [], []
        for (iid, kidx) in track:
            row = len(obs_per_image[iid])
            obs_per_image[iid].append(
                (keypoints[iid][kidx][0], keypoints[iid][kidx][1], pid)
            )
            iids.append(iid)
            idxs.append(row)
        point_records[pid] = colmap_io.Point3DRecord(
            pid, p, np.array([128, 128, 128], np.uint8), float(e),
            np.array(iids, np.int32), np.array(idxs, np.int32),
        )
    for iid, im in images.items():
        obs = obs_per_image[iid]
        xys = np.array([(x, y) for x, y, _ in obs]).reshape(-1, 2)
        p3ds = np.array([p for _, _, p in obs], np.int64)
        img_records[iid] = colmap_io.ImageRecord(
            iid, np.asarray(im["qvec"], np.float64), np.asarray(im["tvec"], np.float64),
            im["camera_id"], im["name"], xys, p3ds,
        )
    return SceneModel(cameras, img_records, point_records)
