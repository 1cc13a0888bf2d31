"""NeRF dataset creation from an SfM scene: the colmap2ingp role.

Computes the SfM->NeRF normalization (up-vector alignment, centroid, scale,
center-of-attention) and writes ``transforms.json`` + ``nerf2sfm.pkl`` in the
reference's artifact layout (colmap2ingp.py:284-371), so NeRF training and
all downstream pose-space conversions (ingp_utils.sfm_to_nerf_pose) work on
either side's assets.

The parameters are derived the standard colmap2nerf way: accumulate the
camera up-axis, center on the camera centroid, scale average camera distance
to 3, rotate the up vector onto +z, and shift by the least-squares closest
point to all optical axes (the object's center of attention).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from pixtrack_tpu.geometry.nerf_transform import C_CAM, P_W, NerfTransform
from pixtrack_tpu.sfm.scene import SceneModel


def _rotation_aligning(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit vector a to unit vector b."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        return np.eye(3) if c > 0 else -np.eye(3)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))


def closest_point_to_rays(
    origins: np.ndarray, dirs: np.ndarray, weights: Optional[np.ndarray] = None
) -> np.ndarray:
    """Least-squares point minimizing distance to a set of rays.

    Solves sum_i w_i (I - d_i d_i^T) (x - o_i) = 0 (the center-of-attention
    computation, reference colmap2ingp.py:193-207 uses pairwise closest
    points; the LS formulation is the closed-form equivalent).
    """
    d = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    if weights is None:
        weights = np.ones(len(d))
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for o, dd, w in zip(origins, d, weights):
        M = np.eye(3) - np.outer(dd, dd)
        A += w * M
        b += w * M @ o
    return np.linalg.solve(A + 1e-12 * np.eye(3), b)


def compute_nerf_transform(scene: SceneModel) -> NerfTransform:
    """Derive the similarity normalization from the scene's camera rig."""
    poses = []
    for iid in scene.image_ids:
        T = scene.pose_w2c(int(iid))
        c2w = np.asarray(T.inv().to_4x4(), np.float64)
        # axis-fixed frame (same fix the pose map applies)
        Rf = P_W @ c2w[:3, :3] @ C_CAM
        pos = P_W @ c2w[:3, 3]
        poses.append((Rf, pos))

    up = np.sum([Rf[:, 1] for Rf, _ in poses], axis=0)
    up = up / np.linalg.norm(up)
    centroid = np.mean([p for _, p in poses], axis=0)
    avglen = float(np.mean([np.linalg.norm(p - centroid) for _, p in poses]))
    R3 = _rotation_aligning(up, np.array([0.0, 0.0, 1.0]))
    R4 = np.eye(4)
    R4[:3, :3] = R3

    # center of attention in the normalized frame
    scale = 3.0 / avglen
    origins = np.stack([R3 @ ((p - centroid) * scale) for _, p in poses])
    # OpenGL optical axis is -z (third column negated)
    axes = np.stack([R3 @ (-Rf[:, 2]) for Rf, _ in poses])
    totp = closest_point_to_rays(origins, axes)

    return NerfTransform(
        centroid=centroid, avglen=avglen, R=R4, totp=totp, up=up
    )


def write_transforms_json(
    scene: SceneModel,
    nerf_tf: NerfTransform,
    out_path,
    image_dir_rel: str = "mapping",
    aabb_scale: int = 4,
) -> dict:
    """Write an instant-ngp-layout transforms.json for the scene's images."""
    cam = scene.cameras[next(iter(scene.cameras))]
    # intrinsics in corner convention (the json convention)
    from pixtrack_tpu.geometry import Camera

    c = Camera.from_colmap(cam.model, cam.params, cam.width, cam.height)
    fx, fy = float(c.f[0]), float(c.f[1])
    cx, cy = float(c.c[0]) + 0.5, float(c.c[1]) + 0.5
    angle_x = 2.0 * np.arctan2(cam.width / 2.0, fx)
    angle_y = 2.0 * np.arctan2(cam.height / 2.0, fy)
    frames = []
    for iid in scene.image_ids:
        T = scene.pose_w2c(int(iid))
        c2w_sfm = np.asarray(T.inv().to_4x4(), np.float64)
        c2w_nerf = nerf_tf.pose_sfm_to_nerf(c2w_sfm)
        frames.append(
            {
                "file_path": f"{image_dir_rel}/{scene.images[int(iid)].name}",
                "sharpness": 100.0,
                "transform_matrix": c2w_nerf.tolist(),
            }
        )
    meta = {
        "camera_angle_x": float(angle_x),
        "camera_angle_y": float(angle_y),
        "fl_x": fx,
        "fl_y": fy,
        "k1": float(cam.params[3]) if len(cam.params) > 3 else 0.0,
        "k2": 0.0,
        "p1": 0.0,
        "p2": 0.0,
        "cx": cx,
        "cy": cy,
        "w": int(cam.width),
        "h": int(cam.height),
        "aabb_scale": int(aabb_scale),
        "frames": frames,
    }
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def transforms_from_yaml(yaml_path, out_path, aabb_scale: int = 4) -> dict:
    """YAML-driven transforms.json writer — the pyrender2ingp role
    (reference pixtrack/utils/pyrender2ingp.py:112-371): synthetic scenes
    describe their camera rig in a scene_info.yaml instead of a COLMAP model.

    Expected YAML schema::

        camera: {width: W, height: H, fx: _, fy: _, cx: _, cy: _}
        frames:
          - {file_path: mapping/0001.png, c2w: [[...4x4...]]}   # SfM-space

    The same normalization (up/centroid/scale/center-of-attention) is derived
    from the YAML rig, and nerf2sfm.pkl is written next to transforms.json.
    """
    import yaml

    from pixtrack_tpu.sfm import colmap_io

    with open(yaml_path) as f:
        info = yaml.safe_load(f)
    cam = info["camera"]

    # build a throwaway SceneModel so the one normalization path is shared
    cameras = {
        1: colmap_io.CameraRecord(
            1, "PINHOLE", int(cam["width"]), int(cam["height"]),
            np.array([cam["fx"], cam["fy"], cam["cx"], cam["cy"]], np.float64),
        )
    }
    images = {}
    from pixtrack_tpu.geometry import Pose
    import jax.numpy as jnp

    for i, fr in enumerate(info["frames"]):
        c2w = np.asarray(fr["c2w"], np.float64)
        T = Pose.from_4x4(jnp.asarray(np.linalg.inv(c2w), jnp.float32))
        q, t = T.to_quat_t()
        images[i + 1] = colmap_io.ImageRecord(
            i + 1, np.asarray(q, np.float64), np.asarray(t, np.float64), 1,
            fr["file_path"].split("/")[-1], np.zeros((0, 2)), np.zeros(0, np.int64),
        )
    scene = SceneModel(cameras, images, {})
    nerf_tf = compute_nerf_transform(scene)
    rel = str(Path(info["frames"][0]["file_path"]).parent)
    meta = write_transforms_json(scene, nerf_tf, out_path, image_dir_rel=rel,
                                 aabb_scale=aabb_scale)
    nerf_tf.save(Path(out_path).parent / "nerf2sfm.pkl")
    return meta


def estimate_aabb_from_scene(
    scene: SceneModel, nerf_tf: NerfTransform, quantile: float = 0.01,
    margin: float = 0.05,
):
    """Grid-space (render_aabb / OBJ_AABB convention) bounding box of the
    scene's 3D points — the get_nerf_aabb_from_sfm role (reference
    ingp_utils.py:86-109, DBSCAN replaced by quantile trimming)."""
    from pixtrack_tpu.geometry.nerf_transform import nerf_to_ngp_points

    pts_nerf = nerf_tf.points_sfm_to_nerf(scene.xyz)
    pts_grid = nerf_to_ngp_points(pts_nerf)
    lo = np.quantile(pts_grid, quantile, axis=0) - margin
    hi = np.quantile(pts_grid, 1 - quantile, axis=0) + margin
    return [lo.tolist(), hi.tolist()]
