"""Synthetic tracking world for end-to-end tests.

Builds everything the tracker needs without training a NeRF: an analytic
density/color field served through the Testbed facade (the render mock the
reference's structure suggests — SURVEY.md §4), a consistent synthetic SfM
scene of surface points, and query frames rendered from ground-truth poses.

Geometry: the object is an asymmetric textured blob (union of three spheres,
see nerf.dataset.blob_scene) near the center of the grid-space unit cube.
With the identity NerfTransform, SfM space relates to NeRF space by the fixed
axis swap (x, y, z) -> (y, x, -z) and grid space by a further x3 scale, so
the object sits near the SfM origin at roughly 0.3 units radius.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.nerf.dataset import blob_scene_T
from pixtrack_tpu.nerf.testbed import Testbed
from pixtrack_tpu.sfm import colmap_io
from pixtrack_tpu.sfm.scene import SceneModel


# Blob geometry in grid space (must match nerf.dataset.blob_scene).
_BLOB_CENTERS_GRID = np.array(
    [[0.5, 0.5, 0.5], [0.58, 0.54, 0.46], [0.45, 0.44, 0.56]]
)
_BLOB_RADII_GRID = np.array([0.10, 0.07, 0.06])


class _AnalyticFieldT:
    """Duck-typed NGPField serving the analytic blob object, feature-major."""

    def apply(self, params, xT, dT=None, method=None):
        sigma, rgbT = blob_scene_T(xT)
        return sigma, rgbT


def make_testbed(n_coarse=96) -> Testbed:
    tb = Testbed()
    tb.set_field(_AnalyticFieldT(), params=None)
    tb.render_aabb.min = [0.3, 0.3, 0.3]
    tb.render_aabb.max = [0.7, 0.7, 0.7]
    tb.n_coarse = n_coarse
    tb.n_fine = 0
    return tb


def look_at_w2c(center: np.ndarray, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])) -> Pose:
    """OpenCV-convention world-to-camera pose looking from center at target."""
    z = target - center
    z = z / np.linalg.norm(z)  # camera z: forward
    x = np.cross(z, up)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0).astype(np.float32)  # rows: world->cam
    t = (-R @ center).astype(np.float32)
    return Pose.from_Rt(R, t)


def _fibonacci_sphere(n):
    i = np.arange(n, dtype=np.float64)
    phi = np.arccos(1 - 2 * (i + 0.5) / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=1,
    )


def _grid_to_sfm(x_grid: np.ndarray) -> np.ndarray:
    """grid [0,1]^3 -> SfM coords under the identity NerfTransform."""
    from pixtrack_tpu.geometry.nerf_transform import P_W, ngp_to_nerf_points

    x_nerf = ngp_to_nerf_points(x_grid)
    return (x_nerf @ P_W).astype(np.float32)  # P_W symmetric orthogonal


def sphere_surface_points(n=400, radius=None, seed=0) -> np.ndarray:
    """Points on the SfM-space blob surface (union of spheres, outer shell)."""
    per = n // len(_BLOB_RADII_GRID)
    pts_grid = []
    for c, r in zip(_BLOB_CENTERS_GRID, _BLOB_RADII_GRID):
        cand = c + _fibonacci_sphere(per * 2) * r
        # keep points not inside any OTHER sphere (visible shell)
        d = np.linalg.norm(cand[:, None, :] - _BLOB_CENTERS_GRID, axis=-1)
        outside = (d >= _BLOB_RADII_GRID * 0.995).sum(1) >= 2
        pts_grid.append(cand[outside][:per])
    pts_grid = np.concatenate(pts_grid)
    return _grid_to_sfm(pts_grid)


def make_scene(camera: Camera, n_refs=12, n_points=400, dist=1.6) -> SceneModel:
    """Synthetic SfM model: ring of reference views observing surface points."""
    p3d = sphere_surface_points(n_points)
    cameras = {
        1: colmap_io.CameraRecord(
            1,
            "PINHOLE",
            int(float(camera.width)),
            int(float(camera.height)),
            np.array(
                [
                    float(camera.f[0]),
                    float(camera.f[1]),
                    float(camera.c[0]) + 0.5,
                    float(camera.c[1]) + 0.5,
                ]
            ),
        )
    }
    images = {}
    tracks = {k: ([], []) for k in range(n_points)}
    for i in range(n_refs):
        ang = 2 * np.pi * i / n_refs
        el = 0.25 * np.sin(3 * ang)
        center = dist * np.array(
            [np.cos(el) * np.sin(ang), np.sin(el), np.cos(el) * np.cos(ang)]
        )
        T = look_at_w2c(center)
        p2d, valid = camera.world2image(T, jnp.asarray(p3d))
        p2d = np.asarray(p2d)
        valid = np.asarray(valid)
        # visibility: points whose outward normal (from the nearest blob
        # center) faces the camera
        centers_sfm = _grid_to_sfm(_BLOB_CENTERS_GRID)
        d2c = np.linalg.norm(p3d[:, None, :] - centers_sfm[None], axis=-1)
        nearest = centers_sfm[np.argmin(d2c, axis=1)]
        normals = p3d - nearest
        normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-9)
        towards = (center[None, :] - p3d) / np.linalg.norm(
            center[None, :] - p3d, axis=1, keepdims=True
        )
        facing = (normals * towards).sum(1) > 0.1
        obs = np.nonzero(valid & facing)[0]
        q, t = T.to_quat_t()
        for row, pid in enumerate(obs):
            tracks[int(pid)][0].append(i + 1)
            tracks[int(pid)][1].append(row)
        images[i + 1] = colmap_io.ImageRecord(
            i + 1,
            np.asarray(q, np.float64),
            np.asarray(t, np.float64),
            1,
            f"ref_{i:04d}.png",
            p2d[obs],
            obs.astype(np.int64),
        )
    points = {}
    for pid, (iids, idxs) in tracks.items():
        if not iids:
            continue
        points[pid] = colmap_io.Point3DRecord(
            pid, p3d[pid].astype(np.float64), np.array([128, 128, 128], np.uint8),
            0.1, np.array(iids, np.int32), np.array(idxs, np.int32),
        )
    return SceneModel(cameras, images, points)


def gt_trajectory(n_frames=10, dist=1.6, seed=0):
    """Smooth ground-truth w2c query trajectory around the object."""
    poses = []
    for i in range(n_frames):
        ang = 0.04 * i
        el = 0.08 * np.sin(0.5 * i)
        center = dist * np.array(
            [np.cos(el) * np.sin(ang), np.sin(el), np.cos(el) * np.cos(ang)]
        )
        poses.append(look_at_w2c(center))
    return poses


def render_query_frames(testbed, nerf2sfm, poses, camera, spp=1):
    from pixtrack_tpu.tracking.render_bridge import render_nerf_view

    return [
        (f"frame_{i:04d}.png", render_nerf_view(testbed, nerf2sfm, T, camera, spp=spp))
        for i, T in enumerate(poses)
    ]


def build_world(res=128, n_frames=8):
    """Full world: (scene, testbed, nerf2sfm, camera, gt_poses, frames)."""
    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2, (res - 1) / 2, res, res)
    testbed = make_testbed()
    nerf2sfm = NerfTransform.identity()
    scene = make_scene(camera)
    gt = gt_trajectory(n_frames)
    frames = render_query_frames(testbed, nerf2sfm, gt, camera)
    return scene, testbed, nerf2sfm, camera, gt, frames
