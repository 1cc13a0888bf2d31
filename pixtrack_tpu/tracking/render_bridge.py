"""Bridge between SfM-space poses/cameras and the NeRF Testbed renderer.

First-party equivalent of the reference's ``get_nerf_image``
(pixtrack/visualization/run_vis_on_poses.py:28-57, imported by the trackers
at r9:21): set the testbed camera from an SfM pose via the NerfTransform,
render, and post-process (alpha-threshold zeroing + uint8) the same way.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.nerf.testbed import RenderMode, Testbed


def render_nerf_view(
    testbed: Testbed,
    nerf2sfm: NerfTransform,
    T_w2c: Pose,
    camera: Camera,
    spp: int = 8,
    depth: bool = False,
    alpha_threshold: float = 1e-2,
    exact_intrinsics: bool = True,
    return_alpha: bool = False,
):
    """Render the NeRF at an SfM-space world-to-camera pose.

    Returns uint8 (H, W, 3) for shade mode, float32 (H, W) NeRF-unit depth
    for depth mode. With ``return_alpha`` also returns the float32 (H, W)
    alpha map (used to weight reference observations toward the object
    interior).
    """
    c2w_sfm = np.asarray(T_w2c.inv().to_4x4(), np.float64)
    nerf_pose = nerf2sfm.pose_sfm_to_nerf(c2w_sfm)

    w = int(round(float(camera.width)))
    h = int(round(float(camera.height)))
    fx, fy = float(camera.f[0]), float(camera.f[1])
    cx, cy = float(camera.c[0]), float(camera.c[1])
    if exact_intrinsics:
        testbed.override_intrinsics = (fx, fy, cx, cy)
    else:
        testbed.override_intrinsics = None
        testbed.fov_axis = 0
        testbed.fov = float(np.rad2deg(2.0 * np.arctan2(w / 2.0, fx)))
    testbed.set_nerf_camera_matrix(nerf_pose[:3, :])
    testbed.render_mode = RenderMode.Depth if depth else RenderMode.Shade
    img = testbed.render(w, h, spp=spp, linear=True)
    if depth:
        if return_alpha:
            return img[..., 0].astype(np.float32), img[..., 3].astype(np.float32)
        return img[..., 0].astype(np.float32)
    rgb = img[..., :3]
    alpha = img[..., 3]
    rgb = np.where(alpha[..., None] > alpha_threshold, rgb, 0.0)
    out = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    if return_alpha:
        return out, alpha.astype(np.float32)
    return out
