"""Geometry core: rotations, SE(3) poses, cameras, coordinate transforms."""

from pixtrack_tpu.geometry.rotation import (
    so3_exp,
    so3_log,
    quat_to_rotmat,
    rotmat_to_quat,
    geodesic_distance,
    euler_rotation,
)
from pixtrack_tpu.geometry.pose import Pose
from pixtrack_tpu.geometry.camera import Camera, CAMERA_MODEL_IDS
from pixtrack_tpu.geometry.nerf_transform import NerfTransform

__all__ = [
    "so3_exp",
    "so3_log",
    "quat_to_rotmat",
    "rotmat_to_quat",
    "geodesic_distance",
    "euler_rotation",
    "Pose",
    "Camera",
    "CAMERA_MODEL_IDS",
    "NerfTransform",
]
