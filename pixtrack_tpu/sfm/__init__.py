"""SfM layer: COLMAP-compatible model IO, database, scene container, covisibility."""

from pixtrack_tpu.sfm.colmap_io import (
    CameraRecord,
    ImageRecord,
    Point3DRecord,
    read_model,
    write_model,
)
from pixtrack_tpu.sfm.scene import SceneModel

__all__ = [
    "CameraRecord",
    "ImageRecord",
    "Point3DRecord",
    "read_model",
    "write_model",
    "SceneModel",
]
