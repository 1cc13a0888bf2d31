"""Asset-creation pipeline: detection, matching, triangulation, augmentation,
featuremetric refinement (the hloc + pixsfm + COLMAP roles, TPU-native)."""

from pixtrack_tpu.mapping.detector import detect_keypoints, describe_keypoints
from pixtrack_tpu.mapping.matcher import match_descriptors, exhaustive_pairs
from pixtrack_tpu.mapping.triangulate import triangulate_tracks, triangulate_scene

__all__ = [
    "detect_keypoints",
    "describe_keypoints",
    "match_descriptors",
    "exhaustive_pairs",
    "triangulate_tracks",
    "triangulate_scene",
]
