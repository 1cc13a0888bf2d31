"""Asset-creation pipeline: detection, matching, triangulation, augmentation,
featuremetric refinement (the hloc + pixsfm + COLMAP roles, TPU-native)."""

import os
from pathlib import Path
from typing import Optional

from pixtrack_tpu.mapping.detector import detect_keypoints, describe_keypoints
from pixtrack_tpu.mapping.matcher import match_descriptors, exhaustive_pairs
from pixtrack_tpu.mapping.triangulate import triangulate_tracks, triangulate_scene


def default_matcher_weights_path() -> Path:
    """The shipped attention-matcher checkpoint (assets/matcher.npz),
    overridable via PIXTRACK_MATCHER_WEIGHTS."""
    env = os.environ.get("PIXTRACK_MATCHER_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "assets" / "matcher.npz"


def default_matcher(min_score: float = 0.2):
    """The production pair matcher for SfM (the SuperGlue-weights role,
    reference scripts/run_reconstruction.py:41-50): the trained attention
    matcher when its checkpoint is shipped, else None (mutual-NN + ratio
    fallback inside incremental_sfm)."""
    path = default_matcher_weights_path()
    if not path.exists():
        return None
    from pixtrack_tpu.mapping.attention_matcher import (
        LearnedMatcher,
        load_matcher_weights,
    )

    model, params, _ = load_matcher_weights(path)
    return LearnedMatcher(model, params, min_score=min_score)


__all__ = [
    "detect_keypoints",
    "describe_keypoints",
    "match_descriptors",
    "exhaustive_pairs",
    "triangulate_tracks",
    "triangulate_scene",
    "default_matcher",
    "default_matcher_weights_path",
]
