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

    model, params, cfg = load_matcher_weights(path)
    lm = LearnedMatcher(model, params, min_score=min_score)
    lm.desc_dim = cfg.desc_dim  # callers guard detector compatibility
    return lm


def default_superpoint_weights_path() -> Path:
    """The shipped trained SuperPoint checkpoint (assets/superpoint.npz),
    overridable via PIXTRACK_SUPERPOINT_WEIGHTS."""
    env = os.environ.get("PIXTRACK_SUPERPOINT_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "assets" / "superpoint.npz"


def default_detector(max_keypoints: int = 1024, **kw):
    """The production learned keypoint detector for SfM (the
    SuperPoint-weights role, reference run_reconstruction.py:39-48): the
    in-repo-trained SuperPoint when its checkpoint is shipped, else None
    (multi-scale Harris fallback inside incremental_sfm).

    Returns a ``detect(image, max_keypoints=..., **kw) -> (kp, scores,
    desc)`` callable with ``.desc_dim`` / ``.name`` attributes, the same
    contract as detector.detect_and_describe."""
    path = default_superpoint_weights_path()
    if not path.exists():
        return None
    from pixtrack_tpu.mapping.superpoint import extract_superpoint
    from pixtrack_tpu.mapping.train_superpoint import load_superpoint_weights

    params = load_superpoint_weights(path)

    def detect(image, max_keypoints=max_keypoints, **kw2):
        merged = {**kw, **kw2}
        merged.pop("nms_radius", None)  # Harris-specific knob
        return extract_superpoint(
            params, image, max_keypoints=max_keypoints, **merged
        )

    detect.desc_dim = 256
    detect.name = "superpoint"
    return detect


def default_descriptor_weights_path() -> Path:
    """The shipped dense-descriptor checkpoint (assets/dense_descriptor.npz),
    overridable via PIXTRACK_DENSE_DESCRIPTOR_WEIGHTS."""
    env = os.environ.get("PIXTRACK_DENSE_DESCRIPTOR_WEIGHTS")
    if env:
        return Path(env)
    return (Path(__file__).resolve().parents[2] / "assets"
            / "dense_descriptor.npz")


def default_descriptor(max_keypoints: int = 1024, **kw):
    """The learned SfM feature extractor (CLI ``reconstruct --detector
    dense``): Harris keypoints DESCRIBED by the InfoNCE-trained half-res
    dense descriptor (mapping/dense_descriptor.py). Beats patch+MNN on
    the held-out mesh MATCHING gate (assets/dense_descriptor_eval.json:
    4499 vs 2292 correct matches, precision 0.688 vs 0.569, 2x recall)
    and lands inside the arc-rig rotation gate (0.879 deg, gate 0.92),
    but its denser track graph regresses camera centers there (0.459 vs
    0.065 median center frac) — so the classical patch stack remains the
    `reconstruct` default; see the eval json's ``arc_sfm`` section.
    Returns None if no checkpoint ships.

    The returned callable carries ``.match_kw`` — the matcher operating
    point the descriptor was accepted at (cosine-score distributions
    differ per descriptor family, so thresholds ship WITH the weights).
    """
    path = default_descriptor_weights_path()
    if not path.exists():
        return None
    from pixtrack_tpu.mapping.dense_descriptor import (
        describe_at_dense,
        load_descriptor_weights,
    )
    from pixtrack_tpu.mapping.detector import detect_keypoints

    _, params = load_descriptor_weights(path)

    def detect(image, max_keypoints=max_keypoints, **kw2):
        merged = {**kw, **kw2}
        kp, sc = detect_keypoints(image, max_keypoints=max_keypoints,
                                  **merged)
        return kp, sc, describe_at_dense(params, image, kp)

    detect.desc_dim = 128
    detect.name = "harris+dense"
    detect.match_kw = dict(min_score=0.1, ratio=0.98)
    return detect


__all__ = [
    "detect_keypoints",
    "describe_keypoints",
    "match_descriptors",
    "exhaustive_pairs",
    "triangulate_tracks",
    "triangulate_scene",
    "default_matcher",
    "default_matcher_weights_path",
    "default_detector",
    "default_superpoint_weights_path",
]
