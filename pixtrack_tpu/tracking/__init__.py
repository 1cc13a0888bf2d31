"""Tracking application layer: per-frame pose trackers (r9 / YCB semantics)."""

from pixtrack_tpu.tracking.refiner import Refiner, RefineResult
from pixtrack_tpu.tracking.base import PoseTracker
from pixtrack_tpu.tracking.tracker import PixTrackTracker, TrackerConfig

__all__ = [
    "Refiner",
    "RefineResult",
    "PoseTracker",
    "PixTrackTracker",
    "TrackerConfig",
]
