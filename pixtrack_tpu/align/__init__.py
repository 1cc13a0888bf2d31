"""Feature-metric Levenberg-Marquardt pose alignment (the hot core)."""

from pixtrack_tpu.align.interpolate import interpolate_features
from pixtrack_tpu.align.lm import AlignConfig, AlignState, align_level, align_pyramid

__all__ = [
    "interpolate_features",
    "AlignConfig",
    "AlignState",
    "align_level",
    "align_pyramid",
]
