"""Feature extraction: CNN feature pyramids for feature-metric alignment."""

from pixtrack_tpu.features.pyramid import FeaturePyramid
from pixtrack_tpu.features.unet import UNetExtractor
from pixtrack_tpu.features.handcrafted import HandcraftedExtractor
from pixtrack_tpu.features.extractor import FeatureExtractor

__all__ = [
    "FeaturePyramid",
    "UNetExtractor",
    "HandcraftedExtractor",
    "FeatureExtractor",
]
