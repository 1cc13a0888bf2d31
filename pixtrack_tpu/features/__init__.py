"""Feature extraction: CNN feature pyramids for feature-metric alignment."""

import os
from pathlib import Path
from typing import Optional

from pixtrack_tpu.features.pyramid import FeaturePyramid
from pixtrack_tpu.features.unet import UNetExtractor
from pixtrack_tpu.features.handcrafted import HandcraftedExtractor
from pixtrack_tpu.features.extractor import FeatureExtractor


def default_unet_weights_path() -> Path:
    """The shipped basin-trained UNet checkpoint (assets/unet_basin.npz),
    overridable via PIXTRACK_UNET_WEIGHTS."""
    env = os.environ.get("PIXTRACK_UNET_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "assets" / "unet_basin.npz"


def default_extractor(resize: Optional[int] = 1024) -> FeatureExtractor:
    """The production extractor (the pixloc-checkpoint role).

    The basin-trained UNet when its checkpoint is present — it beats the
    handcrafted pyramid decisively on the nuisance benchmarks (measured r2:
    held-out alignment 0.38 vs 39.8 deg median; mesh-world tracking under
    mild nuisances 0.69 vs 16 deg median, ADD-S AUC 0.95 vs 0.61) — else
    the handcrafted pyramid."""
    path = default_unet_weights_path()
    if path.exists():
        from pixtrack_tpu.features.train import load_unet_weights

        model, params = load_unet_weights(path)
        return FeatureExtractor(model, params=params, resize=resize)
    return FeatureExtractor(HandcraftedExtractor(), resize=resize)


__all__ = [
    "FeaturePyramid",
    "UNetExtractor",
    "HandcraftedExtractor",
    "FeatureExtractor",
    "default_extractor",
    "default_unet_weights_path",
]
