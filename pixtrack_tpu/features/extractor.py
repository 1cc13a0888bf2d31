"""High-level feature extractor with the reference's resize policy.

Mirrors PixTrackFeatureExtractor (reference
pixtrack/localization/feature_extractor.py:34-59): resize the input so its
max edge is at most ``resize // image_scale`` (policy "max"; "max_force"
always resizes), extract the pyramid, and fold the resize factor into the
per-level coordinate scales.

Differences by design: resizing happens on-device inside jit (no cv2 host
round-trip), and the returned scales are (sx, sy) multipliers from *original*
image coordinates to feature coordinates, so the aligner never needs to know
about resizing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pixtrack_tpu.features.pyramid import FeaturePyramid
from pixtrack_tpu.features.unet import UNetExtractor, normalize_features


def _round16(x: int) -> int:
    return max(16, int(round(x / 16)) * 16)


class FeatureExtractor:
    """Wraps a pyramid model (UNet params or handcrafted) behind one call.

    Args:
      model: an ``UNetExtractor`` module (with ``params``) or any callable
        ``(H, W, 3) -> FeaturePyramid`` exposing ``.scales``.
      params: flax params when ``model`` is a module.
      resize: max-edge target (reference default 1024).
      resize_by: "max" (only shrink) or "max_force" (always hit target).
      normalize: L2-normalize features per pixel (normalize_descriptors).
    """

    def __init__(
        self,
        model,
        params: Optional[dict] = None,
        resize: Optional[int] = 1024,
        resize_by: str = "max",
        normalize: bool = True,
    ):
        assert resize_by in ("max", "max_force")
        self.model = model
        self.params = params
        self.resize = resize
        self.resize_by = resize_by
        self.normalize = normalize
        self._jitted = {}

    @property
    def scales(self):
        return self.model.scales

    # -- internals -----------------------------------------------------------
    def _target_hw(self, H: int, W: int, image_scale: int):
        if self.resize is None:
            return H, W, 1.0
        target = self.resize // image_scale
        m = max(H, W)
        if m > target or self.resize_by == "max_force":
            r = target / m
            return _round16(H * r), _round16(W * r), r
        return H, W, 1.0

    def _traced_impl(self, img, out_h: int, out_w: int):
        """Traced (jit-free) pyramid body — embeddable in larger programs."""
        img = img.astype(jnp.float32)
        if img.ndim == 2:
            img = img[..., None] * jnp.ones((1, 1, 3), jnp.float32)
        if (img.shape[0], img.shape[1]) != (out_h, out_w):
            img = jax.image.resize(
                img, (out_h, out_w, img.shape[-1]), method="linear"
            )
        if isinstance(self.model, UNetExtractor):
            pred = self.model.apply(self.params, img[None])
            feats = tuple(f[0] for f in pred["feature_maps"])
            confs = tuple(c[0] for c in pred["confidences"])
        else:
            pyr = self.model(img)
            feats, confs = pyr.levels, pyr.confidences
        if self.normalize:
            feats = tuple(normalize_features(f) for f in feats)
        return feats, confs

    def _forward(self, image, out_h: int, out_w: int):
        """Jit-compiled per (input-shape, output-shape) bucket."""
        key = (image.shape, out_h, out_w)
        if key not in self._jitted:

            @jax.jit
            def run(img):
                return self._traced_impl(img, out_h, out_w)

            self._jitted[key] = run
        return self._jitted[key](image)

    def traced(self, image, image_scale: int = 1) -> FeaturePyramid:
        """Traced pyramid extraction (no jit boundary), for callers that fuse
        extraction into one larger device program (tracking/fused.py).
        ``image`` must be a float array in [0, 1] with static (H, W, 3)."""
        H, W = image.shape[:2]
        out_h, out_w, _ = self._target_hw(int(H), int(W), image_scale)
        feats, confs = self._traced_impl(image, out_h, out_w)
        ry, rx = out_h / H, out_w / W
        scales = tuple((rx / s, ry / s) for s in self.model.scales)
        return FeaturePyramid(levels=feats, scales=scales, confidences=confs)

    # -- public --------------------------------------------------------------
    def __call__(self, image, image_scale: int = 1) -> FeaturePyramid:
        """image: (H, W, 3) or (H, W) array (uint8 [0,255] or float [0,1])."""
        image = jnp.asarray(image)
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) / 255.0
        H, W = image.shape[:2]
        out_h, out_w, _ = self._target_hw(H, W, image_scale)
        feats, confs = self._forward(image, out_h, out_w)
        # effective resize factors per axis (may differ slightly after rounding)
        ry, rx = out_h / H, out_w / W
        scales = tuple((rx / s, ry / s) for s in self.model.scales)
        return FeaturePyramid(levels=feats, scales=scales, confidences=confs)
