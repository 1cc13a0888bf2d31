"""Flax UNet feature-pyramid extractor.

TPU-native replacement for the reference's pixloc UNet
(``load_experiment('pixloc_megadepth')`` -> VGG-encoder UNet with
``output_scales`` giving a 3-level pyramid + confidences; API surface at
pixtrack/localization/feature_extractor.py:48-58 and SURVEY.md L2). Design
differences: NHWC layout (TPU-friendly), GroupNorm instead of BatchNorm (no
train/eval divergence, works at batch 1), bf16 activations with f32 params,
and explicit per-level heads producing features + confidence in one pass.

Pyramid contract: levels fine->coarse at strides (1, 4, 16), dims (32, 128,
128) by default — mirroring the reference's level shapes so downstream config
(multiscale=[4,1] etc.) carries over.

No pretrained pixloc checkpoint is reachable in this environment (zero
egress); weights are trained in-repo (features/train.py) or substituted by
the handcrafted extractor. The architecture keeps the same pyramid contract
so a future weight port is a pure state-dict mapping.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pixtrack_tpu.features.pyramid import FeaturePyramid


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        return nn.relu(x)


class Down(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.features, self.dtype)(x)
        x = ConvBlock(self.features, self.dtype)(x)
        return x


class Up(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip):
        B, H, W, _ = skip.shape
        x = jax.image.resize(x, (B, H, W, x.shape[-1]), method="nearest")
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBlock(self.features, self.dtype)(x)
        x = ConvBlock(self.features, self.dtype)(x)
        return x


class Head(nn.Module):
    """Per-level output head: features + confidence."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        feat = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="feat")(x)
        conf = nn.Conv(1, (1, 1), dtype=self.dtype, name="conf")(x)
        return feat.astype(jnp.float32), nn.sigmoid(conf[..., 0]).astype(jnp.float32)


class UNetExtractor(nn.Module):
    """Encoder-decoder pyramid with heads at strides (1, 4, 16).

    Input:  (B, H, W, 3) float32 in [0, 1], H and W multiples of 16.
    Output: FeaturePyramid contract per image (call via ``extract``).
    """

    encoder_dims: Sequence[int] = (32, 64, 128, 256, 256)
    output_dims: Sequence[int] = (32, 128, 128)  # strides 1, 4, 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array):
        x = images.astype(self.dtype)
        # normalize (ImageNet-free: center to [-1, 1])
        x = x * 2.0 - 1.0

        e0 = ConvBlock(self.encoder_dims[0], self.dtype)(x)
        e0 = ConvBlock(self.encoder_dims[0], self.dtype)(e0)  # stride 1
        e1 = Down(self.encoder_dims[1], self.dtype)(e0)  # stride 2
        e2 = Down(self.encoder_dims[2], self.dtype)(e1)  # stride 4
        e3 = Down(self.encoder_dims[3], self.dtype)(e2)  # stride 8
        e4 = Down(self.encoder_dims[4], self.dtype)(e3)  # stride 16

        f16, c16 = Head(self.output_dims[2], self.dtype, name="head16")(e4)

        d3 = Up(self.encoder_dims[3], self.dtype)(e4, e3)  # stride 8
        d2 = Up(self.encoder_dims[2], self.dtype)(d3, e2)  # stride 4
        f4, c4 = Head(self.output_dims[1], self.dtype, name="head4")(d2)

        d1 = Up(self.encoder_dims[1], self.dtype)(d2, e1)  # stride 2
        d0 = Up(self.encoder_dims[0], self.dtype)(d1, e0)  # stride 1
        f1, c1 = Head(self.output_dims[0], self.dtype, name="head1")(d0)

        return {
            "feature_maps": (f1, f4, f16),
            "confidences": (c1, c4, c16),
        }

    # The stride of each pyramid level in input pixels (fine -> coarse).
    scales = (1, 4, 16)


def normalize_features(feat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-pixel L2 normalization over channels (the reference's
    normalize_descriptors=True behavior, SURVEY.md §2.3)."""
    norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat / jnp.maximum(norm, eps)


def init_unet(rng_key, height: int = 64, width: int = 64,
              **kwargs) -> Tuple[UNetExtractor, dict]:
    model = UNetExtractor(**kwargs)
    params = model.init(rng_key, jnp.zeros((1, height, width, 3)))
    return model, params
