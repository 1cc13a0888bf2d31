"""Weight-free multiscale gradient-feature extractor.

Stands in for the learned UNet when no trained weights exist (no checkpoint
is downloadable in this environment — reference setup.sh:14-21 fetches
pixloc_megadepth over the network). Produces a smooth, locally distinctive
feature field good enough for feature-metric LM alignment: per level, a
Gaussian-smoothed intensity channel plus x/y gradients at two blur widths.
Smoothness matters: the LM aligner linearizes the feature field, so features
must have a usable basin of attraction — hence the heavy blur at coarse
levels (same role as the UNet's receptive field).

Entirely jittable; used by default in tests and as the tracker fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixtrack_tpu.features.pyramid import FeaturePyramid


def _gaussian_kernel1d(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur on (H, W) or (H, W, C), edge-padded.

    Two depthwise ``lax.conv`` passes — a per-row ``vmap(jnp.convolve)``
    lowers to thousands of small ops and cost ~300 ms for a 640x480 pyramid
    on v5e; the conv form is ~milliseconds."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    C = img.shape[-1]
    x = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="edge")
    x = x[None]  # NHWC
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))  # (K, 1, 1, C)
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    out = x[0]
    return out[..., 0] if squeeze else out


def _gradients(img: jax.Array):
    """Central-difference gradients of (H, W) -> (gx, gy)."""
    gx = jnp.gradient(img, axis=1)
    gy = jnp.gradient(img, axis=0)
    return gx, gy


def _level_features_from(s1: jax.Array, s2: jax.Array,
                         c1: jax.Array | None) -> jax.Array:
    """Feature map from precomputed narrow/wide gray blurs + blurred color.

    Color is the most view-invariant signal available without learning
    (surface-attached, shading-free for NeRF renders); gradients add
    localization sharpness; blur sets the basin of attraction.
    """
    g1x, g1y = _gradients(s1)
    g2x, g2y = _gradients(s2)
    # difference-of-gaussians adds a band-pass channel
    dog = s1 - s2
    chans = [s1, s2, g1x * 4.0, g1y * 4.0, g2x * 8.0, g2y * 8.0, dog * 4.0,
             jnp.sqrt(g1x**2 + g1y**2 + 1e-8) * 4.0]
    feats = jnp.stack(chans, axis=-1)
    if c1 is not None:
        feats = jnp.concatenate([feats, c1 * 2.0], axis=-1)
    return feats.astype(jnp.float32)


def _level_features(gray: jax.Array, color: jax.Array | None) -> jax.Array:
    """Single-level reference path (arbitrary strides): blur here, then build."""
    s1 = gaussian_blur(gray, 1.0)
    s2 = gaussian_blur(gray, 3.0)
    c1 = gaussian_blur(color, 1.0) if color is not None else None
    return _level_features_from(s1, s2, c1)


def _downsample(img: jax.Array, factor: int) -> jax.Array:
    """Anti-aliased downsample of (H, W) by an integer factor."""
    blurred = gaussian_blur(img, factor * 0.6)
    return blurred[::factor, ::factor]


class HandcraftedExtractor:
    """Callable with the same pyramid contract as the UNet (strides 1, 4, 16)."""

    scales = (1, 4, 16)

    def __init__(self, strides=(1, 4, 16)):
        self.scales = tuple(strides)

    def __call__(self, image: jax.Array) -> FeaturePyramid:
        """image: (H, W, 3) or (H, W), float32 in [0, 1]."""
        if image.ndim == 3:
            gray = image @ jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            color = image.astype(jnp.float32)
        else:
            gray = image
            color = None
        gray = gray.astype(jnp.float32)
        if self.scales == (1, 4, 16):
            levels = self._cascade_pyramid(gray, color)
        else:
            levels = []
            for s in self.scales:
                g = gray if s == 1 else _downsample(gray, s)
                c = None
                if color is not None:
                    c = color if s == 1 else _downsample(color, s)
                levels.append(_level_features(g, c))
        # confidence: gradient magnitude (texture-ness), squashed
        confs = [jnp.tanh(f[..., 7] * 2.0) for f in levels]
        return FeaturePyramid(
            levels=tuple(levels),
            scales=tuple((1.0 / s, 1.0 / s) for s in self.scales),
            confidences=tuple(confs),
        )

    @staticmethod
    def _cascade_pyramid(gray: jax.Array, color: jax.Array | None):
        """Cascaded pyramid for the production strides (1, 4, 16).

        The per-level path blurs at FULL resolution for every level (the
        stride-16 anti-alias blur alone is a radius-29 kernel over 640x480);
        cascading — blur a little, decimate by 4, repeat — needs only two
        full-resolution separable passes total and produces near-identical
        Gaussian scales (composition: the stride-4 input carries sigma 3/4 =
        0.75 level-pixels from the previous stage, topped up to 1.0 with a
        sqrt(1 - 0.75^2) blur). Measured ~2.5x faster for the 640x480 query
        pyramid on v5e at unchanged tracking quality.
        """
        chans = [gray[..., None]]
        if color is not None:
            chans.append(color)
        base = jnp.concatenate(chans, axis=-1)  # (H, W, 1 or 4)

        levels = []
        cur = base
        for li in range(3):
            s1 = gaussian_blur(cur, 1.0 if li == 0 else 0.66)
            s2 = gaussian_blur(s1, 2.828)  # total sigma ~3 at this level
            c1 = s1[..., 1:] if color is not None else None
            levels.append(_level_features_from(s1[..., 0], s2[..., 0], c1))
            # s2 (sigma ~3) is a sufficient anti-alias filter for a /4
            # decimation (needs ~2.4); carried sigma becomes 3/4 = 0.75
            cur = s2[::4, ::4]
        return levels
