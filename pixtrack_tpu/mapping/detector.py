"""Keypoint detection + description in pure JAX.

Fills the hloc feature-extraction role (reference run_reconstruction.py:39-48
uses SuperPoint 'superpoint_max' / 'superpoint_aachen'). SuperPoint weights
are network downloads and unreachable here; this module provides a
weight-free multi-scale Harris detector with normalized-patch descriptors
that match well across the small-baseline rendered views the asset pipeline
produces (NeRF re-renders / mesh renders of one object). The SuperPoint
*architecture* lives in pixtrack_tpu.mapping.superpoint for weight porting
or in-repo training; both satisfy the same (keypoints, scores, descriptors)
contract and write the same features.h5 layout.

All compute is batched jax (runs on TPU); NMS is max-pool based.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.features.handcrafted import gaussian_blur


def _to_gray(image: jax.Array) -> jax.Array:
    if image.ndim == 3:
        return image @ jnp.asarray([0.299, 0.587, 0.114], image.dtype)
    return image


def harris_response(gray: jax.Array, sigma: float = 1.5, k: float = 0.04) -> jax.Array:
    """Harris corner response of an (H, W) image."""
    g = gaussian_blur(gray, 1.0)
    ix = jnp.gradient(g, axis=1)
    iy = jnp.gradient(g, axis=0)
    ixx = gaussian_blur(ix * ix, sigma)
    iyy = gaussian_blur(iy * iy, sigma)
    ixy = gaussian_blur(ix * iy, sigma)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _nms(resp: jax.Array, radius: int) -> jax.Array:
    """Keep local maxima: response equals its max-pool."""
    size = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )
    return jnp.where(resp >= pooled, resp, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "border"))
def _detect(img, max_keypoints: int, nms_radius: int, border: int):
    # Harris on each color channel (color edges that cancel in luminance
    # still yield corners), combined by max.
    if img.ndim == 3:
        resp = jnp.max(
            jnp.stack([harris_response(img[..., c]) for c in range(img.shape[-1])]),
            axis=0,
        )
        H, W = img.shape[:2]
    else:
        resp = harris_response(img)
        H, W = img.shape
    resp_raw = resp
    resp = _nms(resp, nms_radius)
    # kill borders
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    resp = jnp.where(inside, resp, -jnp.inf)
    flat = resp.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    kp = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.float32)  # (x, y)

    # sub-pixel refinement: quadratic fit of the RAW response over the 3x3
    # neighborhood of each peak (integer keypoints leave ~0.5 px uniform
    # localization noise — the dominant error source of the whole SfM chain;
    # descriptors already sample bilinearly so they use the refined
    # positions directly)
    raw = resp_raw.reshape(-1)

    def at(dy, dx):
        return raw[jnp.clip(idx + dy * W + dx, 0, H * W - 1)]

    gx = 0.5 * (at(0, 1) - at(0, -1))
    gy = 0.5 * (at(1, 0) - at(-1, 0))
    hxx = at(0, 1) - 2.0 * at(0, 0) + at(0, -1)
    hyy = at(1, 0) - 2.0 * at(0, 0) + at(-1, 0)
    hxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
    det = hxx * hyy - hxy * hxy
    safe = jnp.abs(det) > 1e-18
    det = jnp.where(safe, det, 1.0)
    dx = -(hyy * gx - hxy * gy) / det
    dy = -(hxx * gy - hxy * gx) / det
    # 3x3 reads use flat-index clipping, so for border peaks the dx=+-1
    # neighbors wrap into the adjacent row: disable refinement there
    # (top_k can surface border pixels when border=0 or among -inf ties)
    px, py = idx % W, idx // W
    interior = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    ok = safe & interior & (jnp.abs(dx) < 1.0) & (jnp.abs(dy) < 1.0)
    off = jnp.stack([jnp.where(ok, dx, 0.0), jnp.where(ok, dy, 0.0)], axis=-1)
    kp = kp + jnp.clip(off, -0.6, 0.6)

    # relative threshold: keep corners within 4 orders of magnitude of the
    # best (absolute positivity drops weak-texture corners entirely)
    valid = jnp.isfinite(scores) & (scores > 1e-7 * jnp.maximum(scores[0], 1e-12))
    return kp, scores, valid


def detect_keypoints(
    image,
    max_keypoints: int = 1024,
    nms_radius: int = 4,
    border: int = 12,
) -> Tuple[np.ndarray, np.ndarray]:
    """Detect corners. Returns (keypoints (N, 2) float32 xy, scores (N,))."""
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    kp, scores, valid = _detect(img, max_keypoints, nms_radius, border)
    kp = np.asarray(kp)[np.asarray(valid)]
    scores = np.asarray(scores)[np.asarray(valid)]
    return kp, scores


@functools.partial(jax.jit, static_argnames=("patch", "spacing"))
def _describe(img, kp, patch: int, spacing: float):
    """Normalized color+gradient patch descriptors via bilinear sampling."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    gray = _to_gray(img)
    g = gaussian_blur(gray, 1.2)
    gx = jnp.gradient(g, axis=1)
    gy = jnp.gradient(g, axis=0)
    chans = [gx * 4.0, gy * 4.0]
    if img.ndim == 3:
        chans = [gaussian_blur(img, 1.2)[..., c] for c in range(img.shape[-1])] + chans
    else:
        chans = [g] + chans
    fmap = jnp.stack(chans, axis=-1)  # (H, W, C)
    C = fmap.shape[-1]

    offs = (jnp.arange(patch, dtype=jnp.float32) - (patch - 1) / 2.0) * spacing
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (patch^2, 2)

    pts = kp[:, None, :] + grid[None, :, :]  # (N, P2, 2)
    N, P2, _ = pts.shape
    vals, _, valid = interpolate_features(fmap, pts.reshape(-1, 2), compute_grad=False)
    # zero out-of-image samples, then mean-center + L2 normalize
    vmask = valid.reshape(N, P2, 1)
    desc = (vals.reshape(N, P2, C) * vmask).reshape(N, P2 * C)
    desc = desc - desc.mean(axis=1, keepdims=True)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-6)
    return desc


def describe_keypoints(
    image, keypoints: np.ndarray, patch: int = 13, spacing: float = 2.0
) -> np.ndarray:
    """Descriptors for keypoints: (N, patch^2 * C) float32, L2-normalized."""
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    return np.asarray(_describe(img, jnp.asarray(keypoints, jnp.float32), patch, spacing))


def detect_and_describe(image, max_keypoints: int = 1024, **kw):
    kp, scores = detect_keypoints(image, max_keypoints=max_keypoints, **kw)
    desc = describe_keypoints(image, kp)
    return kp, scores, desc
