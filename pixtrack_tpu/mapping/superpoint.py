"""SuperPoint detector/descriptor architecture in Flax.

The reference's hloc pipeline runs SuperPoint ('superpoint_max' /
'superpoint_aachen' confs, run_reconstruction.py:39-48). Its weights are a
network download and unreachable here; this module provides the
*architecture* (VGG-style shared encoder, 65-way cell detector head, 256-d
descriptor head) with the standard public hyper-parameters so weights can be
ported from a torch checkpoint (``port_torch_weights``) or trained in-repo.
Outputs satisfy the same (keypoints, scores, descriptors) contract as
pixtrack_tpu.mapping.detector, so it is a drop-in detector backend.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _VGGBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class SuperPointNet(nn.Module):
    """Encoder + detector head (65 = 8x8 cell + dustbin) + descriptor head."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, image: jax.Array):
        """image (B, H, W, 1) grayscale in [0, 1]; H, W multiples of 8."""
        x = image
        for feats, pool in [(64, False), (64, True), (64, False), (64, True),
                            (128, False), (128, True), (128, False), (128, False)]:
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = _VGGBlock(feats)(x)
        # detector head
        det = _VGGBlock(256)(x)
        det = nn.Conv(65, (1, 1))(det)  # (B, H/8, W/8, 65)
        # descriptor head
        desc = _VGGBlock(256)(x)
        desc = nn.Conv(self.descriptor_dim, (1, 1))(desc)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        return det, desc


def dense_scores(det_logits: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 65) logits -> (B, H, W) per-pixel keypoint probability."""
    prob = jax.nn.softmax(det_logits, axis=-1)[..., :64]  # drop dustbin
    B, Hc, Wc, _ = prob.shape
    prob = prob.reshape(B, Hc, Wc, 8, 8)
    prob = prob.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return prob


def extract_superpoint(
    params, image: np.ndarray, max_keypoints: int = 1024,
    nms_radius: int = 4, threshold: float = 0.005, subpixel: bool = True,
):
    """Full SuperPoint extraction: returns (keypoints (N, 2), scores, desc).

    ``subpixel`` refines each peak by a quadratic fit of the raw dense
    score map over its 3x3 neighborhood — the same refinement the
    production Harris detector applies (mapping/detector.py); integer
    keypoints leave ~0.5 px uniform localization noise, the dominant SfM
    error source."""
    model = SuperPointNet()
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    if img.ndim == 3:
        img = img @ jnp.asarray([0.299, 0.587, 0.114])
    H, W = img.shape
    H8, W8 = H - H % 8, W - W % 8
    det, desc = model.apply(params, img[None, :H8, :W8, None])
    scores_raw = dense_scores(det)[0]
    # NMS via max-pool
    pooled = jax.lax.reduce_window(
        scores_raw, -jnp.inf, jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1), (1, 1), "SAME",
    )
    scores = jnp.where(scores_raw >= pooled, scores_raw, 0.0)
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    kp = jnp.stack([idx % W8, idx // W8], axis=-1).astype(jnp.float32)
    if subpixel:
        raw = scores_raw.reshape(-1)

        def at(dy, dx):
            return raw[jnp.clip(idx + dy * W8 + dx, 0, H8 * W8 - 1)]

        gx = 0.5 * (at(0, 1) - at(0, -1))
        gy = 0.5 * (at(1, 0) - at(-1, 0))
        hxx = at(0, 1) - 2.0 * at(0, 0) + at(0, -1)
        hyy = at(1, 0) - 2.0 * at(0, 0) + at(-1, 0)
        hxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
        den = hxx * hyy - hxy * hxy
        safe = jnp.abs(den) > 1e-18
        den = jnp.where(safe, den, 1.0)
        dx = -(hyy * gx - hxy * gy) / den
        dy = -(hxx * gy - hxy * gx) / den
        # 3x3 reads use flat-index clipping, so for border peaks the dx=+-1
        # neighbors wrap into the adjacent row: disable refinement there
        px, py = idx % W8, idx // W8
        interior = (px > 0) & (px < W8 - 1) & (py > 0) & (py < H8 - 1)
        ok = safe & interior & (jnp.abs(dx) < 1.0) & (jnp.abs(dy) < 1.0)
        off = jnp.stack(
            [jnp.where(ok, dx, 0.0), jnp.where(ok, dy, 0.0)], axis=-1
        )
        kp = kp + jnp.clip(off, -0.6, 0.6)
    keep = np.asarray(vals > threshold)
    kp = np.asarray(kp)[keep]
    vals = np.asarray(vals)[keep]
    # bilinear descriptor sampling at keypoints (desc is at 1/8 resolution)
    from pixtrack_tpu.align.interpolate import interpolate_features

    d, _, _ = interpolate_features(
        desc[0], jnp.asarray(kp) / 8.0 - 0.5, compute_grad=False
    )
    d = np.asarray(d)
    d = d / np.linalg.norm(d, axis=1, keepdims=True).clip(1e-8)
    return kp, vals, d


def describe_at(params, image: np.ndarray, kp: np.ndarray) -> np.ndarray:
    """Sample the SuperPoint descriptor map at GIVEN keypoints (N, 2) xy.

    Decoupled description: the net's dense 256-d descriptor head (trained on
    true 3D correspondences, train_superpoint_dense.py) evaluated at any
    detector's keypoints — in production, the multi-scale Harris detector,
    which beats every trained detector head on mesh-render repeatability
    (assets/superpoint_candidate_eval.json: 0.604 vs 0.253/0.33)."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    model = SuperPointNet()
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    if img.ndim == 3:
        img = img @ jnp.asarray([0.299, 0.587, 0.114])
    H, W = img.shape
    H8, W8 = H - H % 8, W - W % 8
    _, desc = model.apply(params, img[None, :H8, :W8, None])
    d, _, _ = interpolate_features(
        desc[0], jnp.asarray(kp, jnp.float32) / 8.0 - 0.5, compute_grad=False
    )
    d = np.asarray(d)
    return d / np.linalg.norm(d, axis=1, keepdims=True).clip(1e-8)


def init_superpoint(rng_key, height: int = 64, width: int = 64):
    model = SuperPointNet()
    params = model.init(rng_key, jnp.zeros((1, height, width, 1)))
    return model, params


# torch checkpoint key -> flax path mapping for the public SuperPoint layout
_TORCH_LAYER_ORDER = [
    "conv1a", "conv1b", "conv2a", "conv2b",
    "conv3a", "conv3b", "conv4a", "conv4b",
]


def port_torch_weights(state_dict) -> dict:
    """Map a public SuperPoint torch state_dict into this module's params.

    Works on a plain dict of numpy arrays (torch tensors are converted);
    usable once a checkpoint file is present locally.
    """
    def w(name):
        v = state_dict[name]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v

    def conv(name):
        # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        return {
            "kernel": jnp.asarray(np.transpose(w(name + ".weight"), (2, 3, 1, 0))),
            "bias": jnp.asarray(w(name + ".bias")),
        }

    params = {"params": {}}
    p = params["params"]
    for i, layer in enumerate(_TORCH_LAYER_ORDER):
        p[f"_VGGBlock_{i}"] = {"Conv_0": conv(layer)}
    p["_VGGBlock_8"] = {"Conv_0": conv("convPa")}
    p["Conv_0"] = conv("convPb")
    p["_VGGBlock_9"] = {"Conv_0": conv("convDa")}
    p["Conv_1"] = conv("convDb")
    return params
