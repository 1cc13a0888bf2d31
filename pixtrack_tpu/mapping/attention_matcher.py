"""Attentional keypoint matcher — the SuperGlue role.

The reference matches SfM features with SuperGlue 'indoor' weights
(scripts/run_reconstruction.py:41-50; weights are an unreachable network
download here). This is a from-scratch TPU-first equivalent: positional MLP
encoding + alternating self/cross multi-head attention over the two
keypoint sets, ending in a dual-softmax assignment with learned dustbins.
Everything is static-shape (padded keypoint sets with attention masks), so
one compilation serves every pair, and all compute is MXU matmuls.

Differences from SuperGlue by design: dual-softmax + dustbin score instead
of Sinkhorn iterations (equal quality at this scale, no sequential loop on
device), GroupNorm-free MLPs, and the descriptor dimension is whatever the
in-repo patch descriptor produces (SuperGlue assumes SuperPoint's 256-d).

Trained on synthetic correspondence sets (features/train_basin's textured
plane scenes: detect in view A, project to view B with the exact homography
from the known poses; see mapping/train_matcher.py). ``match_attention``
exposes the same (matches0, scores0) contract as matcher.match_descriptors
so it drops into the SfM pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 5          # alternating self/cross blocks
    desc_dim: int = 845        # patch descriptor dim (13^2 x 5: color+grads)
    dustbin_init: float = 1.0


class MLP(nn.Module):
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d)(x)
            if i < len(self.dims) - 1:
                x = nn.relu(x)
        return x


class AttentionBlock(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x, source, mask):
        """Residual MHA + MLP. ``mask``: (B, 1, Nq, Nk) boolean."""
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
        )(x, source, mask=mask)
        x = x + a
        x = x + MLP((2 * self.d_model, self.d_model))(
            nn.LayerNorm()(x)
        )
        return nn.LayerNorm()(x)


class AttentionMatcher(nn.Module):
    cfg: MatcherConfig = MatcherConfig()

    @nn.compact
    def __call__(self, desc0, kp0, valid0, desc1, kp1, valid1):
        """All inputs batched: desc (B, N, D), kp (B, N, 2) normalized to
        [-1, 1], valid (B, N) bool. Returns the (B, N0+1, N1+1) assignment
        log-scores (last row/col = dustbins)."""
        c = self.cfg
        x0 = nn.Dense(c.d_model)(desc0) + MLP((32, 64, c.d_model))(kp0)
        x1 = nn.Dense(c.d_model)(desc1) + MLP((32, 64, c.d_model))(kp1)

        m00 = valid0[:, None, :, None] & valid0[:, None, None, :]
        m11 = valid1[:, None, :, None] & valid1[:, None, None, :]
        m01 = valid0[:, None, :, None] & valid1[:, None, None, :]
        m10 = valid1[:, None, :, None] & valid0[:, None, None, :]

        for i in range(c.n_layers):
            s0 = AttentionBlock(c.d_model, c.n_heads, name=f"self0_{i}")
            s1 = AttentionBlock(c.d_model, c.n_heads, name=f"self1_{i}")
            x0, x1 = s0(x0, x0, m00), s1(x1, x1, m11)
            c0 = AttentionBlock(c.d_model, c.n_heads, name=f"cross0_{i}")
            c1 = AttentionBlock(c.d_model, c.n_heads, name=f"cross1_{i}")
            x0, x1 = c0(x0, x1, m01), c1(x1, x0, m10)

        f0 = nn.Dense(c.d_model)(x0)
        f1 = nn.Dense(c.d_model)(x1)
        scores = jnp.einsum("bnd,bmd->bnm", f0, f1) / np.sqrt(c.d_model)

        bin0 = self.param(
            "dustbin", lambda k: jnp.asarray(c.dustbin_init, jnp.float32)
        )
        B, N0, N1 = scores.shape
        col = jnp.broadcast_to(bin0, (B, N0, 1))
        row = jnp.broadcast_to(bin0, (B, 1, N1 + 1))
        scores = jnp.concatenate([scores, col], axis=2)
        scores = jnp.concatenate([scores, row], axis=1)

        # invalid (padded) keypoints may only match the dustbin
        neg = jnp.asarray(-1e9, scores.dtype)
        v0 = jnp.concatenate(
            [valid0, jnp.ones((B, 1), bool)], axis=1
        )
        v1 = jnp.concatenate([valid1, jnp.ones((B, 1), bool)], axis=1)
        ok = v0[:, :, None] & v1[:, None, :]
        return jnp.where(ok, scores, neg)


def assignment_log_probs(scores):
    """Dual-softmax log-probability matrix from raw scores (B, N0+1, N1+1):
    log P = 0.5 (log softmax over rows + log softmax over cols)."""
    lr = jax.nn.log_softmax(scores, axis=2)
    lc = jax.nn.log_softmax(scores, axis=1)
    return 0.5 * (lr + lc)


def extract_matches(
    logp: np.ndarray, n0: int, n1: int, min_score: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """(matches0, scores0) from one (N0+1, N1+1) log-prob matrix: mutual
    argmax among real keypoints, beating the dustbin, above min_score."""
    P = np.exp(np.asarray(logp))
    real = P[:n0, :n1]
    best1 = real.argmax(axis=1)
    best0 = real.argmax(axis=0)
    mutual = best0[best1] == np.arange(n0)
    s = real[np.arange(n0), best1]
    beats_bin = s > P[:n0, n1]  # better than "unmatched"
    keep = mutual & beats_bin & (s >= min_score)
    matches0 = np.where(keep, best1, -1).astype(np.int32)
    return matches0, np.where(keep, s, 0.0).astype(np.float32)


class LearnedMatcher:
    """match_descriptors-shaped callable around trained weights.

    Pads each set to the next power-of-two bucket (static shapes -> one
    compile per bucket) and normalizes keypoints by the image diagonal."""

    def __init__(self, model: AttentionMatcher, params, min_score: float = 0.2):
        self.model = model
        self.params = params
        self.min_score = min_score
        self._jit = jax.jit(
            lambda p, d0, k0, v0, d1, k1, v1: assignment_log_probs(
                self.model.apply(p, d0, k0, v0, d1, k1, v1)
            )
        )

    def __call__(
        self, desc0, kp0, shape0, desc1, kp1, shape1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        n0, n1 = len(desc0), len(desc1)
        if n0 == 0 or n1 == 0:
            return np.full(n0, -1, np.int32), np.zeros(n0, np.float32)
        N = 1 << int(np.ceil(np.log2(max(n0, n1, 32))))

        def prep(desc, kp, shape, n):
            H, W = shape[:2]
            scale = np.array([W, H], np.float32)
            kpn = (np.asarray(kp, np.float32) / scale) * 2.0 - 1.0
            d = np.zeros((N, desc.shape[-1]), np.float32)
            k = np.zeros((N, 2), np.float32)
            v = np.zeros(N, bool)
            d[:n] = desc
            k[:n] = kpn
            v[:n] = True
            return d[None], k[None], v[None]

        d0, k0, v0 = prep(desc0, kp0, shape0, n0)
        d1, k1, v1 = prep(desc1, kp1, shape1, n1)
        logp = self._jit(self.params, d0, k0, v0, d1, k1, v1)[0]
        return extract_matches(np.asarray(logp), n0, n1, self.min_score)


def init_matcher(key, cfg: MatcherConfig = MatcherConfig()):
    model = AttentionMatcher(cfg)
    d = jnp.zeros((1, 32, cfg.desc_dim))
    k = jnp.zeros((1, 32, 2))
    v = jnp.ones((1, 32), bool)
    params = model.init(key, d, k, v, d, k, v)
    return model, params


def save_matcher_weights(path, params, cfg: MatcherConfig) -> None:
    import json

    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    arrays = {"/".join(map(str, k)): np.asarray(v) for k, v in flat.items()}
    meta = {"keys": list(arrays), "cfg": dataclasses.asdict(cfg)}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_matcher_weights(path):
    import json

    from flax.traverse_util import unflatten_dict

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(data[k]) for k in meta["keys"]}
    )
    cfg = MatcherConfig(**meta["cfg"])
    return AttentionMatcher(cfg), params, cfg
