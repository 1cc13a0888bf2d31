"""Train the attentional matcher on synthetic correspondences.

SuperGlue's training recipe, rebuilt offline (the reference downloads
trained 'indoor' weights, run_reconstruction.py:41-50): render textured
plane pairs with exact two-view geometry (train_basin's scene machinery),
plant keypoints at plane points visible in both views, describe them with
the PRODUCTION patch descriptor (mapping/detector.describe_keypoints — the
matcher must fix THIS descriptor's confusions, not SuperPoint's), add
unmatched distractor keypoints in each view, and minimize the dual-softmax
NLL of the ground-truth assignment (matches to cells, unmatched to
dustbins).

Wide baselines are the point: pairs are sampled with up to ~45 deg of
relative rotation, where mutual-NN + ratio on patch descriptors breaks
down (foreshortening) but geometry-aware attention can still disambiguate.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.features.train_basin import (
    _look_at_w2c,
    random_texture,
    render_plane,
)
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.mapping.attention_matcher import (
    AttentionMatcher,
    MatcherConfig,
    assignment_log_probs,
    init_matcher,
)


@dataclasses.dataclass(frozen=True)
class MatcherTrainConfig:
    n_steps: int = 2000
    batch: int = 4
    size: int = 160
    tex_size: int = 192
    n_match: int = 96           # planted correspondences per pair
    n_distract: int = 32        # per-view unmatched keypoints
    max_rel_deg: float = 45.0   # relative-rotation range (wide baseline)
    jitter_px: float = 0.5      # keypoint localization noise
    lr: float = 2e-4
    log_every: int = 50
    seed: int = 0


def make_pair(key, cfg: MatcherTrainConfig, camera: Camera):
    """One training pair; returns (img0, img1, kp0, kp1, valid_match,
    d0_extra, d1_extra) — all static shapes. kp arrays hold the planted
    matches first, then the distractors."""
    (k_tex, k_p0, k_r0, k_rel, k_pts, k_d0, k_d1, k_j) = jax.random.split(key, 8)
    size = cfg.size
    texture = random_texture(k_tex, cfg.tex_size)

    kd, kth, kph = jax.random.split(k_p0, 3)
    d = jax.random.uniform(kd, (), minval=1.3, maxval=1.9)
    th = jax.random.uniform(kth, (), minval=0.05, maxval=0.7)
    ph = jax.random.uniform(kph, (), minval=0.0, maxval=2 * np.pi)
    center = d * jnp.stack(
        [jnp.sin(th) * jnp.cos(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(th)]
    )
    roll0 = jax.random.uniform(k_r0, (), minval=-np.pi, maxval=np.pi)
    T0 = _look_at_w2c(center, roll0)

    # second view: random relative motion up to max_rel_deg
    dr = jax.random.normal(k_rel, (6,))
    dr = dr / jnp.maximum(jnp.linalg.norm(dr), 1e-8)
    mag = jnp.deg2rad(cfg.max_rel_deg) * jax.random.uniform(k_rel, ())
    T1 = T0.retract(dr * mag * jnp.asarray([1, 1, 1, 0.25, 0.25, 0.25]))

    img0 = render_plane(texture, None, T0, camera, (size, size))
    img1 = render_plane(texture, None, T1, camera, (size, size))

    # planted correspondences: plane points visible in both views
    uvp = jax.random.uniform(k_pts, (cfg.n_match, 2), minval=-0.45, maxval=0.45)
    p3d = jnp.concatenate([uvp, jnp.zeros((cfg.n_match, 1))], axis=1)
    kp0m, v0 = camera.world2image(T0, p3d)
    kp1m, v1 = camera.world2image(T1, p3d)
    inb = lambda k: (
        (k[:, 0] > 8) & (k[:, 0] < size - 9) & (k[:, 1] > 8) & (k[:, 1] < size - 9)
    )
    valid_match = v0 & v1 & inb(kp0m) & inb(kp1m)

    # localization jitter (detector noise)
    j0, j1 = jax.random.normal(k_j, (2, cfg.n_match, 2)) * cfg.jitter_px
    kp0m = kp0m + j0
    kp1m = kp1m + j1

    # distractors: random image locations (background / one-view-only)
    d0 = jax.random.uniform(
        k_d0, (cfg.n_distract, 2), minval=10.0, maxval=size - 11.0
    )
    d1 = jax.random.uniform(
        k_d1, (cfg.n_distract, 2), minval=10.0, maxval=size - 11.0
    )
    kp0 = jnp.concatenate([kp0m, d0], axis=0)
    kp1 = jnp.concatenate([kp1m, d1], axis=0)
    return img0, img1, kp0, kp1, valid_match


def make_batch(key, cfg: MatcherTrainConfig):
    """Host-callable batch generator (jitted internally). Returns arrays for
    the train step: descs, normalized kps, valid masks, gt assignment."""
    size = cfg.size
    camera = Camera.pinhole(
        size * 1.2, size * 1.2, (size - 1) / 2, (size - 1) / 2, size, size
    )
    from pixtrack_tpu.mapping.detector import _describe

    def one(k):
        img0, img1, kp0, kp1, vm = make_pair(k, cfg, camera)
        de0 = _describe(img0, kp0, 13, 2.0)
        de1 = _describe(img1, kp1, 13, 2.0)
        kn0 = kp0 / (size - 1) * 2.0 - 1.0
        kn1 = kp1 / (size - 1) * 2.0 - 1.0
        return de0, kn0, de1, kn1, vm

    return jax.vmap(one)(jax.random.split(key, cfg.batch))


def matcher_loss(logp, valid_match, n_match, n_total):
    """NLL of the GT assignment. Planted pair i <-> i when valid; every
    other keypoint (invalid plants + distractors) belongs to a dustbin."""
    B = logp.shape[0]
    idx = jnp.arange(n_match)
    diag = logp[:, idx, idx]                          # (B, n_match)
    pos = jnp.where(valid_match, diag, 0.0)
    n_pos = jnp.maximum(valid_match.sum(axis=1), 1)

    # unmatched: row dustbin for view-0 extras, col dustbin for view-1
    row_bin = logp[:, :n_total, n_total]              # (B, n_total)
    col_bin = logp[:, n_total, :n_total]
    unm0 = jnp.concatenate(
        [~valid_match, jnp.ones((B, n_total - n_match), bool)], axis=1
    )
    neg0 = jnp.where(unm0, row_bin, 0.0)
    neg1 = jnp.where(unm0, col_bin, 0.0)  # same planted validity by symmetry
    n_neg = jnp.maximum(unm0.sum(axis=1), 1)

    loss = -(pos.sum(1) / n_pos) - 0.5 * (
        neg0.sum(1) / n_neg + neg1.sum(1) / n_neg
    )
    return loss.mean()


def train_matcher(
    cfg: MatcherTrainConfig = MatcherTrainConfig(),
    mcfg: Optional[MatcherConfig] = None,
    params: Optional[dict] = None,
    callback=None,
):
    mcfg = mcfg or MatcherConfig()
    model, init_params = init_matcher(jax.random.PRNGKey(cfg.seed), mcfg)
    if params is None:
        params = init_params
    n_total = cfg.n_match + cfg.n_distract

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_data, k_next = jax.random.split(key)
        de0, kn0, de1, kn1, vm = make_batch(k_data, cfg)
        B = de0.shape[0]
        valid = jnp.ones((B, n_total), bool)

        def loss_fn(p):
            scores = model.apply(p, de0, kn0, valid, de1, kn1, valid)
            return matcher_loss(
                assignment_log_probs(scores), vm, cfg.n_match, n_total
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    t0 = time.time()
    for i in range(cfg.n_steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        if (i + 1) % cfg.log_every == 0 or i == 0:
            lv = float(loss)
            history.append((i + 1, lv))
            if callback:
                # params included so callers can checkpoint mid-train
                callback(i + 1, lv, params)
    jax.block_until_ready(params)
    return model, params, {"history": history, "seconds": time.time() - t0}
