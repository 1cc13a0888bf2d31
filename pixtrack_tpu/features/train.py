"""Self-supervised UNet feature training: warp-consistency InfoNCE.

The reference downloads the pre-trained pixloc_megadepth checkpoint
(setup.sh:14-21) — unreachable here, so features are trained in-repo. The
objective makes dense features suitable for feature-metric LM alignment:

- sample a synthetic textured image (random Fourier textures; optionally
  user-supplied images), warp it with a random homography + photometric
  jitter;
- at corresponding pixel pairs, per pyramid level, apply InfoNCE: a pixel's
  descriptor must match its counterpart under the warp and differ from other
  locations (distinctiveness + warp equivariance — the two properties the LM
  aligner needs);
- confidences are trained to predict correspondence quality (sigmoid on the
  positive similarity), giving the aligner meaningful weights.

All steps jitted; weights persist via the same npz snapshot codec as NeRF.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.features.unet import UNetExtractor, init_unet, normalize_features


@dataclasses.dataclass(frozen=True)
class FeatureTrainConfig:
    n_steps: int = 2000
    batch: int = 4
    size: int = 128           # training crop size (multiple of 16)
    n_pairs: int = 256        # correspondence pairs per level per image
    lr: float = 1e-3
    temperature: float = 0.07
    max_rot_deg: float = 25.0
    max_scale: float = 0.25
    max_shift: float = 0.15
    log_every: int = 200


# ----------------------------------------------------------- synthetic data --
def random_texture_batch(key, batch: int, size: int) -> jax.Array:
    """Random smooth RGB textures via low-frequency Fourier synthesis."""
    kf, ka, kp = jax.random.split(key, 3)
    n_modes = 24
    freqs = jax.random.uniform(kf, (batch, 3, n_modes, 2), minval=0.5, maxval=14.0)
    amps = jax.random.normal(ka, (batch, 3, n_modes)) / np.sqrt(n_modes)
    phases = jax.random.uniform(kp, (batch, 3, n_modes), maxval=2 * np.pi)
    ys, xs = jnp.meshgrid(
        jnp.linspace(0, 1, size), jnp.linspace(0, 1, size), indexing="ij"
    )
    grid = jnp.stack([xs, ys], -1).reshape(-1, 2)  # (S^2, 2)
    phase = jnp.einsum("bcmk,pk->bcmp", freqs, grid) * 2 * np.pi + phases[..., None]
    img = jnp.einsum("bcm,bcmp->bcp", amps, jnp.sin(phase))
    img = img.reshape(batch, 3, size, size).transpose(0, 2, 3, 1)
    img = jax.nn.sigmoid(2.0 * img)
    return img


def random_homographies(key, batch: int, cfg: FeatureTrainConfig) -> jax.Array:
    """Random similarity+perspective-lite homographies mapping [0,S)^2."""
    kr, ks, kt = jax.random.split(key, 3)
    ang = jax.random.uniform(
        kr, (batch,), minval=-cfg.max_rot_deg, maxval=cfg.max_rot_deg
    ) * (np.pi / 180)
    sc = 1.0 + jax.random.uniform(
        ks, (batch,), minval=-cfg.max_scale, maxval=cfg.max_scale
    )
    tx = jax.random.uniform(kt, (batch, 2), minval=-cfg.max_shift, maxval=cfg.max_shift)
    c, s = jnp.cos(ang), jnp.sin(ang)
    S = cfg.size
    center = (S - 1) / 2.0
    H = jnp.zeros((batch, 3, 3))
    H = H.at[:, 0, 0].set(sc * c).at[:, 0, 1].set(-sc * s)
    H = H.at[:, 1, 0].set(sc * s).at[:, 1, 1].set(sc * c)
    H = H.at[:, 2, 2].set(1.0)
    # rotate about center, then shift
    t = (
        -jnp.einsum("bij,j->bi", H[:, :2, :2], jnp.asarray([center, center]))
        + center
        + tx * S
    )
    H = H.at[:, 0, 2].set(t[:, 0]).at[:, 1, 2].set(t[:, 1])
    return H


def warp_image(img: jax.Array, H: jax.Array) -> jax.Array:
    """Inverse-warp (H maps source coords -> target coords)."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    S = img.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                          jnp.arange(S, dtype=jnp.float32), indexing="ij")
    tgt = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).reshape(-1, 3)
    Hinv = jnp.linalg.inv(H)
    src = tgt @ Hinv.T
    src = src[:, :2] / jnp.maximum(src[:, 2:3], 1e-8)
    vals, _, valid = interpolate_features(img, src, compute_grad=False)
    out = jnp.where(valid[:, None], vals, 0.0)
    return out.reshape(S, S, img.shape[-1])


# ------------------------------------------------------------------- loss ----
def _level_infonce(feat0, feat1, conf0, H, key, scale, n_pairs, temperature):
    """InfoNCE at one pyramid level between image0 and warped image1."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    S0 = feat0.shape[0]
    # sample source locations (level coords)
    k1, _ = jax.random.split(key)
    p0 = jax.random.uniform(k1, (n_pairs, 2), minval=0.1, maxval=0.9) * (S0 - 1)
    # map to image coords, through H, back to level coords
    p0_img = p0 / scale
    p0_h = jnp.concatenate([p0_img, jnp.ones((n_pairs, 1))], axis=1)
    p1_img = p0_h @ H.T
    p1_img = p1_img[:, :2] / jnp.maximum(p1_img[:, 2:3], 1e-8)
    p1 = p1_img * scale

    f0, _, v0 = interpolate_features(feat0, p0, compute_grad=False)
    f1, _, v1 = interpolate_features(feat1, p1, compute_grad=False)
    valid = (v0 & v1).astype(jnp.float32)

    f0 = f0 / jnp.maximum(jnp.linalg.norm(f0, axis=1, keepdims=True), 1e-6)
    f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-6)
    sim = f0 @ f1.T / temperature  # (P, P)
    labels = jnp.arange(n_pairs)
    loss = optax.softmax_cross_entropy_with_integer_labels(sim, labels)
    loss = jnp.sum(loss * valid) / jnp.maximum(valid.sum(), 1.0)

    # confidence: predict the (detached) positive similarity
    pos_sim = jax.lax.stop_gradient(
        jnp.sum(f0 * f1, axis=1) * 0.5 + 0.5
    )
    c0, _, _ = interpolate_features(conf0[..., None], p0, compute_grad=False)
    conf_loss = jnp.sum(((c0[:, 0] - pos_sim) ** 2) * valid) / jnp.maximum(
        valid.sum(), 1.0
    )
    return loss + 0.1 * conf_loss


def make_loss_fn(model: UNetExtractor, cfg: FeatureTrainConfig):
    def loss_fn(params, key):
        k_tex, k_h, k_jit, k_pairs = jax.random.split(key, 4)
        imgs = random_texture_batch(k_tex, cfg.batch, cfg.size)
        Hs = random_homographies(k_h, cfg.batch, cfg)
        warped = jax.vmap(warp_image)(imgs, Hs)
        # photometric jitter on the warped copy
        gain = 1.0 + 0.2 * jax.random.normal(k_jit, (cfg.batch, 1, 1, 3))
        warped = jnp.clip(warped * gain, 0.0, 1.0)

        out0 = model.apply(params, imgs)
        out1 = model.apply(params, warped)
        total = 0.0
        keys = jax.random.split(k_pairs, cfg.batch * 3).reshape(cfg.batch, 3, 2)
        for lvl, stride in enumerate(model.scales):
            scale = 1.0 / stride
            f0s = normalize_features(out0["feature_maps"][lvl])
            f1s = normalize_features(out1["feature_maps"][lvl])
            c0s = out0["confidences"][lvl]
            lvl_loss = jax.vmap(
                lambda f0, f1, c0, H, k: _level_infonce(
                    f0, f1, c0, H, k, scale, cfg.n_pairs, cfg.temperature
                )
            )(f0s, f1s, c0s, Hs, keys[:, lvl])
            total = total + jnp.mean(lvl_loss)
        return total / len(model.scales)

    return loss_fn


def train_features(
    cfg: FeatureTrainConfig = FeatureTrainConfig(),
    seed: int = 0,
    params: Optional[dict] = None,
    callback=None,
):
    """Train the UNet extractor; returns (model, params, info)."""
    model, init_params = init_unet(jax.random.PRNGKey(seed), cfg.size, cfg.size)
    if params is None:
        params = init_params
    loss_fn = make_loss_fn(model, cfg)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k, k_next = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    key = jax.random.PRNGKey(seed + 1)
    history = []
    t0 = time.time()
    for i in range(cfg.n_steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        if (i + 1) % cfg.log_every == 0 or i == 0:
            lv = float(loss)
            history.append((i + 1, lv))
            if callback:
                callback(i + 1, lv)
    jax.block_until_ready(params)
    return model, params, {"history": history, "seconds": time.time() - t0}


# ------------------------------------------------------------- persistence ---
def save_unet_weights(path, params) -> None:
    import json

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    meta = {"keys": [jax.tree_util.keystr(kp) for kp, _ in flat]}
    arrays = {f"arr_{i}": np.asarray(v) for i, (_, v) in enumerate(flat)}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_unet_weights(path) -> Tuple[UNetExtractor, dict]:
    import json

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params: dict = {}
    for i, keystr in enumerate(meta["keys"]):
        keys = [k.strip("'") for k in keystr.strip("[]").split("][")]
        d = params
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = jnp.asarray(data[f"arr_{i}"])
    return UNetExtractor(), params
