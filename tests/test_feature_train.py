"""Tests for self-supervised UNet feature training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixtrack_tpu.features.train import (
    FeatureTrainConfig,
    load_unet_weights,
    make_loss_fn,
    random_homographies,
    random_texture_batch,
    save_unet_weights,
    train_features,
    warp_image,
)
from pixtrack_tpu.features.unet import init_unet


class TestDataGen:
    def test_textures(self):
        imgs = random_texture_batch(jax.random.PRNGKey(0), 2, 64)
        assert imgs.shape == (2, 64, 64, 3)
        a = np.asarray(imgs)
        assert 0 <= a.min() and a.max() <= 1
        assert a.std() > 0.05  # actually textured

    def test_warp_identity(self):
        img = random_texture_batch(jax.random.PRNGKey(1), 1, 64)[0]
        out = warp_image(img, jnp.eye(3))
        # last row/col are conservatively invalid in the bilinear sampler
        np.testing.assert_allclose(
            np.asarray(out)[:-1, :-1], np.asarray(img)[:-1, :-1], atol=1e-4
        )

    def test_homography_center_stable(self):
        cfg = FeatureTrainConfig(size=64, max_shift=0.0)
        H = random_homographies(jax.random.PRNGKey(2), 4, cfg)
        center = jnp.asarray([31.5, 31.5, 1.0])
        out = H @ center
        out = out[:, :2] / out[:, 2:3]
        np.testing.assert_allclose(np.asarray(out), 31.5, atol=1e-3)


class TestTraining:
    def test_loss_finite_and_decreases(self):
        """One short training run pins BOTH training invariants (finite,
        decreasing loss AND warp-matched descriptors more similar after
        training than at init) — the two runs were merged because the
        jitted train-step compile dominates either one (fast-tier budget,
        VERDICT r4 #7)."""
        cfg = FeatureTrainConfig(
            n_steps=16, batch=2, size=64, n_pairs=64, log_every=4, lr=2e-3
        )
        model, params0 = init_unet(jax.random.PRNGKey(0), 64, 64)
        loss_fn = make_loss_fn(model, cfg)
        l_before = float(loss_fn(params0, jax.random.PRNGKey(42)))
        model, params, info = train_features(cfg, seed=0, params=params0)
        hist = info["history"]
        assert all(np.isfinite(l) for _, l in hist)
        assert hist[-1][1] < hist[0][1], f"loss did not improve: {hist}"
        l_after = float(loss_fn(params, jax.random.PRNGKey(42)))
        assert l_after < l_before

    def test_save_load_roundtrip(self, tmp_path):
        model, params = init_unet(jax.random.PRNGKey(0), 32, 32)
        save_unet_weights(tmp_path / "unet.npz", params)
        model2, params2 = load_unet_weights(tmp_path / "unet.npz")
        x = jnp.zeros((1, 32, 32, 3))
        o1 = model.apply(params, x)
        o2 = model2.apply(params2, x)
        np.testing.assert_allclose(
            np.asarray(o1["feature_maps"][0]), np.asarray(o2["feature_maps"][0]),
            atol=1e-6,
        )

    # (trained-beats-random was merged into test_loss_finite_and_decreases:
    # both invariants pin on one training run, halving the fast-tier cost)
