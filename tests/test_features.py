"""Tests for feature extractors: pyramid contract, resize policy, UNet shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.features.unet import UNetExtractor, init_unet


class TestHandcrafted:
    def test_pyramid_contract(self, rng):
        ex = HandcraftedExtractor()
        img = rng.uniform(size=(64, 96, 3)).astype(np.float32)
        pyr = ex(jnp.asarray(img))
        assert pyr.num_levels == 3
        assert pyr.levels[0].shape == (64, 96, 11)
        assert pyr.levels[1].shape == (16, 24, 11)
        assert pyr.levels[2].shape == (4, 6, 11)
        assert pyr.scales == ((1.0, 1.0), (0.25, 0.25), (1 / 16, 1 / 16))
        assert pyr.confidences is not None
        for c, f in zip(pyr.confidences, pyr.levels):
            assert c.shape == f.shape[:2]

    def test_shift_equivariance(self, rng):
        """Finest level of a shifted image is (approximately) a shifted map —
        the property the LM aligner relies on."""
        ex = HandcraftedExtractor(strides=(1,))
        img = rng.uniform(size=(64, 64)).astype(np.float32)
        import scipy.ndimage as ndi

        img_s = np.roll(img, 3, axis=1)
        f0 = np.asarray(ex(jnp.asarray(img)).levels[0])
        f1 = np.asarray(ex(jnp.asarray(img_s)).levels[0])
        # margin must exceed blur radius (sigma 3 -> radius ~10) + shift
        err = np.abs(np.roll(f0, 3, axis=1)[:, 16:-16] - f1[:, 16:-16]).max()
        assert err < 1e-3


class TestUNet:
    def test_shapes_and_contract(self, rng):
        model, params = init_unet(jax.random.PRNGKey(0), 64, 80)
        out = model.apply(params, jnp.zeros((1, 64, 80, 3)))
        f1, f4, f16 = out["feature_maps"]
        assert f1.shape == (1, 64, 80, 32)
        assert f4.shape == (1, 16, 20, 128)
        assert f16.shape == (1, 4, 5, 128)
        c1, c4, c16 = out["confidences"]
        assert c1.shape == (1, 64, 80)
        assert model.scales == (1, 4, 16)
        assert np.asarray(c1).min() >= 0 and np.asarray(c1).max() <= 1

    def test_params_are_f32(self, rng):
        _, params = init_unet(jax.random.PRNGKey(0), 32, 32)
        leaves = jax.tree.leaves(params)
        assert all(l.dtype == jnp.float32 for l in leaves)


class TestFeatureExtractor:
    def test_resize_policy_max(self, rng):
        ex = FeatureExtractor(HandcraftedExtractor(), resize=64, resize_by="max")
        img = rng.uniform(size=(128, 96, 3)).astype(np.float32)
        pyr = ex(img)
        # max edge 128 > 64 -> resized so max edge ~64
        H0, W0 = pyr.levels[0].shape[:2]
        assert max(H0, W0) <= 64 + 16
        # scales map original coords into feature coords
        sx, sy = pyr.scales[0]
        assert abs(sx - W0 / 96) < 1e-6
        assert abs(sy - H0 / 128) < 1e-6

    def test_no_resize_when_small(self, rng):
        ex = FeatureExtractor(HandcraftedExtractor(), resize=1024)
        img = rng.uniform(size=(48, 64, 3)).astype(np.float32)
        pyr = ex(img)
        assert pyr.levels[0].shape[:2] == (48, 64)
        assert pyr.scales[0] == (1.0, 1.0)

    def test_image_scale_divides_target(self, rng):
        ex = FeatureExtractor(HandcraftedExtractor(), resize=128)
        img = rng.uniform(size=(128, 128, 3)).astype(np.float32)
        pyr1 = ex(img, image_scale=1)
        pyr4 = ex(img, image_scale=4)
        assert pyr1.levels[0].shape[0] == 128
        assert pyr4.levels[0].shape[0] == 32  # 128 // 4
        assert pyr4.scales[0][0] == 0.25

    def test_uint8_input(self, rng):
        ex = FeatureExtractor(HandcraftedExtractor(), resize=None, normalize=False)
        img8 = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        pyr = ex(img8)
        imgf = img8.astype(np.float32) / 255.0
        pyr2 = ex(imgf)
        np.testing.assert_allclose(
            np.asarray(pyr.levels[0]), np.asarray(pyr2.levels[0]), atol=1e-5
        )

    def test_unet_through_extractor(self, rng):
        model, params = init_unet(jax.random.PRNGKey(0), 32, 32)
        ex = FeatureExtractor(model, params, resize=None)
        img = rng.uniform(size=(32, 48, 3)).astype(np.float32)
        pyr = ex(img)
        assert pyr.levels[0].shape == (32, 48, 32)
        # normalized descriptors have unit norm
        norms = np.linalg.norm(np.asarray(pyr.levels[0]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


class TestObservations:
    def test_observe_and_aggregate(self, rng):
        from pixtrack_tpu.align.observations import (
            aggregate_observations,
            observe_points,
        )
        from pixtrack_tpu.geometry import Camera, Pose

        ex = HandcraftedExtractor()
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        pyr = ex(jnp.asarray(img))
        cam = Camera.pinhole(60.0, 60.0, 31.5, 31.5, 64, 64)
        T = Pose.identity()
        p3d = np.stack(
            [rng.uniform(-0.4, 0.4, 50), rng.uniform(-0.4, 0.4, 50), np.full(50, 1.5)],
            axis=1,
        ).astype(np.float32)
        feats, weights, valids = observe_points(pyr, T, cam, jnp.asarray(p3d))
        assert feats[0].shape == (50, 11)
        assert np.asarray(valids[0]).sum() > 40
        # aggregate two identical views -> same features
        fv = jnp.stack([feats[0], feats[0]])
        wv = jnp.stack([weights[0], weights[0]])
        vv = jnp.stack([valids[0], valids[0]])
        f, w, valid = aggregate_observations(fv, wv, vv)
        m = np.asarray(valids[0])
        np.testing.assert_allclose(np.asarray(f)[m], np.asarray(feats[0])[m], atol=1e-5)
