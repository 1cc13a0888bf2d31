"""Learned (basin-trained) UNet features: the pixloc-checkpoint role.

The r1 InfoNCE UNet tracked 5.7x WORSE than the handcrafted pyramid; the r2
basin-aware objective (train through the production aligner,
features/train_basin.py) reverses this decisively on the held-out nuisance
benchmark (features/evaluate.py):

    unet_basin:  rot err median 0.31 deg, convergence 83%  (48 runs)
    handcrafted: rot err median 39.8 deg, convergence 35%

(assets/unet_basin_eval.json, measured r2 on TPU.) These tests pin (a) that
the shipped checkpoint stays loadable and aligned with the extractor
contract, and (b) the held-out-benchmark win at small scale.
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
from pixtrack_tpu.features.evaluate import FeatureEvalConfig, evaluate_extractor
from pixtrack_tpu.features.train import load_unet_weights

WEIGHTS = Path(__file__).resolve().parents[1] / "assets" / "unet_basin.npz"

pytestmark = pytest.mark.skipif(
    not WEIGHTS.exists(), reason="trained basin weights not present"
)


@pytest.fixture(scope="module")
def unet():
    model, params = load_unet_weights(WEIGHTS)
    return FeatureExtractor(model, params=params, resize=None)


class TestCheckpoint:
    def test_pyramid_contract(self, unet):
        img = np.random.default_rng(0).uniform(0, 1, (96, 96, 3)).astype(np.float32)
        pyr = unet(img)
        assert pyr.num_levels == 3
        assert pyr.levels[0].shape[:2] == (96, 96)
        assert pyr.levels[1].shape[:2] == (24, 24)
        assert pyr.levels[2].shape[:2] == (6, 6)
        assert pyr.confidences is not None
        # normalized descriptors
        n = np.linalg.norm(np.asarray(pyr.levels[0]), axis=-1)
        np.testing.assert_allclose(n[n > 1e-3], 1.0, atol=1e-2)


class TestHeldOutBenchmark:
    def test_unet_beats_handcrafted_under_nuisances(self, unet):
        """Small-scale version of the deciding benchmark (2 scenes x 2
        starts; deterministic seeds): the basin-trained UNet must converge
        where the handcrafted pyramid diverges. The 4x3 version of this
        gate lives in the slow tier via the full eval
        (assets/unet_basin_eval.json, n=48)."""
        cfg = FeatureEvalConfig(n_scenes=2, n_perturb=2, seed=2000)
        acfg = AlignConfig(num_iters=60, robust_c=1.0)
        r_unet = evaluate_extractor(lambda im: unet(im), cfg, acfg)
        hand = FeatureExtractor(HandcraftedExtractor(), resize=None)
        r_hand = evaluate_extractor(lambda im: hand(im), cfg, acfg)

        assert r_unet["rot_err_median"] < 1.5, r_unet
        assert r_unet["rot_err_median"] < r_hand["rot_err_median"], (
            r_unet, r_hand,
        )
        assert r_unet["convergence_rate"] > r_hand["convergence_rate"], (
            r_unet, r_hand,
        )
