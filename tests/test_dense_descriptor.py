"""Dense descriptor (mapping/dense_descriptor.py): net contract, bank
geometry, InfoNCE training, and the ARMED acceptance gate for a shipped
checkpoint (held-out mesh pairs vs the production patch descriptor)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from pixtrack_tpu.mapping.dense_descriptor import (
    DescBankConfig,
    DescTrainConfig,
    build_descriptor_bank,
    describe_at_dense,
    init_descriptor,
    load_descriptor_weights,
    save_descriptor_weights,
    train_descriptor,
)

WEIGHTS = Path(__file__).resolve().parents[1] / "assets" / "dense_descriptor.npz"


class TestNet:
    def test_output_contract(self):
        model, params = init_descriptor(jax.random.PRNGKey(0), size=64)
        x = np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
        d = model.apply(params, x)
        assert d.shape == (2, 32, 32, 128)
        n = np.linalg.norm(np.asarray(d), axis=-1)
        assert np.allclose(n, 1.0, atol=1e-4)

    def test_photometric_invariance_of_standardization(self):
        """Global gain/offset must not move the descriptors (the input
        standardization layer)."""
        model, params = init_descriptor(jax.random.PRNGKey(0), size=64)
        x = np.random.default_rng(1).uniform(size=(1, 64, 64, 3)).astype(np.float32)
        d0 = model.apply(params, x)
        d1 = model.apply(params, 0.5 * x + 0.2)
        assert np.max(np.abs(np.asarray(d0) - np.asarray(d1))) < 1e-3

    def test_save_load_describe_roundtrip(self, tmp_path):
        _, params = init_descriptor(jax.random.PRNGKey(1))
        img = (np.random.default_rng(2).uniform(0, 255, (96, 96, 3))
               .astype(np.uint8))
        kp = np.array([[10.0, 12.0], [50.5, 30.25], [80.0, 90.0]])
        d = describe_at_dense(params, img, kp)
        assert d.shape == (3, 128)
        save_descriptor_weights(tmp_path / "w.npz", params)
        _, p2 = load_descriptor_weights(tmp_path / "w.npz")
        assert np.allclose(d, describe_at_dense(p2, img, kp), atol=1e-5)


class TestBankAndTraining:
    @pytest.mark.slow
    def test_bank_geometry_and_training_learns(self, tmp_path):
        """Bank correspondences are geometrically consistent (descriptor
        sampled at pos in view b matches view a's keypoint content), and a
        few InfoNCE steps reduce the loss."""
        bank = build_descriptor_bank(
            tmp_path,
            DescBankConfig(n_scenes=2, n_views=6, res=160, max_kp=128,
                           seed=321),
        )
        assert bank["pairs"].shape[0] >= 4
        # consistency: reproject pos through the pair's inverse direction
        # is covered by construction; sanity-check pixel colors agree at
        # correspondences better than at random locations
        P = bank["pairs"].shape[0]
        diffs, rand_diffs = [], []
        rng = np.random.default_rng(0)
        for p in range(min(P, 6)):
            a, b = bank["pairs"][p]
            ok = bank["pvalid"][p]
            kp = bank["kp"][a][ok]
            pos = bank["pos"][p][ok]
            ia = bank["images"][a].astype(np.float32)
            ib = bank["images"][b].astype(np.float32)
            ca = ia[np.clip(np.round(kp[:, 1]).astype(int), 0, 159),
                    np.clip(np.round(kp[:, 0]).astype(int), 0, 159)]
            cb = ib[np.clip(np.round(pos[:, 1]).astype(int), 0, 159),
                    np.clip(np.round(pos[:, 0]).astype(int), 0, 159)]
            diffs.append(np.abs(ca - cb).mean())
            rnd = rng.uniform(0, 159, pos.shape)
            cr = ib[np.round(rnd[:, 1]).astype(int),
                    np.round(rnd[:, 0]).astype(int)]
            rand_diffs.append(np.abs(ca - cr).mean())
        assert np.mean(diffs) < 0.6 * np.mean(rand_diffs), (diffs, rand_diffs)

        params, info = train_descriptor(
            bank, DescTrainConfig(n_steps=25, batch_pairs=4, log_every=5)
        )
        hist = [l for _, l in info["history"]]
        assert min(hist[-3:]) < hist[0]


@pytest.mark.slow
@pytest.mark.skipif(not WEIGHTS.exists(), reason="no shipped checkpoint")
class TestShippedDescriptor:
    def test_beats_patch_on_held_out_mesh_pairs(self, tmp_path):
        """ARMED acceptance gate (VERDICT r4 #1): a SHIPPED learned
        descriptor must beat the production patch descriptor at NN+ratio
        matching on the held-out legacy-family mesh bank (seed 31 — the
        same protocol that rejected the r4 candidates,
        assets/negative/descriptor_ab_r4_eval.json): more correct matches
        AND at-least-equal precision."""
        from pixtrack_tpu.mapping.detector import detect_and_describe
        from pixtrack_tpu.mapping.matcher import match_descriptors
        from pixtrack_tpu.mapping.train_matcher import build_mesh_pair_bank

        _, params = load_descriptor_weights(WEIGHTS)

        def learned_detector(image, max_keypoints=256, **kw):
            kp, sc, _ = detect_and_describe(
                image, max_keypoints=max_keypoints, **kw
            )
            return kp, sc, describe_at_dense(params, image, kp)

        res = 192
        bank_p = build_mesh_pair_bank(
            tmp_path / "p", n_scenes=1, n_views=10, res=res, max_kp=256,
            min_deg=20.0, max_deg=52.0, seed=31,
        )
        bank_l = build_mesh_pair_bank(
            tmp_path / "l", n_scenes=1, n_views=10, res=res, max_kp=256,
            min_deg=20.0, max_deg=52.0, seed=31, detector=learned_detector,
        )

        def count(bank, min_score, ratio):
            c = prop = 0
            for p in range(bank["gt"].shape[0]):
                n0 = int(bank["valid0"][p].sum())
                n1 = int(bank["valid1"][p].sum())
                gt = bank["gt"][p][:n0]
                m0 = np.asarray(match_descriptors(
                    bank["desc0"][p][:n0], bank["desc1"][p][:n1],
                    min_score=min_score, ratio=ratio,
                )[0])
                prop += int((m0 >= 0).sum())
                c += int(((m0 == gt) & (gt >= 0) & (m0 >= 0)).sum())
            return c, prop

        c_p, n_p = count(bank_p, 0.5, 0.98)
        c_l, n_l = count(bank_l, 0.5, 0.98)
        prec_p = c_p / max(n_p, 1)
        prec_l = c_l / max(n_l, 1)
        print(f"patch: {c_p}/{n_p} ({prec_p:.3f}); "
              f"learned: {c_l}/{n_l} ({prec_l:.3f})")
        assert c_l > c_p, (c_p, c_l)
        assert prec_l >= prec_p - 0.01, (prec_p, prec_l)
