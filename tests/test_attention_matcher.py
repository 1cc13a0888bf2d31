"""Attentional matcher (SuperGlue role): contract + training machinery.

Real matching quality (beating MNN+ratio on wide-baseline pairs) is pinned
by the slow-marked test below once trained weights exist; the fast tests
cover the assignment math, the (matches0, scores0) contract, persistence,
and that the synthetic-correspondence training loop optimizes."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.mapping.attention_matcher import (
    LearnedMatcher,
    MatcherConfig,
    assignment_log_probs,
    extract_matches,
    init_matcher,
    load_matcher_weights,
    save_matcher_weights,
)

WEIGHTS = Path(__file__).resolve().parents[1] / "assets" / "matcher.npz"


class TestAssignment:
    def test_extract_matches_mutual_and_dustbin(self):
        # 3x3 score block: 0<->0 and 1<->1 strong, 2 prefers the dustbin
        s = np.full((4, 4), -5.0, np.float32)
        s[0, 0] = s[1, 1] = 6.0
        s[2, 3] = 6.0   # row dustbin
        s[3, :] = 0.0   # col dustbin row
        logp = assignment_log_probs(jnp.asarray(s)[None])[0]
        m, sc = extract_matches(np.asarray(logp), 3, 3, min_score=0.1)
        assert m.tolist() == [0, 1, -1]
        assert sc[0] > 0.1 and sc[2] == 0.0

    def test_padded_keypoints_only_match_dustbin(self):
        model, params = init_matcher(jax.random.PRNGKey(0))
        N = 32
        d = jnp.asarray(np.random.default_rng(0).normal(size=(1, N, 845)),
                        jnp.float32)
        k = jnp.zeros((1, N, 2))
        v = jnp.arange(N)[None, :] < 5  # only 5 real keypoints
        scores = model.apply(params, d, k, v, d, k, v)
        # any real<->padded cell is masked to -1e9
        assert float(scores[0, 0, 10]) < -1e8
        assert float(scores[0, 10, 0]) < -1e8
        # dustbin stays reachable
        assert float(scores[0, 0, N]) > -1e8


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = MatcherConfig(d_model=32, n_heads=2, n_layers=1)
        model, params = init_matcher(jax.random.PRNGKey(1), cfg)
        save_matcher_weights(tmp_path / "m.npz", params, cfg)
        model2, params2, cfg2 = load_matcher_weights(tmp_path / "m.npz")
        assert cfg2 == cfg
        d = jnp.zeros((1, 8, cfg.desc_dim))
        k = jnp.zeros((1, 8, 2))
        v = jnp.ones((1, 8), bool)
        np.testing.assert_allclose(
            np.asarray(model.apply(params, d, k, v, d, k, v)),
            np.asarray(model2.apply(params2, d, k, v, d, k, v)),
            atol=1e-6,
        )


class TestDefaultMatcher:
    def test_env_override_and_absence(self, tmp_path, monkeypatch):
        from pixtrack_tpu.mapping import default_matcher

        monkeypatch.setenv("PIXTRACK_MATCHER_WEIGHTS",
                           str(tmp_path / "missing.npz"))
        assert default_matcher() is None

        cfg = MatcherConfig(d_model=32, n_heads=2, n_layers=1, desc_dim=16)
        model, params = init_matcher(jax.random.PRNGKey(0), cfg)
        save_matcher_weights(tmp_path / "m.npz", params, cfg)
        monkeypatch.setenv("PIXTRACK_MATCHER_WEIGHTS", str(tmp_path / "m.npz"))
        lm = default_matcher(min_score=0.05)
        assert isinstance(lm, LearnedMatcher)
        d0 = np.random.default_rng(0).normal(size=(6, 16)).astype(np.float32)
        k0 = np.random.default_rng(1).uniform(0, 64, (6, 2)).astype(np.float32)
        m0, s0 = lm(d0, k0, (64, 64), d0, k0, (64, 64))
        assert m0.shape == (6,) and s0.shape == (6,)


class TestTraining:
    def test_loss_optimizes(self):
        from pixtrack_tpu.mapping.train_matcher import (
            MatcherTrainConfig,
            train_matcher,
        )

        cfg = MatcherTrainConfig(n_steps=15, batch=2, size=96, tex_size=96,
                                 n_match=24, n_distract=8, log_every=5,
                                 lr=1e-3)
        mcfg = MatcherConfig(d_model=64, n_heads=2, n_layers=2)
        model, params, info = train_matcher(cfg, mcfg)
        hist = info["history"]
        assert all(np.isfinite(l) for _, l in hist)
        assert min(l for _, l in hist[1:]) < hist[0][1], hist


class TestAssignmentNLL:
    def test_correct_assignment_scores_lower(self):
        """assignment_nll must prefer the GT assignment over a shuffle,
        with arbitrary (non-diagonal) gt indices and padding."""
        from pixtrack_tpu.mapping.train_matcher import assignment_nll
        from pixtrack_tpu.mapping.attention_matcher import (
            assignment_log_probs,
        )

        rng = np.random.default_rng(0)
        N0, N1 = 12, 10
        gt = np.full(N0, -1, np.int32)
        gt[:7] = rng.permutation(N1)[:7]
        valid0 = np.ones(N0, bool); valid0[-2:] = False
        valid1 = np.ones(N1, bool)
        scores = np.full((N0 + 1, N1 + 1), -4.0, np.float32)
        for i, j in enumerate(gt):
            if j >= 0:
                scores[i, j] = 6.0      # GT gets the high score
        scores[7:, N1] = 6.0            # unmatched rows -> dustbin
        logp = assignment_log_probs(jnp.asarray(scores)[None])[0]
        good = float(assignment_nll(
            logp, jnp.asarray(gt), jnp.asarray(valid0), jnp.asarray(valid1)
        ))
        bad_gt = gt.copy()
        bad_gt[:7] = np.roll(gt[:7], 1)
        bad = float(assignment_nll(
            logp, jnp.asarray(bad_gt), jnp.asarray(valid0), jnp.asarray(valid1)
        ))
        assert good < bad

    def test_mesh_bank_and_bank_training(self, tmp_path):
        """A tiny mesh-pair bank has depth-verified GT (descriptor
        similarity of GT matches beats shuffled pairs) and a short
        bank-training run reduces the loss."""
        from pixtrack_tpu.mapping.train_matcher import (
            MatcherTrainConfig,
            build_mesh_pair_bank,
            train_matcher_on_bank,
        )

        bank = build_mesh_pair_bank(tmp_path, n_scenes=1, n_views=6,
                                    res=128, max_kp=96, min_deg=8.0,
                                    max_deg=75.0)
        gt = bank["gt"]
        assert gt.shape[0] >= 4
        assert (gt >= 0).sum(1).min() >= 12
        d0, d1 = bank["desc0"], bank["desc1"]
        sims, shuf = [], []
        for p in range(gt.shape[0]):
            m = gt[p] >= 0
            sims.append((d0[p][m] * d1[p][gt[p][m]]).sum(-1).mean())
            shuf.append(
                (d0[p][m] * np.roll(d1[p][gt[p][m]], 1, axis=0)).sum(-1).mean()
            )
        assert np.mean(sims) > np.mean(shuf)

        mcfg = MatcherConfig(d_model=32, n_heads=2, n_layers=1)
        cfg = MatcherTrainConfig(n_steps=16, batch=2, log_every=4, lr=1e-3)
        _, _, info = train_matcher_on_bank(bank, cfg, mcfg)
        hist = [l for _, l in info["history"]]
        assert np.isfinite(info["holdout_nll"])
        assert min(hist[1:]) < hist[0]


@pytest.mark.slow
@pytest.mark.skipif(not WEIGHTS.exists(), reason="no trained matcher weights")
class TestTrainedMatcher:
    def test_beats_mnn_on_held_out_mesh_pairs(self, tmp_path):
        """A shipped checkpoint must out-match MNN+ratio on the DEPLOYMENT
        distribution — held-out wide-baseline mesh-render pairs with real
        detected keypoints (the SuperGlue-over-NN claim, reference
        run_reconstruction.py:41-50). Mesh pairs, not plane pairs: mutual-NN
        is already strong on planar texture (train_matcher.py module doc),
        so beating it there proves nothing; the r2 mesh-bank training
        measurably overfit and FAILED this bar (assets/negative/), which is
        why no checkpoint ships today. This test is the acceptance gate for
        any future one."""
        from pixtrack_tpu.mapping.attention_matcher import load_matcher_weights
        from pixtrack_tpu.mapping.matcher import match_descriptors
        from pixtrack_tpu.mapping.train_matcher import build_mesh_pair_bank

        model, params, _ = load_matcher_weights(WEIGHTS)
        lm = LearnedMatcher(model, params, min_score=0.1)
        # seed disjoint from the shipped training banks (train seed 1 ->
        # scenes 100.., runner eval seed 777 -> 77700..)
        bank = build_mesh_pair_bank(tmp_path, n_scenes=1, n_views=10,
                                    res=192, max_kp=256, min_deg=20.0,
                                    max_deg=52.0, seed=31)
        n_pairs = min(bank["gt"].shape[0], 16)
        nn_c = nn_p = at_c = at_p = 0
        for p in range(n_pairs):
            v0, v1 = bank["valid0"][p], bank["valid1"][p]
            n0, n1 = int(v0.sum()), int(v1.sum())
            d0, d1 = bank["desc0"][p][:n0], bank["desc1"][p][:n1]
            k0 = (bank["kpn0"][p][:n0] + 1) / 2 * 191
            k1 = (bank["kpn1"][p][:n1] + 1) / 2 * 191
            gt = bank["gt"][p][:n0]

            def prf(m0):
                m0 = np.asarray(m0)[:n0]
                prop = int((m0 >= 0).sum())
                corr = int(((m0 == gt) & (gt >= 0) & (m0 >= 0)).sum())
                return corr, prop

            c0, p0 = prf(match_descriptors(d0, d1, min_score=0.5,
                                           ratio=0.98)[0])
            c1, p1 = prf(lm(d0, k0, (192, 192), d1, k1, (192, 192))[0])
            nn_c += c0; nn_p += p0; at_c += c1; at_p += p1
        prec_nn = nn_c / max(nn_p, 1)
        prec_at = at_c / max(at_p, 1)
        print(f"{n_pairs} pairs: correct NN {nn_c} vs attention {at_c}; "
              f"precision NN {prec_nn:.2f} vs attention {prec_at:.2f}")
        assert at_c > nn_c, (nn_c, at_c)
        assert prec_at >= prec_nn, (prec_nn, prec_at)
