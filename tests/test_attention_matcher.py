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

        cfg = MatcherTrainConfig(n_steps=30, batch=2, size=96, tex_size=96,
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


@pytest.mark.skipif(not WEIGHTS.exists(), reason="no trained matcher weights")
class TestTrainedMatcher:
    def test_beats_mnn_on_wide_baseline(self):
        """Trained weights must out-match MNN+ratio on held-out wide-baseline
        plane pairs (the SuperGlue-over-NN claim, reference
        run_reconstruction.py:41-50)."""
        import jax

        from pixtrack_tpu.geometry import Camera
        from pixtrack_tpu.mapping.attention_matcher import load_matcher_weights
        from pixtrack_tpu.mapping.detector import _describe
        from pixtrack_tpu.mapping.matcher import match_descriptors
        from pixtrack_tpu.mapping.train_matcher import MatcherTrainConfig, make_pair

        model, params, _ = load_matcher_weights(WEIGHTS)
        lm = LearnedMatcher(model, params)
        cfg = MatcherTrainConfig(size=160, n_match=96, n_distract=32,
                                 max_rel_deg=40.0, jitter_px=0.5)
        camera = Camera.pinhole(192.0, 192.0, 79.5, 79.5, 160, 160)

        def run_pair(seed):
            key = jax.random.PRNGKey(10_000 + seed)  # held out
            img0, img1, kp0, kp1, vm = make_pair(key, cfg, camera)
            de0 = np.asarray(_describe(img0, kp0, 13, 2.0))
            de1 = np.asarray(_describe(img1, kp1, 13, 2.0))
            kp0, kp1 = np.asarray(kp0), np.asarray(kp1)
            vm = np.asarray(vm)

            def prf(m0):
                idx = np.arange(cfg.n_match)
                correct = (m0[:cfg.n_match] == idx) & vm
                proposed = (m0 >= 0).sum()
                return correct.sum(), max(proposed, 1)

            m_nn, _ = match_descriptors(de0, de1, min_score=0.5, ratio=0.98)
            m_at, _ = lm(de0, kp0, (160, 160), de1, kp1, (160, 160))
            return prf(np.asarray(m_nn)), prf(m_at)

        nn_c = nn_p = at_c = at_p = 0
        for s in range(6):
            (c0, p0), (c1, p1) = run_pair(s)
            nn_c += c0
            nn_p += p0
            at_c += c1
            at_p += p1
        rec_nn, rec_at = nn_c / 6, at_c / 6
        prec_nn, prec_at = nn_c / nn_p, at_c / at_p
        print(f"recall NN {rec_nn:.1f} vs attention {rec_at:.1f}; "
              f"precision NN {prec_nn:.2f} vs attention {prec_at:.2f}")
        assert at_c > nn_c, (rec_nn, rec_at)
        assert prec_at >= 0.8, prec_at
