"""Tests for the feature-metric LM aligner: correctness of the Jacobian chain
and convergence on synthetic feature fields with known ground-truth pose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixtrack_tpu.align.interpolate import interpolate_features
from pixtrack_tpu.align.lm import (
    AlignConfig,
    LevelData,
    _residuals_and_jacobian,
    align_level,
    align_pyramid,
    residual_cost,
)
from pixtrack_tpu.geometry import Camera, Pose


def smooth_field(rng, H, W, C, sigma=6):
    """Smooth random feature field (so LM has a basin of attraction)."""
    import scipy.ndimage as ndi

    f = rng.normal(size=(H, W, C)).astype(np.float32)
    f = ndi.gaussian_filter(f, (sigma, sigma, 0))
    f /= np.abs(f).max()
    return jnp.asarray(f)


def make_problem(rng, n_pts=256, H=120, W=160, C=8, noise=0.0):
    cam = Camera.pinhole(150.0, 150.0, (W - 1) / 2, (H - 1) / 2, W, H)
    fmap = smooth_field(rng, H, W, C)
    # ground-truth pose: slight offset from identity, points in front
    T_gt = Pose.from_aa_t(
        np.deg2rad([2.0, -1.0, 0.5]).astype(np.float32),
        np.array([0.02, -0.01, 0.0], np.float32),
    )
    p3d = rng.uniform(-0.5, 0.5, size=(n_pts, 3)).astype(np.float32)
    p3d[:, 2] = rng.uniform(1.5, 2.5, size=n_pts)
    p3d = jnp.asarray(p3d)
    scale = jnp.ones(2, jnp.float32)
    p2d_gt, visible = cam.project(T_gt.transform(p3d))
    f_ref, _, inmap = interpolate_features(fmap, p2d_gt * scale)
    if noise:
        f_ref = f_ref + noise * rng.normal(size=f_ref.shape).astype(np.float32)
    mask = np.asarray(visible & inmap)
    data = LevelData(
        p3d=p3d,
        f_ref=f_ref,
        w_ref=jnp.ones(n_pts),
        mask=jnp.asarray(mask),
        fmap=fmap,
        conf=None,
        scale=scale,
    )
    return cam, data, T_gt


class TestJacobian:
    def test_matches_autodiff(self, rng):
        cam, data, T_gt = make_problem(rng, n_pts=64)
        cfg = AlignConfig()
        T0 = T_gt.retract(jnp.asarray([0.01, -0.02, 0.005, 0.01, 0.0, -0.01]))
        r, J, w, valid, e2 = _residuals_and_jacobian(T0, data, cam, cfg)

        def res_fn(delta):
            T = T0.retract(delta)
            r_, _, _, _, _ = _residuals_and_jacobian(T, data, cam, cfg, compute_jac=False)
            return r_

        J_auto = jax.jacrev(res_fn)(jnp.zeros(6))  # (N, C, 6)
        m = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(J)[m], np.asarray(J_auto)[m], atol=5e-3, rtol=5e-2
        )

    def test_gradient_descends(self, rng):
        """One damped step from a perturbed pose must reduce the cost."""
        cam, data, T_gt = make_problem(rng)
        cfg = AlignConfig(num_iters=1)
        T0 = T_gt.retract(jnp.asarray([0.02, 0.0, -0.01, 0.02, -0.03, 0.01]))
        c0, _ = residual_cost(T0, data, cam, cfg)
        st = align_level(T0, data, cam, cfg)
        assert float(st.cost) <= float(c0) + 1e-7


class TestConvergence:
    @pytest.mark.parametrize("pert_deg,pert_t", [(2.0, 0.02), (5.0, 0.05)])
    def test_recovers_gt_single_level(self, rng, pert_deg, pert_t):
        cam, data, T_gt = make_problem(rng)
        cfg = AlignConfig(num_iters=100)
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * np.deg2rad(pert_deg)
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * pert_t
        T0 = T_gt.retract(jnp.asarray(np.concatenate([w, v]), jnp.float32))
        st = align_level(T0, data, cam, cfg)
        T_err = st.T @ T_gt.inv()
        dR, dt = T_err.magnitude()
        assert float(dR) < 0.2, f"rotation error {float(dR)} deg"
        assert float(dt) < 2e-3, f"translation error {float(dt)}"

    def test_pyramid_extends_basin(self, rng):
        """A coarse level lets LM recover from larger perturbations."""
        cam, data, T_gt = make_problem(rng, H=240, W=320, n_pts=512)
        # coarse level: 4x downsample of the field
        fmap_c = jax.image.resize(
            data.fmap, (60, 80, data.fmap.shape[-1]), method="linear"
        )
        p2d_gt, _ = cam.project(T_gt.transform(data.p3d))
        from pixtrack_tpu.align.interpolate import interpolate_features as interp

        f_ref_c, _, _ = interp(fmap_c, p2d_gt * 0.25)
        data_c = LevelData(
            p3d=data.p3d, f_ref=f_ref_c, w_ref=data.w_ref, mask=data.mask,
            fmap=fmap_c, conf=None, scale=jnp.full(2, 0.25, jnp.float32),
        )
        cfg = AlignConfig(num_iters=80)
        T0 = T_gt.retract(
            jnp.asarray([0.1, -0.08, 0.05, 0.08, 0.1, -0.05], jnp.float32)
        )  # ~8 deg, 0.13 translation
        _, states = align_pyramid(T0, (data, data_c), cam, cfg)
        T_fin = states[-1].T
        dR, dt = (T_fin @ T_gt.inv()).magnitude()
        assert float(dR) < 0.3
        assert float(dt) < 5e-3

    def test_early_stop_triggers(self, rng):
        cam, data, T_gt = make_problem(rng)
        cfg = AlignConfig(num_iters=150)
        T0 = T_gt.retract(jnp.asarray([0.005, 0.0, 0.0, 0.005, 0.0, 0.0]))
        st = align_level(T0, data, cam, cfg)
        assert bool(st.converged)
        assert int(st.num_iters) < 150

    def test_noise_robustness(self, rng):
        cam, data, T_gt = make_problem(rng, noise=0.02)
        cfg = AlignConfig(num_iters=100)
        T0 = T_gt.retract(jnp.asarray([0.02, -0.02, 0.01, 0.03, 0.0, -0.02]))
        st = align_level(T0, data, cam, cfg)
        dR, dt = (st.T @ T_gt.inv()).magnitude()
        assert float(dR) < 1.0
        assert float(dt) < 0.01

    def test_jit_and_static_shapes(self, rng):
        """align_level compiles once and runs under jit."""
        cam, data, T_gt = make_problem(rng, n_pts=128)
        cfg = AlignConfig(num_iters=30)
        jitted = jax.jit(lambda T, d: align_level(T, d, cam, cfg))
        T0 = T_gt.retract(jnp.asarray([0.01, 0.0, 0.0, 0.01, 0.0, 0.0]))
        st1 = jitted(T0, data)
        st2 = jitted(st1.T, data)
        assert np.isfinite(float(st2.cost))

    def test_all_points_masked_out(self, rng):
        """Degenerate input: no valid points -> WORST (infinite) cost so the
        tracker's success gate and the LM accept rule both treat it as a
        failure (a zero cost here once let divergent steps that pushed every
        point out of view masquerade as perfect convergence), and the pose
        must come back unchanged and finite."""
        cam, data, T_gt = make_problem(rng, n_pts=32)
        data = data.replace(mask=jnp.zeros(32, bool))
        cfg = AlignConfig(num_iters=10)
        st = align_level(T_gt, data, cam, cfg)
        assert int(st.num_valid) == 0
        assert float(st.cost) == np.inf
        assert np.all(np.isfinite(np.asarray(st.T.t)))
