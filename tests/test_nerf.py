"""Tests for the NeRF subsystem: encoding, rendering, training, snapshots,
and the Testbed facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixtrack_tpu.nerf.dataset import NerfDataset, make_synthetic_dataset, sphere_scene
from pixtrack_tpu.nerf.field import (
    NGPField,
    init_field,
    sh_encoding_deg4,
    trunc_exp,
)
from pixtrack_tpu.nerf.render import (
    RenderConfig,
    ray_aabb_intersect,
    rays_from_camera,
    render_image,
    render_rays,
)
from pixtrack_tpu.nerf.snapshot import load_snapshot, save_snapshot
from pixtrack_tpu.nerf.testbed import RenderMode, Testbed, initialize_testbed

TINY = dict(n_levels=4, log2_table_size=12, base_res=4, max_res=32, hidden=16)


class TestField:
    def test_shapes(self):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 3)), jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
        sigma, rgb = field.apply(params, x, d)
        assert sigma.shape == (32,)
        assert rgb.shape == (32, 3)
        assert float(sigma.min()) >= 0
        assert 0 <= float(rgb.min()) and float(rgb.max()) <= 1

    def test_sh_constant_and_norm(self):
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        sh = sh_encoding_deg4(d)
        assert sh.shape == (2, 16)
        np.testing.assert_allclose(np.asarray(sh[:, 0]), 0.28209479, atol=1e-6)

    def test_trunc_exp_grad_finite(self):
        g = jax.grad(lambda x: trunc_exp(x))(jnp.asarray(100.0))
        assert np.isfinite(float(g))
        assert float(g) == pytest.approx(np.exp(15.0))

    def test_encoding_continuity(self):
        """Hash features must be continuous across voxel boundaries."""
        field, params = init_field(jax.random.PRNGKey(0), **TINY)

        def density(x):
            return field.apply(params, x, method=NGPField.density)[0]

        eps = 1e-5
        x0 = jnp.asarray([[0.24999, 0.5, 0.5]])
        x1 = jnp.asarray([[0.25001, 0.5, 0.5]])
        d0, d1 = float(density(x0)[0]), float(density(x1)[0])
        assert abs(d0 - d1) < 1e-2


class TestRender:
    def test_aabb_intersect(self):
        o = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        amin = jnp.zeros(3)
        amax = jnp.ones(3)
        tn, tf, hit = ray_aabb_intersect(o, d, amin, amax)
        assert bool(hit[0]) and not bool(hit[1])
        assert float(tn[0]) == pytest.approx(1.0)
        assert float(tf[0]) == pytest.approx(2.0)

    def test_rays_from_camera_center(self):
        c2w = jnp.eye(4)
        o, d = rays_from_camera(c2w, 50.0, 50.0, 31.5, 31.5, 64, 64)
        # central ray points along -z (OpenGL)
        center = d.reshape(64, 64, 3)[31, 31]
        assert float(center[2]) < -0.99

    def test_render_rays_empty_field(self):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        o = jnp.asarray([[0.0, 0.0, 2.0]] * 4)
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
        aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        cfg = RenderConfig(n_coarse=32, n_fine=0, perturb=False)
        out = render_rays(field, params, o, d, aabb, cfg)
        assert out["rgb"].shape == (4, 3)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))
        # untrained field starts hazy (sigma ~ exp(0) = 1), alpha in (0, 1]
        assert 0.0 < float(out["alpha"].max()) <= 1.0

    def test_render_image_shapes_and_background(self):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        c2w = np.eye(4)
        c2w[:3, 3] = [12.0, 12.0, 3.0]  # rays miss the unit cube entirely
        cfg = RenderConfig(n_coarse=16, n_fine=0, perturb=False, chunk=512)
        out = render_image(
            field, params, c2w, 30.0, 30.0, 15.5, 15.5, 32, 24,
            aabb=[[0, 0, 0], [1, 1, 1]], cfg=cfg, background=(1.0, 0.0, 0.0),
        )
        assert out["rgba"].shape == (24, 32, 4)
        assert out["depth"].shape == (24, 32)
        # all rays miss -> pure background (red), alpha 0, depth 0
        rgba = np.asarray(out["rgba"])
        np.testing.assert_allclose(rgba[..., 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(rgba[..., 1], 0.0, atol=1e-5)
        np.testing.assert_allclose(rgba[..., 3], 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["depth"]), 0.0, atol=1e-5)


class TestTrainOverfit:
    def test_overfit_sphere(self):
        """Tiny training run must reduce loss and reproduce the scene shape."""
        ds = make_synthetic_dataset(sphere_scene, n_views=8, res=32)
        from pixtrack_tpu.nerf.train import TrainConfig, psnr, train

        field, params, info = train(
            ds,
            aabb=[[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]],
            cfg=TrainConfig(
                n_steps=150, batch_rays=1024, n_coarse=32, n_fine=0,
                lr=5e-3, log_every=50,
            ),
            field=NGPField(**TINY),
            params=init_field(jax.random.PRNGKey(1), **TINY)[1],
        )
        hist = info["history"]
        # history starts after the first scan chunk (step 50), so compare the
        # final loss against an absolute bound for this scene (untrained
        # field sits at ~0.05+) plus monotone-ish improvement
        assert hist[-1][1] < 0.02, f"loss did not drop: {hist}"
        assert hist[-1][1] <= hist[0][1], f"loss rose: {hist}"

    def test_trained_depth_hits_sphere(self):
        """After a short fit, depth at image center must be ~ distance to the
        sphere surface (validates depth semantics in NeRF units)."""
        ds = make_synthetic_dataset(sphere_scene, n_views=8, res=32)
        from pixtrack_tpu.nerf.train import TrainConfig, train

        field, params, _ = train(
            ds, aabb=[[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]],
            cfg=TrainConfig(n_steps=300, batch_rays=1024, n_coarse=32, n_fine=0,
                            lr=5e-3, log_every=100),
            field=NGPField(**TINY),
            params=init_field(jax.random.PRNGKey(1), **TINY)[1],
        )
        cfg = RenderConfig(n_coarse=48, n_fine=0, perturb=False, chunk=1024)
        out = render_image(
            field, params, ds.c2w[0], ds.fx, ds.fy, ds.cx, ds.cy,
            ds.width, ds.height, aabb=[[0.2] * 3, [0.8] * 3], cfg=cfg,
        )
        depth = np.asarray(out["depth"])
        center_depth = depth[ds.height // 2, ds.width // 2]
        # camera at radius 3.2 (NeRF units); sphere surface radius 0.12 in grid
        # units = 0.36 NeRF units -> expected depth ~ 3.2 - 0.36 = 2.84
        assert 2.2 < center_depth < 3.2, f"depth {center_depth}"


class TestSnapshot:
    @pytest.mark.parametrize("ext", [".npz", ".msgpack"])
    def test_roundtrip(self, tmp_path, ext):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        p = tmp_path / f"weights{ext}"
        save_snapshot(p, field, params, extra={"aabb": [[0.1] * 3, [0.9] * 3]})
        field2, params2, extra = load_snapshot(p)
        assert field2.n_levels == field.n_levels
        assert extra["aabb"][0] == [0.1] * 3
        l1 = jax.tree.leaves(params)
        l2 = jax.tree.leaves(params2)
        assert len(l1) == len(l2)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # loaded params must produce identical outputs
        x = jnp.full((5, 3), 0.3)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (5, 1))
        s1, c1 = field.apply(params, x, d)
        s2, c2 = field2.apply(params2, x, d)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


class TestTestbed:
    def test_facade_surface(self, tmp_path):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        snap = tmp_path / "weights.msgpack"
        save_snapshot(snap, field, params)
        tb = initialize_testbed(snap, aabb=[[0.2] * 3, [0.8] * 3])
        assert tb.shall_train is False
        assert tb.nerf.rendering_min_transmittance == 1e-7
        assert tb.render_aabb.min == [0.2] * 3
        tb.n_coarse, tb.n_fine = 16, 0
        tb.fov = 45.0
        cam = np.eye(4)
        cam[2, 3] = 3.0
        tb.set_nerf_camera_matrix(cam[:3, :])
        img = tb.render(32, 24, spp=1, linear=True)
        assert img.shape == (24, 32, 4)
        assert img.dtype == np.float32
        tb.render_mode = RenderMode.Depth
        dimg = tb.render(32, 24, spp=1)
        assert dimg.shape == (24, 32, 4)
        # depth channels identical
        np.testing.assert_allclose(dimg[..., 0], dimg[..., 1])

    def test_spp_averaging(self, tmp_path):
        field, params = init_field(jax.random.PRNGKey(0), **TINY)
        snap = tmp_path / "w.npz"
        save_snapshot(snap, field, params)
        tb = initialize_testbed(snap)
        tb.n_coarse, tb.n_fine = 8, 0
        cam = np.eye(4)
        cam[2, 3] = 3.0
        tb.set_nerf_camera_matrix(cam[:3, :])
        img = tb.render(16, 16, spp=4)
        assert np.all(np.isfinite(img))
