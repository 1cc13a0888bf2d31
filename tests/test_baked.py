"""Baked cell-packed field tests: exactness on dense levels, occupancy grid,
render-path drop-in, and pytree round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.nerf.baked import BakedField, bake, occupancy_grid
from pixtrack_tpu.nerf.field import NGPField, init_field
from pixtrack_tpu.nerf.render import RenderConfig, render_image

from synthetic_world import _AnalyticFieldT


@pytest.fixture(scope="module")
def small_field():
    """All levels dense-cell-bakeable (res <= 64 -> res^3 <= 2^19)."""
    field, params = init_field(
        jax.random.PRNGKey(3), n_levels=4, base_res=8, max_res=64,
        log2_table_size=19,
    )
    return field, params


class TestBakeExactness:
    def test_dense_levels_match_vertex_field(self, small_field):
        field, params = small_field
        baked = bake(field, params)
        assert all(baked.dense)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0.02, 0.98, (3, 512)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(3, 512)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
        s_ref, rgb_ref = field.apply(params, x, d, method=NGPField.field_T)
        s_b, rgb_b = baked.field_T(x, d)
        np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_hashed_vertex_tables_still_exact(self):
        """Small vertex tables force vertex hashing; dense CELL bake must
        reproduce the collided vertex field exactly."""
        field, params = init_field(
            jax.random.PRNGKey(4), n_levels=3, base_res=16, max_res=64,
            log2_table_size=10,  # (res+1)^3 > 2^10 -> hashed vertices
        )
        baked = bake(field, params)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0.02, 0.98, (3, 256)).astype(np.float32))
        d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 256))
        s_ref, _ = field.apply(params, x, d, method=NGPField.field_T)
        s_b, _ = baked.field_T(x, d)
        np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-5)


class TestOccupancy:
    def test_occupancy_finds_blob(self):
        occ = occupancy_grid(_AnalyticFieldT(), None, res=32,
                             sigma_threshold=0.5, dilate=1)
        assert occ.shape == (32, 32, 32)
        # blob centered near (0.5, 0.5, 0.5) with radius ~0.1
        assert occ[16, 16, 16]
        assert not occ[2, 2, 2]
        frac = occ.mean()
        assert 0.001 < frac < 0.25, frac


class TestHashedLevelBake:
    def test_occupancy_restricted_bake_runs(self, monkeypatch):
        """Force a hashed cell level (small cell-table cap) and check the
        bake covers occupied space with the right table shapes."""
        field, params = init_field(
            jax.random.PRNGKey(5), n_levels=3, base_res=8, max_res=48,
            log2_table_size=19,
        )
        # make occupancy 'everything' so coverage is total and the baked
        # field must equal the vertex field wherever no cell-hash collision
        import pixtrack_tpu.nerf.baked as baked_mod

        monkeypatch.setattr(
            baked_mod, "occupancy_grid",
            lambda *a, **k: np.ones((32, 32, 32), bool),
        )
        baked = bake(field, params, max_cell_table_log2=17)  # 48^3 < 2^17?
        # 48^3 = 110592 < 131072 -> still dense; force smaller:
        baked = bake(field, params, max_cell_table_log2=16)
        assert baked.dense == [True, True, False]
        assert baked.tables[2].shape == (16, 1 << 16)

    def test_renders_through_render_image(self, small_field):
        field, params = small_field
        baked = bake(field, params)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 1.5
        aabb = np.array([[0.2] * 3, [0.8] * 3], np.float32)
        cfg = RenderConfig(n_coarse=16, n_fine=8, perturb=False, chunk=1024)
        out_v = render_image(field, params, c2w, 40.0, 40.0, 15.5, 15.5,
                             32, 32, aabb, cfg)
        out_b = render_image(baked, None, c2w, 40.0, 40.0, 15.5, 15.5,
                             32, 32, aabb, cfg)
        np.testing.assert_allclose(
            np.asarray(out_b["rgba"]), np.asarray(out_v["rgba"]),
            rtol=1e-3, atol=1e-4,
        )


class TestPytree:
    def test_baked_field_is_a_pytree(self, small_field):
        field, params = small_field
        baked = bake(field, params)
        leaves, treedef = jax.tree_util.tree_flatten(baked)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(rebuilt, BakedField)
        x = jnp.full((3, 8), 0.4)
        d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 8))
        s1, _ = baked.field_T(x, d)
        s2, _ = rebuilt.field_T(x, d)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

    def test_jit_through_baked_field(self, small_field):
        field, params = small_field
        baked = bake(field, params)

        @jax.jit
        def f(b, x, d):
            s, rgb = b.field_T(x, d)
            return s.sum() + rgb.sum()

        x = jnp.full((3, 16), 0.3)
        d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 16))
        v = f(baked, x, d)
        assert np.isfinite(float(v))
