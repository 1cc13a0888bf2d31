"""Distilled MXU-only field: fit quality against the analytic teacher and
drop-in rendering through render_image / Testbed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixtrack_tpu.nerf.distill import (
    DistillConfig,
    DistilledField,
    distill,
    init_distilled,
)
from pixtrack_tpu.nerf.render import RenderConfig, render_image

from synthetic_world import _AnalyticFieldT, make_testbed


AABB = np.array([[0.3, 0.3, 0.3], [0.7, 0.7, 0.7]], np.float32)


@pytest.fixture(scope="module")
def student():
    from pixtrack_tpu.nerf.baked import occupancy_grid

    teacher = _AnalyticFieldT()
    occ = occupancy_grid(teacher, None, res=32, sigma_threshold=0.5)
    cfg = DistillConfig(
        steps=1500, batch=1 << 12, dataset_size=1 << 18,
        octaves=10, width=96, depth=3, surface_frac=0.8,
    )
    return distill(teacher, None, jax.random.PRNGKey(0), AABB, occ=occ,
                   config=cfg)


class TestDistill:
    def test_density_field_matches_teacher(self, student):
        """Agreement away from the blob boundary — the teacher is a hard
        density STEP (the worst case for a smooth MLP); renders integrate
        over the boundary so the PSNR test below is the functional gate."""
        from synthetic_world import _BLOB_CENTERS_GRID, _BLOB_RADII_GRID

        teacher = _AnalyticFieldT()
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            (0.38 + 0.24 * rng.uniform(size=(3, 4096))).astype(np.float32)
        )
        dist = np.linalg.norm(
            np.asarray(x).T[:, None, :] - _BLOB_CENTERS_GRID[None], axis=-1
        ) - _BLOB_RADII_GRID[None]
        interior = np.abs(dist).min(axis=1) > 0.03  # off-boundary points
        d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 4096))
        s_t, _ = teacher.apply(None, x, d)
        s_s, _ = student.field_T(x, d)
        lt, ls = np.log1p(np.asarray(s_t)), np.log1p(np.asarray(s_s))
        err = np.mean((lt[interior] - ls[interior]) ** 2)
        assert err < 0.2, err

    def test_rendered_image_psnr(self, student):
        teacher = _AnalyticFieldT()
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 1.2  # NeRF-space; grid z maps through _NGP_PERM
        cfg = RenderConfig(n_coarse=48, n_fine=0, perturb=False, chunk=4096)
        kw = dict(fx=70.0, fy=70.0, cx=31.5, cy=31.5, width=64, height=64,
                  aabb=AABB, cfg=cfg)
        out_t = render_image(teacher, None, c2w, **kw)
        out_s = render_image(student, None, c2w, **kw)
        a = np.asarray(out_t["rgba"][..., :3])
        b = np.asarray(out_s["rgba"][..., :3])
        mse = np.mean((a - b) ** 2)
        psnr = -10 * np.log10(mse + 1e-12)
        # The analytic blob is a HARD density step — the worst case for a
        # smooth MLP student. This is a regression canary; trained NGP
        # teachers are smooth and distill far better (validated on TPU).
        assert psnr > 20.0, psnr

    def test_pytree_and_jit(self):
        st = init_distilled(jax.random.PRNGKey(1), octaves=4, width=32, depth=2)
        leaves, treedef = jax.tree_util.tree_flatten(st)
        st2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(st2, DistilledField)

        @jax.jit
        def f(s, x, d):
            sig, rgb = s.field_T(x, d)
            return sig.sum() + rgb.sum()

        x = jnp.full((3, 64), 0.5)
        d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [1.0]]), (3, 64))
        assert np.isfinite(float(f(st, x, d)))
