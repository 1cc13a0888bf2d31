"""The Pallas fused-MLP kernel must match DistilledField.field_T exactly
(same bf16 matmuls, same encoding order) — verified in interpret mode on the
CPU mesh; the TPU-compiled kernel shares the same jaxpr."""

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.nerf.distill import init_distilled
from pixtrack_tpu.nerf.fused_mlp import fused_distilled_eval


def test_fused_matches_plain():
    f = init_distilled(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    n = 1000  # not a TILE_N multiple: exercises padding
    x = jnp.asarray(rng.uniform(0, 1, (3, n)).astype(np.float32))
    d = rng.normal(size=(3, n)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=0, keepdims=True))
    s0, c0 = f.field_T(x, d)
    s1, c1 = fused_distilled_eval(f, x, d, interpret=True)
    assert s1.shape == (n,) and c1.shape == (3, n)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=5e-3)


def test_march_matches_staged_render():
    """The whole-ray march kernel must reproduce the staged render path
    (stratified midpoint samples + _composite) including miss rays and the
    min-transmittance cutoff."""
    from pixtrack_tpu.nerf.fused_mlp import fused_march_render
    from pixtrack_tpu.nerf.render import (
        RenderConfig,
        _to_grid,
        ray_aabb_intersect,
        render_rays,
    )

    f = init_distilled(jax.random.PRNGKey(3))
    aabb = jnp.asarray([[0.25] * 3, [0.75] * 3])
    rng = np.random.default_rng(1)
    R = 96
    o = rng.normal(size=(R, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.6
    d = -o + 0.3 * rng.normal(size=(R, 3)).astype(np.float32)
    d[-8:] = -d[-8:]  # guaranteed miss rays (point away from the object)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    cfg = RenderConfig(n_coarse=6, n_fine=0, perturb=False, fused=False)
    ref = render_rays(f, None, o_j, d_j, aabb, cfg)

    o_g, d_g = _to_grid(o_j, d_j)
    t_near, t_far, hit = ray_aabb_intersect(o_g, d_g, aabb[0], aabb[1])
    t_far = jnp.maximum(t_far, t_near + 1e-4)
    out = fused_march_render(
        f, o_g, d_g, t_near, jnp.where(hit, t_far, t_near),
        6, cfg.min_transmittance, interpret=True,
    )
    assert int(np.asarray(hit).sum()) < R  # the miss rays actually miss
    for k in ("rgb", "alpha", "depth"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), atol=5e-3,
            err_msg=k,
        )


def test_occupied_bounds_tightening_preserves_render():
    """tighten_render_bounds must shrink the crop box to the occupied set
    without changing the rendered image (the dropped interval is below the
    density threshold by construction)."""
    from pathlib import Path

    from pixtrack_tpu.nerf.distill import load_distilled
    from pixtrack_tpu.nerf.testbed import Testbed

    field = load_distilled(
        Path(__file__).resolve().parents[1] / "assets" / "bench_field.npz"
    )
    tb = Testbed()
    tb.set_baked_field(field)
    # NOTE: the sweep must stay within the field's trained box — a distilled
    # MLP extrapolates arbitrary density outside its domain (measured: the
    # bench field reports sigma > 0.01 across all of [0.05, 0.95]^3), so the
    # caller's render_aabb is the trust region, not a loose hint.
    tb.render_aabb.min = [0.3] * 3
    tb.render_aabb.max = [0.7] * 3
    tb.n_coarse, tb.n_fine = 32, 0
    tb.fov = 45.0

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, 1.8]
    tb.set_nerf_camera_matrix(c2w[:3])

    # ground truth: dense sampling through the untightened box
    tb.n_coarse = 256
    gt = np.asarray(tb.render(48, 48, spp=1, linear=True))
    assert gt[..., 3].max() > 0.2  # the object is actually in view

    tb.n_coarse = 32
    before = np.asarray(tb.render(48, 48, spp=1, linear=True))

    tb.tighten_render_bounds()
    assert tb._sphere is not None
    assert float(tb._sphere[3]) < 0.2 * np.sqrt(3)  # ball < box half-diag
    after = np.asarray(tb.render(48, 48, spp=1, linear=True))

    # per-ray intervals shrink to the occupied ball; image-level fidelity vs
    # dense ground truth must be preserved (per-pixel sample phase shifts on
    # the field's thin shells, so bit-equality is not the invariant)
    err_before = np.abs(before - gt).mean()
    err_after = np.abs(after - gt).mean()
    assert err_before < 0.01 and err_after < 0.01, (err_before, err_after)
