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
