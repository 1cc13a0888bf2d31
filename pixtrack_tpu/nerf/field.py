"""Multiresolution hash-grid NeRF field (instant-ngp equivalent) in Flax.

TPU-native replacement for the reference's instant-ngp C++/CUDA runtime
(tiny-cuda-nn fused MLPs + hash encoding; reference surface at
pixtrack/utils/ingp_utils.py:22-44 and train_ingp_nerf.sh). The CUDA design
(per-thread hash probes, fully-fused MLP) does not map to TPU; instead:

- hash lookups are batched XLA gathers over per-level tables — all levels and
  samples processed as dense tensors, corners unrolled statically;
- the MLPs are small matmuls that land on the MXU;
- trilinear interpolation is vectorized lerp.

**Layout: feature-major.** All large intermediates are (C, N) with the big
sample dimension N LAST, so it maps to TPU lanes (128-wide). The naive
points-major (N, 3)/(N, 8, F) layout pads its tiny trailing dims 16-42x on
TPU tiling and OOMs HBM (measured: a 16k-ray train step wanted 51 GB).
Tables are stored (L, F, T) and gathered along the last axis for the same
reason. Public entry points accept standard (N, 3) and transpose once at the
boundary.

Field domain is the unit cube [0, 1]^3 in *grid space* (== instant-ngp's
internal space, where the reference's OBJ_AABB / render_aabb crop boxes are
expressed — see pixtrack_tpu.geometry.nerf_transform).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes (standard open-domain choice from Teschner et al.,
# also used by instant-ngp's public encoding).
_PRIMES = (1, 2654435761, 805459861)


@jax.custom_jvp
def trunc_exp(x):
    """exp with clamped input; gradient clamped the same way (keeps density
    activations from overflowing early in training)."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, y * dx


def sh_encoding_deg4_T(d: jax.Array) -> jax.Array:
    """Real spherical harmonics up to degree 4, feature-major.

    d: (3, N) unit directions -> (16, N). Matches the basis instant-ngp uses
    for view-direction conditioning.
    """
    x, y, z = d[0], d[1], d[2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.28209479177387814 * one,
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ],
        axis=0,
    )


def sh_encoding_deg4(d: jax.Array) -> jax.Array:
    """(N, 3) -> (N, 16) convenience wrapper."""
    return sh_encoding_deg4_T(d.T).T


def _level_resolutions(n_levels, base_res, max_res) -> np.ndarray:
    b = np.exp((np.log(max_res) - np.log(base_res)) / max(n_levels - 1, 1))
    return np.floor(base_res * (b ** np.arange(n_levels))).astype(np.int64)


# The 8 trilinear corners, unrolled statically.
_CORNERS = tuple(
    (i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)
)


class HashEncoding(nn.Module):
    """Multires hash encoding, feature-major: (3, N) in [0,1] -> (L*F, N).

    PERF NOTE (measured host-synced on v5e): XLA lowers these gathers to a
    serial ~150-200M gathers/s loop regardless of table size or index order,
    so this vertex layout (8 corner gathers x L levels per sample) runs at
    ~1.2 M samples/s — fine for offline TRAINING, far too slow for per-frame
    rendering. Inference renders use nerf/baked.py: the trained tables are
    repacked per-CELL with all 8 corners in the sublane dimension (1 gather
    per level, ~135 M samples/s/level), and the Testbed bakes on load.
    """

    n_levels: int = 16
    features_per_level: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 2048

    def setup(self):
        T = 1 << self.log2_table_size
        self.tables = [
            self.param(
                f"table{lvl}",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -1e-4, 1e-4
                ),
                (self.features_per_level, T),
            )
            for lvl in range(self.n_levels)
        ]
        self.resolutions = _level_resolutions(
            self.n_levels, self.base_res, self.max_res
        )

    def __call__(self, xT: jax.Array) -> jax.Array:
        T = 1 << self.log2_table_size
        outs = []
        for lvl in range(self.n_levels):
            res = int(self.resolutions[lvl])
            xs = xT * res  # (3, N)
            x0 = jnp.floor(xs)
            frac = xs - x0  # (3, N)
            x0i = x0.astype(jnp.int32)
            dense = (res + 1) ** 3 <= T
            acc = None
            for (ci, cj, ck) in _CORNERS:
                cx = x0i[0] + ci
                cy = x0i[1] + cj
                cz = x0i[2] + ck
                if dense:
                    idx = cx + (res + 1) * (cy + (res + 1) * cz)
                else:
                    idx = (
                        cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                        ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
                        ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
                    ) & jnp.uint32(T - 1)
                    idx = idx.astype(jnp.int32)
                vals = jnp.take(self.tables[lvl], idx, axis=1)  # (F, N)
                wx = frac[0] if ci else (1.0 - frac[0])
                wy = frac[1] if cj else (1.0 - frac[1])
                wz = frac[2] if ck else (1.0 - frac[2])
                w = wx * wy * wz  # (N,)
                contrib = vals * w[None, :]
                acc = contrib if acc is None else acc + contrib
            outs.append(acc)
        return jnp.concatenate(outs, axis=0)  # (L*F, N)


class TDense(nn.Module):
    """Feature-major dense layer: (C_in, N) -> (C_out, N) via W @ x + b."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        W = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=1, out_axis=0),
            (self.features, x.shape[0]),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features, 1), jnp.float32)
        return (
            jax.lax.dot_general(
                W.astype(self.dtype), x.astype(self.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b
        )


class NGPField(nn.Module):
    """Hash encoding + density MLP + color MLP (instant-ngp base.json shape).

    density(x):      enc(32) -> 64 -> 1 + 15 geo features
    color(geo, dir): (15 + SH16) -> 64 -> 64 -> rgb (sigmoid)
    """

    n_levels: int = 16
    features_per_level: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    hidden: int = 64
    geo_features: int = 15
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoding = HashEncoding(
            self.n_levels,
            self.features_per_level,
            self.log2_table_size,
            self.base_res,
            self.max_res,
        )
        self.density_l1 = TDense(self.hidden, self.dtype)
        self.density_l2 = TDense(1 + self.geo_features, self.dtype)
        self.color_l1 = TDense(self.hidden, self.dtype)
        self.color_l2 = TDense(self.hidden, self.dtype)
        self.color_l3 = TDense(3, self.dtype)

    # -- feature-major core (the hot path) ----------------------------------
    def density_T(self, xT: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """xT (3, N) in [0,1] -> (sigma (N,), geo (G, N))."""
        h = self.encoding(xT)
        h = nn.relu(self.density_l1(h))
        h = self.density_l2(h)
        sigma = trunc_exp(h[0])
        return sigma, h[1:]

    def color_T(self, geoT: jax.Array, dT: jax.Array) -> jax.Array:
        """geoT (G, N), dT (3, N) unit dirs -> rgb (3, N) in [0,1]."""
        h = jnp.concatenate([geoT, sh_encoding_deg4_T(dT)], axis=0)
        h = nn.relu(self.color_l1(h))
        h = nn.relu(self.color_l2(h))
        return nn.sigmoid(self.color_l3(h))

    def field_T(self, xT: jax.Array, dT: jax.Array):
        sigma, geo = self.density_T(xT)
        rgb = self.color_T(geo, dT)
        return sigma, rgb

    # -- points-major public boundary ---------------------------------------
    def density(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (N, 3) -> (sigma (N,), geo (N, G))."""
        sigma, geoT = self.density_T(x.T)
        return sigma, geoT.T

    def __call__(self, x: jax.Array, d: jax.Array):
        """x, d (N, 3) -> (sigma (N,), rgb (N, 3))."""
        sigma, rgbT = self.field_T(x.T, d.T)
        return sigma, rgbT.T


def init_field(rng_key, **kwargs) -> Tuple[NGPField, dict]:
    field = NGPField(**kwargs)
    x = jnp.full((4, 3), 0.5)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    params = field.init(rng_key, x, d)
    return field, params
