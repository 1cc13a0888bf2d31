"""Baked cell-packed field: the TPU speed-of-light inference path.

Why this exists (measured on v5e, host-synced timing): XLA lowers gathers
from HBM-resident tables to a serial per-element loop at ~150-200 M
gathers/s, *independent* of table size, index order, and (nearly) sublane
width. The training-time ``NGPField`` spends 16 levels x 8 corners = 128
gathers per sample -> ~1.2 M samples/s, hopeless for per-frame rendering.
The wall is per-gather, so the fix is to move data into the sublane
dimension: pack all 8 trilinear corner vectors of a CELL into one table
column. One gather per level then fetches everything trilinear needs —
measured 135 M samples/s per level including the lerp (~100x the vertex
layout), and the MLP rides the MXU at 350+ M samples/s.

Pipeline: train the standard vertex hash grid (``nerf/train.py``), then
:func:`bake` once (seconds) to produce a :class:`BakedField` whose
``field_T`` is a drop-in for ``NGPField.field_T`` (same MLP weights, same
outputs up to cell-hash collisions on hashed levels; exact on dense levels).
``Testbed.load_snapshot`` bakes automatically so every tracker/viz render
uses this path.

Reference role: instant-ngp's inference-time renderer (the reference's
per-frame ``testbed.render`` hot path, pixtrack/pose_trackers/
pixloc_tracker_r9.py:145-152,207-214). The CUDA design has no bake step
because per-thread random access is cheap on GPUs; on TPU the bake trades
8x table memory for ~100x gather throughput.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.nerf.field import (
    NGPField,
    _CORNERS,
    _PRIMES,
    _level_resolutions,
    sh_encoding_deg4_T,
    trunc_exp,
)


def _cell_hash(xi: jnp.ndarray, yi, zi, T: int, dense: bool, res: int):
    """Index of CELL (xi, yi, zi) in a level table of T columns.

    Dense levels use row-major indexing over res^3 cells (exact); hashed
    levels use the same spatial hash as the vertex tables.
    """
    if dense:
        return (xi + res * (yi + res * zi)).astype(jnp.int32)
    h = (
        xi.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ yi.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ zi.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(T - 1)
    return h.astype(jnp.int32)


@dataclasses.dataclass
class BakedField:
    """Cell-packed tables + the trained MLP weights (a pytree-of-arrays
    container; everything jit-traceable)."""

    tables: List[jax.Array]        # per level (8*F, T_cells)
    resolutions: np.ndarray        # per level cell-grid resolution
    dense: List[bool]              # per level: exact dense indexing?
    f_per_level: int
    mlp_params: dict               # the NGPField Dense submodule params
    hidden: int = 64
    geo_features: int = 15

    # -- encoding ------------------------------------------------------------
    def encode_T(self, xT: jax.Array) -> jax.Array:
        """(3, N) in [0,1] -> (L*F, N): one gather per level."""
        F = self.f_per_level
        outs = []
        for lvl, table in enumerate(self.tables):
            res = int(self.resolutions[lvl])
            T = table.shape[1]
            xs = xT * res
            x0 = jnp.floor(jnp.clip(xs, 0.0, res - 1e-4))
            frac = xs - x0
            xi = x0.astype(jnp.int32)
            idx = _cell_hash(xi[0], xi[1], xi[2], T, self.dense[lvl], res)
            vals = jnp.take(table, idx, axis=1)  # (8F, N)
            v = vals.reshape(2, 2, 2, F, -1)
            wx = jnp.stack([1.0 - frac[0], frac[0]])
            wy = jnp.stack([1.0 - frac[1], frac[1]])
            wz = jnp.stack([1.0 - frac[2], frac[2]])
            w = (
                wx[:, None, None, None, :]
                * wy[None, :, None, None, :]
                * wz[None, None, :, None, :]
            )  # (2, 2, 2, 1, N)
            outs.append((v * w).sum(axis=(0, 1, 2)))  # (F, N)
        return jnp.concatenate(outs, axis=0)

    # -- MLP heads (same weights/shapes as NGPField) ---------------------------
    def _dense(self, name: str, x: jax.Array) -> jax.Array:
        p = self.mlp_params[name]
        return (
            jax.lax.dot_general(
                p["kernel"], x,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p["bias"]
        )

    def density_T(self, xT: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = self.encode_T(xT)
        h = jax.nn.relu(self._dense("density_l1", h))
        h = self._dense("density_l2", h)
        return trunc_exp(h[0]), h[1:]

    def color_T(self, geoT: jax.Array, dT: jax.Array) -> jax.Array:
        h = jnp.concatenate([geoT, sh_encoding_deg4_T(dT)], axis=0)
        h = jax.nn.relu(self._dense("color_l1", h))
        h = jax.nn.relu(self._dense("color_l2", h))
        return jax.nn.sigmoid(self._dense("color_l3", h))

    def field_T(self, xT: jax.Array, dT: jax.Array):
        sigma, geo = self.density_T(xT)
        return sigma, self.color_T(geo, dT)

    # Duck-type the Flax call sites (render_rays calls
    # field.apply(params, x, d, method=NGPField.field_T); params unused here).
    def apply(self, params, xT, dT=None, method=None):
        if method is NGPField.density_T or (
            getattr(method, "__name__", "") == "density_T"
        ):
            return self.density_T(xT)
        return self.field_T(xT, dT)


# Registered as a pytree so BakedField can cross jit boundaries as a leaf
# container (tables/params traced, metadata static).
jax.tree_util.register_pytree_node(
    BakedField,
    lambda f: (
        (f.tables, f.mlp_params),
        (tuple(f.resolutions.tolist()), tuple(f.dense), f.f_per_level,
         f.hidden, f.geo_features),
    ),
    lambda aux, children: BakedField(
        tables=list(children[0]),
        mlp_params=children[1],
        resolutions=np.asarray(aux[0]),
        dense=list(aux[1]),
        f_per_level=aux[2],
        hidden=aux[3],
        geo_features=aux[4],
    ),
)


def _pack_corners(vtab: jnp.ndarray, cx, cy, cz, res: int, Tv: int) -> jnp.ndarray:
    """Fetch the 8 corner vertex vectors of cells (cx, cy, cz) from the
    vertex table, indexing exactly as HashEncoding.__call__ does.
    Returns (8*F, n_cells), corner-major."""
    vertex_dense = (res + 1) ** 3 <= Tv
    rows = []
    for (ci, cj, ck) in _CORNERS:
        vx, vy, vz = cx + ci, cy + cj, cz + ck
        if vertex_dense:
            vidx = (vx + (res + 1) * (vy + (res + 1) * vz)).astype(jnp.int32)
        else:
            vidx = (
                (
                    vx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                    ^ vy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
                    ^ vz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
                )
                & jnp.uint32(Tv - 1)
            ).astype(jnp.int32)
        rows.append(jnp.take(vtab, vidx, axis=1))
    return jnp.concatenate(rows, axis=0)


def occupancy_grid(field: NGPField, params, res: int = 128,
                   sigma_threshold: float = 0.01, dilate: int = 1,
                   chunk: int = 1 << 19) -> np.ndarray:
    """(res, res, res) bool: density above threshold at cell centers, dilated.
    The bake-time analog of instant-ngp's occupancy grid."""
    centers = (np.arange(res, dtype=np.float32) + 0.5) / res
    zz, yy, xx = np.meshgrid(centers, centers, centers, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=0)  # (3, res^3)
    sig = np.empty(pts.shape[1], np.float32)
    for s in range(0, pts.shape[1], chunk):
        blk = jnp.asarray(pts[:, s : s + chunk])
        sigma, _ = field.apply(params, blk, method=NGPField.density_T)
        sig[s : s + chunk] = np.asarray(sigma)
    occ = (sig.reshape(res, res, res) > sigma_threshold)
    occ = occ.transpose(2, 1, 0)  # index as occ[x, y, z]
    for _ in range(dilate):
        g = occ.copy()
        g[1:] |= occ[:-1]; g[:-1] |= occ[1:]
        g[:, 1:] |= occ[:, :-1]; g[:, :-1] |= occ[:, 1:]
        g[:, :, 1:] |= occ[:, :, :-1]; g[:, :, :-1] |= occ[:, :, 1:]
        occ = g
    return occ


def main_component(occ: np.ndarray, dilate: int = 2) -> np.ndarray:
    """Largest connected component of an occupancy grid, re-dilated.

    Short-trained hash fields grow floaters: disconnected density blobs
    away from the object that (a) eat distillation capacity, (b) haze the
    rendered tracking templates (measured on the mesh benchmark world: the
    floater halo plus the capacity loss cost the distilled student ~4 dB in
    the object region and broke the tracker's cold start). The object is by
    construction the largest occupied component — keep it, drop the rest.
    Uses 26-connectivity so the 1-cell-dilated grid from occupancy_grid
    does not split diagonal contacts."""
    from scipy import ndimage

    labels, n = ndimage.label(occ, structure=np.ones((3, 3, 3), bool))
    if n <= 1:
        keep = occ.copy()
    else:
        sizes = ndimage.sum_labels(occ, labels, index=np.arange(1, n + 1))
        keep = labels == (1 + int(np.argmax(sizes)))
    for _ in range(dilate):
        g = keep.copy()
        g[1:] |= keep[:-1]; g[:-1] |= keep[1:]
        g[:, 1:] |= keep[:, :-1]; g[:, :-1] |= keep[:, 1:]
        g[:, :, 1:] |= keep[:, :, :-1]; g[:, :, :-1] |= keep[:, :, 1:]
        keep = g
    return keep


def bake(
    field: NGPField,
    params,
    max_cell_table_log2: int = 19,
    occ_res: int = 128,
    sigma_threshold: float = 0.01,
    max_cells_per_chunk: int = 1 << 23,
) -> BakedField:
    """Pack the trained vertex hash grid into per-CELL corner tables.

    Levels whose res^3 fits in ``2^max_cell_table_log2`` get an exact DENSE
    cell table (row-major cell ids). Finer levels get a HASHED table of
    2^max_cell_table_log2 slots filled only for cells near the trained
    surface (density-based occupancy enumeration — enumerating all res^3
    cells at res 2048 would be 8.6e9). Hash collisions between occupied
    cells alias (standard NGP behavior); unoccupied cells read zero features,
    which the coarse (exact) levels dominate anyway.
    """
    enc = params["params"]["encoding"]
    F = field.features_per_level
    Tv = 1 << field.log2_table_size
    resolutions = _level_resolutions(field.n_levels, field.base_res, field.max_res)

    occ = None  # computed lazily, only if a hashed level exists
    tables: List[jax.Array] = []
    dense_flags: List[bool] = []
    for lvl in range(field.n_levels):
        res = int(resolutions[lvl])
        vtab = jnp.asarray(enc[f"table{lvl}"])  # (F, Tv)
        cell_dense = res**3 <= (1 << max_cell_table_log2)

        if cell_dense:
            g = jnp.arange(res)
            zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
            cx, cy, cz = xx.ravel(), yy.ravel(), zz.ravel()
            table = _pack_corners(vtab, cx, cy, cz, res, Tv)  # (8F, res^3)
        else:
            if occ is None:
                occ = occupancy_grid(field, params, occ_res, sigma_threshold)
            Tc = 1 << max_cell_table_log2
            table = jnp.zeros((8 * F, Tc), vtab.dtype)
            # Enumerate fine cells overlapping occupied coarse cells, in
            # chunks. Overlap span handles non-divisible res/occ_res (the +1
            # covers partial overlap at the far edge; duplicate cells across
            # neighboring coarse cells just rewrite the same slot data).
            ox, oy, oz = np.nonzero(occ)
            w = -(-res // occ_res) + 1  # ceil + 1
            sub = np.arange(w)
            sz_, sy_, sx_ = np.meshgrid(sub, sub, sub, indexing="ij")
            sx_, sy_, sz_ = sx_.ravel(), sy_.ravel(), sz_.ravel()
            n_sub = w**3
            per_chunk = max(1, max_cells_per_chunk // n_sub)
            bx0 = (ox.astype(np.int64) * res) // occ_res
            by0 = (oy.astype(np.int64) * res) // occ_res
            bz0 = (oz.astype(np.int64) * res) // occ_res
            for k, s in enumerate(range(0, len(ox), per_chunk)):
                bx = np.minimum(bx0[s : s + per_chunk, None] + sx_[None, :], res - 1).ravel().astype(np.int32)
                by = np.minimum(by0[s : s + per_chunk, None] + sy_[None, :], res - 1).ravel().astype(np.int32)
                bz = np.minimum(bz0[s : s + per_chunk, None] + sz_[None, :], res - 1).ravel().astype(np.int32)
                cx = jnp.asarray(bx); cy = jnp.asarray(by); cz = jnp.asarray(bz)
                packed = _pack_corners(vtab, cx, cy, cz, res, Tv)
                cidx = _cell_hash(cx, cy, cz, Tc, dense=False, res=res)
                table = table.at[:, cidx].set(packed)
                if k % 8 == 7:
                    # drain the dispatch queue with a real host copy:
                    # through the remote-TPU tunnel, async dispatches pin
                    # their host-side staging buffers until consumed, and a
                    # dense occupancy (floaters after a short training run)
                    # queued thousands of 25 MB transfers -> measured 127 GB
                    # RSS and an OOM kill. block_until_ready does NOT sync
                    # through the tunnel; a 1-element device read does.
                    _ = np.asarray(table[0, :1])
        tables.append(table)
        dense_flags.append(cell_dense)

    mlp = {
        name: jax.tree.map(jnp.asarray, params["params"][name])
        for name in ("density_l1", "density_l2", "color_l1", "color_l2", "color_l3")
    }
    return BakedField(
        tables=tables,
        resolutions=resolutions,
        dense=dense_flags,
        f_per_level=F,
        mlp_params=mlp,
        hidden=field.hidden,
        geo_features=field.geo_features,
    )
