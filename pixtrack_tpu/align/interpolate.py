"""Bilinear feature interpolation with analytic spatial gradients.

The reference reaches this through pixloc's ``opt.interpolator(feats, p2d)``
returning (values, valid, gradients) (call site
pixtrack/localization/pixloc_pose_refiners.py:351). Implemented here as a
single gather-based jittable function; the Pallas fused variant lives in
pixtrack_tpu.align.pallas_kernels.

Coordinate convention: index-centered (x = column, y = row; (0, 0) is the
center of the top-left texel) — exactly what ``Camera.project`` emits after
per-level scaling.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def interpolate_features(
    fmap: jax.Array, pts: jax.Array, compute_grad: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample ``fmap`` (H, W, C) at ``pts`` (N, 2) xy.

    Returns:
      values (N, C) float32
      grads  (N, C, 2) d value / d (x, y)  (zeros if compute_grad=False)
      valid  (N,) bool — all four neighbors inside the map
    """
    H, W, C = fmap.shape
    x = pts[..., 0]
    y = pts[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    valid = (x0i >= 0) & (x0i + 1 <= W - 1) & (y0i >= 0) & (y0i + 1 <= H - 1)

    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)

    flat = fmap.reshape(H * W, C)
    base = y0c * W + x0c
    f00 = jnp.take(flat, base, axis=0)
    f01 = jnp.take(flat, base + 1, axis=0)
    f10 = jnp.take(flat, base + W, axis=0)
    f11 = jnp.take(flat, base + W + 1, axis=0)

    wx0 = (1.0 - fx)[..., None]
    wx1 = fx[..., None]
    wy0 = (1.0 - fy)[..., None]
    wy1 = fy[..., None]

    top = f00 * wx0 + f01 * wx1
    bot = f10 * wx0 + f11 * wx1
    values = top * wy0 + bot * wy1

    if compute_grad:
        # d/dx: lerp in y of the x-differences; d/dy: lerp in x of y-differences
        gx = (f01 - f00) * wy0 + (f11 - f10) * wy1
        gy = (f10 - f00) * wx0 + (f11 - f01) * wx1
        grads = jnp.stack([gx, gy], axis=-1)
    else:
        grads = jnp.zeros((*values.shape, 2), values.dtype)

    return values, grads, valid


def interpolate_scalar(fmap: jax.Array, pts: jax.Array):
    """Sample a scalar map (H, W) at pts (N, 2); returns (values, valid)."""
    v, _, valid = interpolate_features(fmap[..., None], pts, compute_grad=False)
    return v[..., 0], valid


def pack_fmap(fmap: jax.Array) -> jax.Array:
    """(H, W, C) -> corner-packed (H, W, 4C): channel blocks are the four
    bilinear corners [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] (edge rows and
    columns duplicate — out-of-map corners are masked by `valid` anyway).

    Why: XLA's TPU gather runs a serial per-ROW loop (~160 M rows/s) that is
    insensitive to row width, so bilinear sampling should fetch ONE wide row
    per point instead of four narrow ones — 4x fewer gathers in the LM hot
    loop (the same trick as nerf/baked.py's cell-packed tables). Pack once
    per level per frame (cheap shifted concats), sample many times."""
    f00 = fmap
    f01 = jnp.concatenate([fmap[:, 1:], fmap[:, -1:]], axis=1)
    f10 = jnp.concatenate([fmap[1:], fmap[-1:]], axis=0)
    f11 = jnp.concatenate([f10[:, 1:], f10[:, -1:]], axis=1)
    return jnp.concatenate([f00, f01, f10, f11], axis=-1)


def interpolate_packed(
    packed: jax.Array, pts: jax.Array, compute_grad: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bilinear sampling from a pack_fmap result: ONE gather per point.

    Same returns as :func:`interpolate_features`."""
    H, W, C4 = packed.shape
    C = C4 // 4
    x = pts[..., 0]
    y = pts[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    valid = (x0i >= 0) & (x0i + 1 <= W - 1) & (y0i >= 0) & (y0i + 1 <= H - 1)
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)

    rows = jnp.take(packed.reshape(H * W, C4), y0c * W + x0c, axis=0)  # (N, 4C)
    f00 = rows[..., 0 * C : 1 * C]
    f01 = rows[..., 1 * C : 2 * C]
    f10 = rows[..., 2 * C : 3 * C]
    f11 = rows[..., 3 * C : 4 * C]

    wx0 = (1.0 - fx)[..., None]
    wx1 = fx[..., None]
    wy0 = (1.0 - fy)[..., None]
    wy1 = fy[..., None]
    values = (f00 * wx0 + f01 * wx1) * wy0 + (f10 * wx0 + f11 * wx1) * wy1
    if compute_grad:
        gx = (f01 - f00) * wy0 + (f11 - f10) * wy1
        gy = (f10 - f00) * wx0 + (f11 - f01) * wx1
        grads = jnp.stack([gx, gy], axis=-1)
    else:
        grads = jnp.zeros((*values.shape, 2), values.dtype)
    return values, grads, valid
