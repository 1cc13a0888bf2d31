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
