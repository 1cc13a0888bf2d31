"""Multi-chip sharding: mesh construction and sharded NeRF training.

The reference has no distributed stack at all (single CUDA GPU; SURVEY.md
§2.2/§5.8) — scale-out here is a new capability, designed the JAX way:
annotate shardings on a ``jax.sharding.Mesh`` and let XLA insert the
collectives over ICI.

Layouts:
- **dp** (data parallel): ray batches shard over dp; gradients all-reduce
  (psum inserted by XLA from the sharding constraint on the loss).
- **tp** (tensor parallel): the hash table shards over its LEVEL axis —
  levels are independent gathers, so each device gathers only its levels and
  the per-sample features concat via an all-gather that is tiny compared to
  the table itself (the table is ~67 MB at L16/T2^19/F2 f32; activations per
  level are KBs). MLP params are replicated (they are KBs).

The same mesh helpers back the tracker's embarrassingly-parallel axes
(frames / objects / hyperparameter sweeps shard over dp via vmap+sharding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixtrack_tpu.nerf.field import NGPField
from pixtrack_tpu.nerf.render import RenderConfig, render_rays


def make_mesh(
    n_devices: Optional[int] = None, tp: int = 1, axis_names=("dp", "tp")
) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise RuntimeError(
            f"requested {n_devices} devices but only {len(devices)} present; "
            "run under XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "JAX_PLATFORMS=cpu for virtual-device testing"
        )
    assert n_devices % tp == 0
    dev_array = np.asarray(devices[:n_devices]).reshape(n_devices // tp, tp)
    return Mesh(dev_array, axis_names)


def shard_field_params(params, mesh: Mesh, field: NGPField):
    """Place field params: each per-level hash table sharded over tp on its
    entry axis (levels are separate params for VMEM-staged gathers — see
    HashEncoding), everything else replicated."""

    tp = mesh.shape["tp"]

    def place(path, leaf):
        keys = jax.tree_util.keystr(path)
        if "table" in keys and leaf.ndim == 2 and leaf.shape[-1] % tp == 0:
            spec = P(None, "tp")  # (F, T) sharded over table entries
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def sharded_nerf_train_step(
    field: NGPField,
    mesh: Mesh,
    aabb,
    optimizer=None,
    n_coarse: int = 32,
    n_fine: int = 0,
):
    """Build a jitted, mesh-sharded NeRF training step.

    Rays shard over dp; the table over tp (via the params' own shardings);
    XLA inserts the psum for the gradient all-reduce and the all-gathers for
    the level-parallel feature concat.

    Returns (step_fn, optimizer): step_fn(params, opt_state, origins, dirs,
    target, key) -> (params, opt_state, loss).
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    rcfg = RenderConfig(n_coarse=n_coarse, n_fine=n_fine, perturb=True,
                        min_transmittance=1e-4)
    aabb = jnp.asarray(aabb, jnp.float32)
    ray_sharding = NamedSharding(mesh, P("dp", None))

    def loss_fn(params, origins, dirs, target, key):
        out = render_rays(field, params, origins, dirs, aabb, rcfg, key)
        pred = out["rgb"] + (1.0 - out["alpha"][:, None])
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step_fn(params, opt_state, origins, dirs, target, key):
        origins = jax.lax.with_sharding_constraint(origins, ray_sharding)
        dirs = jax.lax.with_sharding_constraint(dirs, ray_sharding)
        target = jax.lax.with_sharding_constraint(target, ray_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, origins, dirs, target, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, optimizer


def sharded_batch_align(mesh: Mesh):
    """Batched pose alignment sharded over dp — the tracker's scale-out axis
    (many videos / objects in parallel, one pose-refine each).

    Returns a jitted fn(T_batched, levels_batched, camera) -> AlignState
    where every array in the inputs has a leading batch axis sharded on dp.
    """
    from pixtrack_tpu.align.lm import AlignConfig, align_level

    cfg = AlignConfig(num_iters=8)

    def one(T, level, camera):
        return align_level(T, level, camera, cfg)

    batched = jax.vmap(one, in_axes=(0, 0, 0))

    @jax.jit
    def run(T_b, levels_b, cam_b):
        spec = NamedSharding(mesh, P("dp"))
        T_b = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            ),
            T_b,
        )
        return batched(T_b, levels_b, cam_b)

    return run
