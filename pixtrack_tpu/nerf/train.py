"""NeRF training loop: the TPU replacement for instant-ngp's run.py trainer
(reference train_ingp_nerf.sh:14 — 10,000 steps on transforms.json).

Design: all training rays are precomputed into flat device arrays; each step
gathers a random ray batch (static batch size), renders with stratified +
importance sampling, and applies Adam on an L2 photometric loss in one jitted
step. Sharding hooks: batch axis is marked for data-parallel sharding and the
hash table for level-parallel sharding (see pixtrack_tpu.parallel.mesh).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.nerf.field import NGPField, init_field
from pixtrack_tpu.nerf.render import RenderConfig, render_rays


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_steps: int = 10000        # reference budget (train_ingp_nerf.sh:14)
    batch_rays: int = 1 << 13   # 8k rays: keeps the scatter-bound backward
                                # (~1us/sample on v5e) near 0.3s/step
    lr: float = 1e-2
    lr_final: float = 1e-4
    weight_decay: float = 1e-6  # on MLP params, not the hash table
    n_coarse: int = 64
    n_fine: int = 32
    background: str = "white"   # composite training target onto this bg
    log_every: int = 500
    # device-resident ray-pool cap (0 = unlimited). Large captures are
    # subsampled foreground-weighted — see train(); sized so the pool stays
    # ~70 MB through the remote-TPU tunnel.
    ray_pool_cap: int = 2_000_000


def make_loss_fn(field: NGPField, cfg: TrainConfig, aabb):
    """Photometric loss over a ray batch (used by train() and by the
    multi-chip dryrun, which wraps it in its own sharded optimizer step)."""
    rcfg = RenderConfig(
        n_coarse=cfg.n_coarse, n_fine=cfg.n_fine, perturb=True,
        min_transmittance=1e-4,
    )
    aabb = jnp.asarray(aabb, jnp.float32)

    def loss_fn(params, origins, dirs, target, key):
        out = render_rays(field, params, origins, dirs, aabb, rcfg, key)
        bg = 1.0 if cfg.background == "white" else 0.0
        pred = out["rgb"] + (1.0 - out["alpha"][:, None]) * bg
        return jnp.mean((pred - target) ** 2)

    return loss_fn


def train(
    dataset,
    aabb,
    cfg: TrainConfig = TrainConfig(),
    field: Optional[NGPField] = None,
    params: Optional[dict] = None,
    seed: int = 0,
    callback: Optional[Callable] = None,
    mesh=None,
):
    """Train a field on a NerfDataset. Returns (field, params, history).

    ``mesh``: an optional ``jax.sharding.Mesh`` with ('dp', 'tp') axes
    (parallel.mesh.make_mesh). When given, THIS production loop runs
    multi-chip: the ray batch shards over dp (XLA all-reduces the gradient)
    and each hash-table level shards over tp on its entry axis; all other
    params replicate. The step function itself is unchanged — sharding is
    pure annotation, the JAX way."""
    key = jax.random.PRNGKey(seed)
    if field is None:
        field, params = init_field(jax.random.PRNGKey(seed + 1))

    origins, dirs, rgbs = dataset.all_rays()
    # Cap the device-resident ray pool. A 42-view 448px capture is 8.4M
    # rays = ~300 MB x3 arrays — pushing that through the remote-TPU tunnel
    # stalls for tens of minutes (measured) and is pure waste: 10k steps x
    # 16k rays sample 160M draws from the pool, so a few-million-ray pool
    # is statistically equivalent. Subsample FOREGROUND-WEIGHTED (keep all
    # non-background rays first — that is where the object lives).
    if cfg.ray_pool_cap and origins.shape[0] > cfg.ray_pool_cap:
        rng_pool = np.random.default_rng(seed + 2)
        bg = 1.0 if cfg.background == "white" else 0.0
        is_fg = np.abs(np.asarray(rgbs) - bg).max(axis=1) > 0.02
        fg_idx = np.nonzero(is_fg)[0]
        bg_idx = np.nonzero(~is_fg)[0]
        n_fg = min(len(fg_idx), int(cfg.ray_pool_cap * 0.8))
        n_bg = cfg.ray_pool_cap - n_fg
        sel = np.concatenate([
            rng_pool.choice(fg_idx, n_fg, replace=False)
            if len(fg_idx) > n_fg else fg_idx,
            rng_pool.choice(bg_idx, min(n_bg, len(bg_idx)), replace=False),
        ])
        origins, dirs, rgbs = origins[sel], dirs[sel], rgbs[sel]
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)
    rgbs = jnp.asarray(rgbs)
    n_rays = origins.shape[0]

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pixtrack_tpu.parallel.mesh import shard_field_params

        assert cfg.batch_rays % mesh.shape["dp"] == 0, (
            f"batch_rays {cfg.batch_rays} must divide dp={mesh.shape['dp']}"
        )
        params = shard_field_params(params, mesh, field)
        batch_sharding = NamedSharding(mesh, P("dp", None))

    sched = optax.exponential_decay(
        cfg.lr, cfg.n_steps, cfg.lr_final / cfg.lr, staircase=False
    )
    optimizer = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = optimizer.init(params)

    rcfg = RenderConfig(
        n_coarse=cfg.n_coarse, n_fine=cfg.n_fine, perturb=True,
        min_transmittance=1e-4,
    )
    aabb_j = jnp.asarray(aabb, jnp.float32)

    def loss_fn(params, o, d, target, k):
        out = render_rays(field, params, o, d, aabb_j, rcfg, k)
        bg = 1.0 if cfg.background == "white" else 0.0
        pred = out["rgb"] + (1.0 - out["alpha"][:, None]) * bg
        return jnp.mean((pred - target) ** 2)

    # The ray pool enters run_chunk as ARGUMENTS (device buffers), never as
    # a closure capture: captured numpy/jnp pools are baked into the HLO as
    # literal constants — a 42-view 448px dataset is ~300 MB of constants,
    # which blows the remote-compile request limit (measured: HTTP 413 from
    # the axon compile service) and bloats compile time everywhere else.
    def one_step(pools, carry, _):
        o_pool, d_pool, rgb_pool = pools
        params, opt_state, k = carry
        k_batch, k_render, k_next = jax.random.split(k, 3)
        idx = jax.random.randint(k_batch, (cfg.batch_rays,), 0, n_rays)
        o = jnp.take(o_pool, idx, axis=0)
        d = jnp.take(d_pool, idx, axis=0)
        target = jnp.take(rgb_pool, idx, axis=0)
        if batch_sharding is not None:
            o = jax.lax.with_sharding_constraint(o, batch_sharding)
            d = jax.lax.with_sharding_constraint(d, batch_sharding)
            target = jax.lax.with_sharding_constraint(target, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, o, d, target, k_render)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, k_next), loss

    # On CPU (tests), scan chunks of steps inside one program to kill host
    # dispatch overhead. On TPU, dispatch is cheap once compiled, and wrapping
    # this scatter-heavy step in lax.scan reliably crashes the TPU runtime
    # (reproduced at scan lengths 10 and 50 on v5e; single steps are fine) —
    # so each step dispatches individually there.
    use_scan = jax.default_backend() == "cpu"
    chunk = max(1, min(cfg.log_every, 50)) if use_scan else 1

    if use_scan:

        @jax.jit
        def run_chunk(params, opt_state, k, o_pool, d_pool, rgb_pool):
            (params, opt_state, k), losses = jax.lax.scan(
                partial(one_step, (o_pool, d_pool, rgb_pool)),
                (params, opt_state, k), None, length=chunk,
            )
            return params, opt_state, k, losses[-1]

    else:

        @jax.jit
        def run_chunk(params, opt_state, k, o_pool, d_pool, rgb_pool):
            (params, opt_state, k), loss = one_step(
                (o_pool, d_pool, rgb_pool), (params, opt_state, k), None
            )
            return params, opt_state, k, loss

    history = []
    t0 = time.time()
    done = 0
    while done < cfg.n_steps:
        params, opt_state, key, loss = run_chunk(
            params, opt_state, key, origins, dirs, rgbs
        )
        done += chunk
        if done % cfg.log_every < chunk:
            lv = float(loss)
            history.append((done, lv))
            if callback:
                # params included so callers can checkpoint mid-train
                # (remote-TPU runs can take >1h; losing the whole run to a
                # crash after training was a measured failure mode)
                callback(done, lv, params)
    jax.block_until_ready(params)
    elapsed = time.time() - t0
    return field, params, {"history": history, "seconds": elapsed}


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(pred) - np.asarray(gt)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))
