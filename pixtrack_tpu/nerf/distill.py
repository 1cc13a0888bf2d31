"""Distilled MXU-only render field: the 30-FPS path.

The baked cell-packed field (nerf/baked.py) still pays ~1 serial gather per
level per sample (~9-11 M samples/s for a 12-level field) because XLA's
HBM-table gather is a ~150-200M/s serial loop on TPU. The only way past that
wall is ZERO gathers: distill the trained field into a frequency-encoded MLP
whose inference is pure MXU matmuls — measured 350+ M samples/s at 4x128 on
v5e, i.e. a 320x240x96-sample reference render in ~20 ms.

This trades training-time representation (hash grid: converges in minutes)
against render-time representation (MLP: fast to EVALUATE, slow to train
from photos — but cheap to FIT to a teacher field by direct regression, no
rendering involved). A single object needs far less capacity than a scene,
so a small MLP holds the quality.

Pipeline: train hash grid -> (optionally bake) -> ``distill(teacher, ...)``
-> ``DistilledField``, a drop-in for NGPField/BakedField in render_rays /
Testbed. Density is regressed in log1p space (it spans orders of magnitude),
color in linear space, both importance-weighted toward occupied cells.

Reference role: replaces instant-ngp's render path for the per-frame
tracking renders (r9:145-152, 207-214) at production speed on TPU hardware.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.nerf.field import NGPField, sh_encoding_deg4_T


@dataclasses.dataclass
class DistilledField:
    """Freq-encoded MLP field, feature-major, pytree-registered.

    trunk:  enc(3 + 6*octaves) -> width x depth -> (1 + geo) heads
    color:  (geo + SH16) -> width_c -> width_c -> 3 (sigmoid)
    """

    trunk: List[dict]       # list of {kernel (out, in), bias (out, 1)}
    head: dict              # -> (1 + geo,)
    color: List[dict]       # color MLP layers (last linear -> 3)
    octaves: int = 8
    geo_features: int = 15

    # -- encoding -------------------------------------------------------------
    def encode_T(self, xT: jax.Array) -> jax.Array:
        freqs = 2.0 ** jnp.arange(self.octaves, dtype=jnp.float32) * jnp.pi
        ang = (xT[:, None, :] * freqs[None, :, None]).reshape(
            3 * self.octaves, -1
        )
        return jnp.concatenate([xT, jnp.sin(ang), jnp.cos(ang)], axis=0)

    @staticmethod
    def _dense(p: dict, x: jax.Array) -> jax.Array:
        return (
            jax.lax.dot_general(
                p["kernel"].astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + p["bias"]
        )

    def density_T(self, xT: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = self.encode_T(xT)
        for p in self.trunk:
            h = jax.nn.relu(self._dense(p, h))
        h = self._dense(self.head, h)
        sigma = jnp.expm1(jax.nn.softplus(h[0]))  # inverse of log1p target
        return sigma, h[1:]

    def color_T(self, geoT: jax.Array, dT: jax.Array) -> jax.Array:
        h = jnp.concatenate([geoT, sh_encoding_deg4_T(dT)], axis=0)
        for p in self.color[:-1]:
            h = jax.nn.relu(self._dense(p, h))
        return jax.nn.sigmoid(self._dense(self.color[-1], h))

    def field_T(self, xT: jax.Array, dT: jax.Array):
        sigma, geo = self.density_T(xT)
        return sigma, self.color_T(geo, dT)

    def apply(self, params, xT, dT=None, method=None):
        if getattr(method, "__name__", "") == "density_T":
            return self.density_T(xT)
        return self.field_T(xT, dT)


jax.tree_util.register_pytree_node(
    DistilledField,
    lambda f: ((f.trunk, f.head, f.color), (f.octaves, f.geo_features)),
    lambda aux, ch: DistilledField(
        trunk=ch[0], head=ch[1], color=ch[2], octaves=aux[0], geo_features=aux[1]
    ),
)


def _init_dense(key, n_out, n_in):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (n_out, n_in)) * jnp.sqrt(2.0 / n_in)
    return {"kernel": w.astype(jnp.float32), "bias": jnp.zeros((n_out, 1))}


def init_distilled(
    key, octaves: int = 8, width: int = 128, depth: int = 4,
    color_width: int = 64, geo_features: int = 15,
) -> DistilledField:
    keys = jax.random.split(key, depth + 4)
    n_in = 3 + 6 * octaves
    trunk = []
    for i in range(depth):
        trunk.append(_init_dense(keys[i], width, n_in))
        n_in = width
    head = _init_dense(keys[depth], 1 + geo_features, width)
    # start from (near-)empty space: softplus(-3) -> log1p(sigma) ~ 0.05
    head["bias"] = head["bias"].at[0, 0].set(-3.0)
    color = [
        _init_dense(keys[depth + 1], color_width, geo_features + 16),
        _init_dense(keys[depth + 2], color_width, color_width),
        _init_dense(keys[depth + 3], 3, color_width),
    ]
    return DistilledField(
        trunk=trunk, head=head, color=color, octaves=octaves,
        geo_features=geo_features,
    )


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    steps: int = 4000
    batch: int = 1 << 15
    dataset_size: int = 1 << 21
    lr: float = 2e-3
    lr_final: float = 1e-4
    octaves: int = 8
    width: int = 128
    depth: int = 4
    # fraction of samples drawn near occupied cells (rest uniform in aabb)
    surface_frac: float = 0.7
    sigma_weight_scale: float = 5.0  # upweight occupied-space samples
    color_loss_weight: float = 5.0  # the sigma step-loss floor otherwise drowns color


def _sample_points(key, n, aabb, occ: Optional[np.ndarray], surface_frac,
                   pad_frac: float = 0.25):
    """(3, n) sample positions: near-occupancy + uniform mixture.

    The uniform box is the aabb GROWN by ``pad_frac`` of its extent (clipped
    to [0, 1]): rays start exactly on the aabb faces, so the student must
    learn zero density there and just beyond — unsampled border space
    otherwise aliases into hallucinated 'fog' at the render_aabb faces
    (observed: sigma ~14 at the box edge, fogging every background pixel)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    ext = hi - lo
    lo = jnp.clip(lo - pad_frac * ext, 0.0, 1.0)
    hi = jnp.clip(hi + pad_frac * ext, 0.0, 1.0)
    n_sur = int(n * surface_frac) if occ is not None and occ.any() else 0
    pts = []
    if n_sur:
        res = occ.shape[0]
        ox, oy, oz = np.nonzero(occ)
        pick = jax.random.randint(k1, (n_sur,), 0, len(ox))
        base = jnp.stack(
            [jnp.asarray(ox)[pick], jnp.asarray(oy)[pick], jnp.asarray(oz)[pick]],
            axis=0,
        ).astype(jnp.float32)
        jit = jax.random.uniform(k2, (3, n_sur))
        pts.append((base + jit) / res)
    n_uni = n - n_sur
    u = jax.random.uniform(k3, (3, n_uni))
    pts.append(lo[:, None] + (hi - lo)[:, None] * u)
    return jnp.concatenate(pts, axis=1)


def distill(
    teacher,
    teacher_params,
    key,
    aabb,
    occ: Optional[np.ndarray] = None,
    config: DistillConfig = DistillConfig(),
    teacher_chunk: int = 1 << 19,
    log_every: int = 0,
    density_mask: Optional[np.ndarray] = None,
) -> DistilledField:
    """Fit a DistilledField to any teacher exposing ``apply(params, x, d,
    method=NGPField.field_T)`` (NGPField, BakedField, or analytic).

    ``density_mask``: optional (R, R, R) bool grid (indexed [x, y, z] like
    occupancy_grid's output); teacher density is clamped to ZERO outside it
    before fitting. Used with baked.main_component to erase floaters from
    the student instead of spending MLP capacity reproducing them."""
    import optax

    k_data, k_dir, k_init, k_iter = jax.random.split(key, 4)

    # ---- one-time teacher dataset ------------------------------------------
    N = config.dataset_size
    x = _sample_points(k_data, N, aabb, occ, config.surface_frac)
    # Directions are CAMERA-LIKE rays (eye outside the object looking at
    # the sample), not uniform random: the NGP color head is view-dependent
    # (SH deg-4) and only trained on the mapping rig's outward-facing rays,
    # so a uniform direction queries its untrained extrapolation — the
    # teacher returns noise there and the student spends its capacity
    # fitting that mixture instead of the texture (measured on the mesh
    # benchmark world: uniform-direction distills plateaued at 15-17 dB in
    # the object region with all texture lost, while the hash teacher holds
    # 24.3 dB; render-time rays are always outside-in, so this is also the
    # only direction cone the student is ever evaluated in).
    k_eye = jax.random.split(k_dir)[0]
    ctr = 0.5 * (jnp.asarray(aabb[0], jnp.float32)
                 + jnp.asarray(aabb[1], jnp.float32))
    half_diag = 0.5 * jnp.linalg.norm(
        jnp.asarray(aabb[1], jnp.float32) - jnp.asarray(aabb[0], jnp.float32)
    )
    u = jax.random.normal(k_eye, (3, N))
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=0, keepdims=True), 1e-9)
    eye = ctr[:, None] + 2.5 * half_diag * u
    d = x - eye
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=0, keepdims=True), 1e-9)
    sig = np.empty(N, np.float32)
    rgb = np.empty((3, N), np.float32)
    for s in range(0, N, teacher_chunk):
        ss, rr = teacher.apply(
            teacher_params, x[:, s : s + teacher_chunk],
            d[:, s : s + teacher_chunk], method=NGPField.field_T,
        )
        sig[s : s + teacher_chunk] = np.asarray(ss)
        rgb[:, s : s + teacher_chunk] = np.asarray(rr)
    x = np.asarray(x)
    d = np.asarray(d)
    if density_mask is not None:
        res = density_mask.shape[0]
        ix = np.clip((x * res).astype(np.int64), 0, res - 1)
        sig = np.where(density_mask[ix[0], ix[1], ix[2]], sig, 0.0)
    log_sig = np.log1p(sig)
    # occupied-space samples matter most for rendering
    occupied = (sig > 0.01).astype(np.float32)
    w = 1.0 + config.sigma_weight_scale * occupied

    student = init_distilled(
        k_init, octaves=config.octaves, width=config.width, depth=config.depth
    )
    sched = optax.exponential_decay(
        config.lr, config.steps, config.lr_final / config.lr
    )
    opt = optax.adam(sched)
    opt_state = opt.init(student)

    def loss_fn(st: DistilledField, xb, db, ls_b, rgb_b, wb, ob):
        h = st.encode_T(xb)
        for p in st.trunk:
            h = jax.nn.relu(st._dense(p, h))
        h = st._dense(st.head, h)
        ls_pred = jax.nn.softplus(h[0])  # log1p(sigma) prediction
        geo = h[1:]
        rgb_pred = st.color_T(geo, db)
        l_sig = jnp.mean(wb * (ls_pred - ls_b) ** 2)
        # color only matters where density is nonzero (it is invisible
        # elsewhere) — masking stops the MLP wasting capacity on it
        l_rgb = jnp.sum(ob[None, :] * (rgb_pred - rgb_b) ** 2) / (
            3.0 * jnp.maximum(ob.sum(), 1.0)
        )
        return l_sig + config.color_loss_weight * l_rgb

    @jax.jit
    def step(st, opt_state, xb, db, ls_b, rgb_b, wb, ob):
        loss, g = jax.value_and_grad(loss_fn)(st, xb, db, ls_b, rgb_b, wb, ob)
        updates, opt_state = opt.update(g, opt_state)
        st = optax.apply_updates(st, updates)
        return st, opt_state, loss

    B = config.batch
    n_batches = max(N // B, 1)
    perm = np.random.default_rng(0).permutation(N)
    x, d, log_sig, rgb, w, occupied = (
        a[..., perm] for a in (x, d, log_sig, rgb, w, occupied)
    )
    last = None
    for i in range(config.steps):
        s = (i % n_batches) * B
        student, opt_state, last = step(
            student, opt_state,
            jnp.asarray(x[:, s : s + B]), jnp.asarray(d[:, s : s + B]),
            jnp.asarray(log_sig[s : s + B]), jnp.asarray(rgb[:, s : s + B]),
            jnp.asarray(w[s : s + B]), jnp.asarray(occupied[s : s + B]),
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"distill step {i+1}: loss {float(last):.5f}", flush=True)
    return student


def finetune_photometric(
    student: DistilledField,
    dataset,
    aabb,
    steps: int = 3000,
    batch_rays: int = 1 << 13,
    n_coarse: int = 64,
    lr: float = 1e-3,
    lr_final: float = 1e-4,
    background: str = "white",
    ray_pool_cap: int = 1 << 21,
    seed: int = 0,
    log_every: int = 0,
) -> DistilledField:
    """Ray-space fine-tune of a distilled student on the captured mapping
    images (a NerfDataset) — run AFTER the point-space ``distill``.

    Point-space distillation regresses (sigma, rgb) at sample positions,
    but render fidelity depends on where along each RAY the student's
    density transition sits: a surface crust registered a voxel or two off
    the teacher's composites the crust color at the wrong depth and the
    surface texture smears (measured on the striped mesh benchmark world:
    point-distilled students plateau at 15-17 dB in the object region
    regardless of octaves/steps/sampling while the hash teacher holds
    23-24 dB). Rendering the student through the production volume
    renderer and matching the captured pixels optimizes exactly what the
    tracker consumes — the same train-through-the-consumer recipe as
    features/train_basin.py.

    TPU notes: single-dispatch steps (no scan — see nerf/train.py), fused
    Pallas render path disabled (training needs the differentiable staged
    path; inference keeps the fused kernel)."""
    import optax

    origins, dirs, rgbs = dataset.all_rays()
    if ray_pool_cap and origins.shape[0] > ray_pool_cap:
        # foreground-weighted pool cap (same rationale + recipe as
        # nerf.train.train: a few-million-ray pool is statistically
        # equivalent and the tunnel transfer is the real cost)
        rng_pool = np.random.default_rng(seed + 2)
        bgv = 1.0 if background == "white" else 0.0
        is_fg = np.abs(np.asarray(rgbs) - bgv).max(axis=1) > 0.02
        fg_idx = np.nonzero(is_fg)[0]
        bg_idx = np.nonzero(~is_fg)[0]
        n_fg = min(len(fg_idx), int(ray_pool_cap * 0.8))
        n_bg = ray_pool_cap - n_fg
        sel = np.concatenate([
            rng_pool.choice(fg_idx, n_fg, replace=False)
            if len(fg_idx) > n_fg else fg_idx,
            rng_pool.choice(bg_idx, min(n_bg, len(bg_idx)), replace=False),
        ])
        origins, dirs, rgbs = origins[sel], dirs[sel], rgbs[sel]
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    rgbs = jnp.asarray(rgbs, jnp.float32)
    n_rays = origins.shape[0]
    aabb_j = jnp.asarray(aabb, jnp.float32)
    bg = 1.0 if background == "white" else 0.0

    from pixtrack_tpu.nerf.render import RenderConfig, render_rays

    rcfg = RenderConfig(
        n_coarse=n_coarse, n_fine=0, perturb=True, fused=False,
        min_transmittance=1e-4, chunk=batch_rays,
    )

    sched = optax.exponential_decay(lr, steps, lr_final / lr)
    opt = optax.adam(sched)
    opt_state = opt.init(student)

    def loss_fn(st, o, d, target, k):
        out = render_rays(st, None, o, d, aabb_j, rcfg, key=k)
        pred = out["rgb"] + (1.0 - out["alpha"][:, None]) * bg
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(st, opt_state, key):
        k_idx, k_render = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch_rays,), 0, n_rays)
        loss, grads = jax.value_and_grad(loss_fn)(
            st, origins[idx], dirs[idx], rgbs[idx], k_render
        )
        updates, opt_state = opt.update(grads, opt_state)
        st = optax.apply_updates(st, updates)
        return st, opt_state, loss

    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        key, k = jax.random.split(key)
        student, opt_state, last = step(student, opt_state, k)
        if log_every and (i + 1) % log_every == 0:
            print(f"finetune step {i+1}: loss {float(last):.6f}", flush=True)
    return student


def save_distilled(path, field: DistilledField) -> None:
    """Persist a DistilledField as .npz (same role as save_snapshot for
    NGPField: train/distill offline once, load in trackers/benchmarks)."""
    arrays = {}
    for i, p in enumerate(field.trunk):
        arrays[f"trunk{i}_k"] = np.asarray(p["kernel"])
        arrays[f"trunk{i}_b"] = np.asarray(p["bias"])
    arrays["head_k"] = np.asarray(field.head["kernel"])
    arrays["head_b"] = np.asarray(field.head["bias"])
    for i, p in enumerate(field.color):
        arrays[f"color{i}_k"] = np.asarray(p["kernel"])
        arrays[f"color{i}_b"] = np.asarray(p["bias"])
    arrays["meta"] = np.asarray(
        [field.octaves, field.geo_features, len(field.trunk), len(field.color)]
    )
    np.savez(path, **arrays)


def load_distilled(path) -> DistilledField:
    z = np.load(path)
    octaves, geo, n_trunk, n_color = (int(v) for v in z["meta"])
    trunk = [
        {"kernel": jnp.asarray(z[f"trunk{i}_k"]), "bias": jnp.asarray(z[f"trunk{i}_b"])}
        for i in range(n_trunk)
    ]
    color = [
        {"kernel": jnp.asarray(z[f"color{i}_k"]), "bias": jnp.asarray(z[f"color{i}_b"])}
        for i in range(n_color)
    ]
    head = {"kernel": jnp.asarray(z["head_k"]), "bias": jnp.asarray(z["head_b"])}
    return DistilledField(
        trunk=trunk, head=head, color=color, octaves=octaves, geo_features=geo
    )
