"""Basin-aware UNet feature training: differentiate through the aligner.

Why: the r1 warp-consistency InfoNCE objective produced features that track
5.7x WORSE than the handcrafted pyramid (PARITY.md) — InfoNCE optimizes
*distinctiveness* (sharp, peaky similarity), while the feature-metric LM
aligner needs a *wide smooth convergence basin*: the first-order Taylor
expansion of the feature field around the projection must point toward the
true pose from several pixels away, under the nuisances real tracking sees.

This trains the extractor the way pixloc's UNet was trained (the reference
downloads that checkpoint at setup.sh:14-21; pixloc "Back to the Feature",
CVPR'21 — train END-TO-END THROUGH THE OPTIMIZER): unroll K damped
Gauss-Newton steps of the ACTUAL production residual machinery
(align.lm._residuals_and_jacobian — same interpolation, masking, confidence
and robust-weight semantics as inference) from sampled initial pose
perturbations, and minimize the reprojection error of the scene's 3D points
after every step. Gradients flow through the 6x6 solves, the bilinear
feature/confidence sampling, and the UNet, so the network learns feature
fields whose induced LM updates contract toward ground truth — and
confidence maps that downweight occluded/cluttered/noisy regions (a wrong
confidence directly hurts the pose loss).

Scenes are textured 3D planes rendered with exact perspective geometry:
  - reference view: clean render on a white background (exactly what the
    production tracker feeds the extractor — a NeRF render, r9:145-152);
  - query view: render composited over background clutter, with photometric
    gain/bias/gamma, Gaussian noise, traced-sigma blur, and rectangular
    occluders — the premier_protein/YCB nuisance set (BASELINE.json
    configs 2/4) that handcrafted gradients cannot survive.

Everything is one jitted train step; weights persist via the npz codec in
features/train.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.align.lm import AlignConfig, LevelData, _residuals_and_jacobian
from pixtrack_tpu.align.observations import build_level_data, observe_points
from pixtrack_tpu.features.pyramid import FeaturePyramid
from pixtrack_tpu.features.unet import UNetExtractor, init_unet, normalize_features
from pixtrack_tpu.geometry import Camera, Pose


@dataclasses.dataclass(frozen=True)
class BasinTrainConfig:
    n_steps: int = 3000
    batch: int = 2              # scenes per step
    n_perturb: int = 4          # pose perturbations per scene
    size: int = 192             # render size (multiple of 16)
    tex_size: int = 256
    n_points: int = 512         # 3D points on the plane
    k_steps: int = 5            # unrolled GN steps per level
    lam: float = 3e-2           # fixed GN damping during training
    lr: float = 1e-3
    # initial-perturbation ranges (the basin to learn)
    rot_deg: Tuple[float, float] = (1.0, 10.0)
    trans_frac: Tuple[float, float] = (0.005, 0.05)   # x camera distance
    # reference-render pose offset (tracker renders at the previous
    # estimate, which sits within a frame's motion of the true pose)
    ref_rot_deg: float = 3.0
    # nuisance strengths (query only)
    max_blur_sigma: float = 1.5
    max_noise: float = 0.04
    n_occluders: int = 2
    max_occluder_frac: float = 0.3
    reproj_clip_px: float = 12.0   # loss clamp: diverged samples don't dominate
    scan_steps: bool = True        # lax.scan over GN steps (compile-time)
    log_every: int = 100


# ------------------------------------------------------------ scene render ---
def _look_at_w2c(center: jax.Array, roll: jax.Array) -> Pose:
    """w2c pose looking from ``center`` at the origin, +Z forward, with an
    in-plane roll (traced; plane normal is world +Z so views come from the
    +Z hemisphere)."""
    z = -center / jnp.maximum(jnp.linalg.norm(center), 1e-8)
    up = jnp.asarray([0.0, 1.0, 0.0])
    # fall back to +X up when the view direction is parallel to up
    upx = jnp.asarray([1.0, 0.0, 0.0])
    use_alt = jnp.abs(jnp.dot(z, up)) > 0.95
    up = jnp.where(use_alt, upx, up)
    x = jnp.cross(z, up)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-8)
    y = jnp.cross(z, x)
    R_cam = jnp.stack([x, y, z], axis=0)  # rows: camera axes in world
    c, s = jnp.cos(roll), jnp.sin(roll)
    R_roll = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R_roll = R_roll.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    R = R_roll @ R_cam
    t = -R @ center
    return Pose.from_Rt(R, t)


def render_plane(
    texture: jax.Array,
    background: Optional[jax.Array],
    T_w2c: Pose,
    camera: Camera,
    size: Tuple[int, int],
) -> jax.Array:
    """Exact perspective render of the textured unit plane (Z=0, extent
    [-0.5, 0.5]^2). ``background`` is a screen-space clutter texture (same
    H x W as the output) or None for white — the production reference-render
    background (r9 white_background). ``size`` = static (H, W) (the camera's
    height/width leaves are traced under jit)."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    H, W = size
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=1)  # (HW, 2)
    d_cam = jnp.concatenate(
        [(pix - camera.c[None, :]) / camera.f[None, :],
         jnp.ones((pix.shape[0], 1))], axis=1,
    )
    R, t = T_w2c.R, T_w2c.t
    d_w = d_cam @ R  # R^T d
    o_w = -(R.T @ t)
    s = -o_w[2] / jnp.where(jnp.abs(d_w[:, 2]) < 1e-8, 1e-8, d_w[:, 2])
    uv = o_w[None, :2] + s[:, None] * d_w[:, :2]
    hit = (s > 1e-3) & (jnp.abs(uv[:, 0]) <= 0.5) & (jnp.abs(uv[:, 1]) <= 0.5)
    S = texture.shape[0]
    tex_xy = (uv + 0.5) * (S - 1)
    vals, _, _ = interpolate_features(texture, tex_xy, compute_grad=False)
    if background is None:
        bg = jnp.ones((pix.shape[0], 3))
    else:
        bg = background.reshape(-1, 3)
    img = jnp.where(hit[:, None], vals, bg)
    return img.reshape(H, W, 3)


def random_texture(key, size: int, n_modes: int = 48,
                   freq_scale: float = 1.0) -> jax.Array:
    """Random RGB texture mixing low and high spatial frequencies (low modes
    set the wide basin, high modes the fine-alignment signal). ``freq_scale``
    (traced OK) shifts the whole spectrum down — small values give smooth,
    nearly featureless blob-like appearance."""
    kf, ka, kp = jax.random.split(key, 3)
    freqs = freq_scale * jnp.exp(
        jax.random.uniform(kf, (3, n_modes, 2), minval=np.log(0.5), maxval=np.log(40.0))
    ) * jnp.where(jax.random.uniform(kf, (3, n_modes, 2)) < 0.5, -1.0, 1.0)
    amps = jax.random.normal(ka, (3, n_modes)) / np.sqrt(n_modes)
    # 1/f-ish spectrum: damp high frequencies
    amps = amps / jnp.sqrt(jnp.maximum(jnp.linalg.norm(freqs, axis=-1), 1.0))
    phases = jax.random.uniform(kp, (3, n_modes), maxval=2 * np.pi)
    ys, xs = jnp.meshgrid(
        jnp.linspace(0, 1, size), jnp.linspace(0, 1, size), indexing="ij"
    )
    grid = jnp.stack([xs, ys], -1).reshape(-1, 2)
    phase = jnp.einsum("cmk,pk->cmp", freqs, grid) * 2 * np.pi + phases[..., None]
    img = jnp.einsum("cm,cmp->cp", amps, jnp.sin(phase))
    img = img.reshape(3, size, size).transpose(1, 2, 0)
    return jax.nn.sigmoid(3.0 * img)


def _blur_traced(img: jax.Array, sigma: jax.Array, radius: int = 4) -> jax.Array:
    """Separable Gaussian blur with a TRACED sigma (fixed kernel radius)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 0.25)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    k = k / k.sum()
    C = img.shape[-1]
    xpad = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="edge")
    xb = xpad[None]
    dn = jax.lax.conv_dimension_numbers(
        xb.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
    )
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    xb = jax.lax.conv_general_dilated(
        xb, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    xb = jax.lax.conv_general_dilated(
        xb, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    return xb[0]


def apply_nuisances(key, img: jax.Array, clutter: jax.Array,
                    cfg: BasinTrainConfig) -> jax.Array:
    """Photometric jitter + blur + noise + rectangular occluders (query only)."""
    kg, kb, kgam, kn, ks, ko = jax.random.split(key, 6)
    H, W = img.shape[:2]
    gain = 1.0 + 0.25 * jax.random.normal(kg, (3,))
    bias = 0.1 * jax.random.normal(kb, (3,))
    gamma = jnp.exp(0.25 * jax.random.normal(kgam, ()))
    out = jnp.clip(img, 1e-4, 1.0) ** gamma
    out = out * gain + bias
    sigma = jax.random.uniform(ks, (), minval=0.0, maxval=cfg.max_blur_sigma)
    out = _blur_traced(out, sigma)
    noise_amp = jax.random.uniform(kn, (), minval=0.0, maxval=cfg.max_noise)
    out = out + noise_amp * jax.random.normal(kn, out.shape)
    # occluders: rectangles filled with the clutter texture (depth-1 foreground)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    for i in range(cfg.n_occluders):
        kpos, ksz, ko = jax.random.split(ko, 3)
        cx = jax.random.uniform(kpos, (2,), minval=0.0, maxval=1.0)
        wh = jax.random.uniform(
            ksz, (2,), minval=0.05, maxval=cfg.max_occluder_frac
        )
        inside = (
            (jnp.abs(xs / W - cx[0]) < wh[0] / 2)
            & (jnp.abs(ys / H - cx[1]) < wh[1] / 2)
        )
        out = jnp.where(inside[..., None], jnp.roll(clutter, 31 * (i + 1), axis=0), out)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------- unrolled aligner --
def _pyramid_from_unet(out, idx: int, scales) -> FeaturePyramid:
    feats = tuple(normalize_features(f[idx]) for f in out["feature_maps"])
    confs = tuple(c[idx] for c in out["confidences"])
    return FeaturePyramid(
        levels=feats,
        scales=tuple((1.0 / s, 1.0 / s) for s in scales),
        confidences=confs,
    )


def unrolled_align_loss(
    levels: Tuple[LevelData, ...],
    T_init: Pose,
    T_gt: Pose,
    camera: Camera,
    cfg: BasinTrainConfig,
    acfg: AlignConfig,
):
    """K damped-GN steps per level (coarse -> fine) with the production
    residual machinery; loss = clamped mean reprojection error (px, vs the
    GT pose) accumulated after EVERY step, so early steps must already
    contract — that is what widens the basin."""
    p3d = levels[0].p3d
    uv_gt, vis_gt = camera.world2image(T_gt, p3d)

    def reproj_loss(T):
        uv, vis = camera.world2image(T, p3d)
        err = jnp.linalg.norm(uv - uv_gt, axis=-1)
        err = jnp.minimum(err, cfg.reproj_clip_px)
        ok = (vis & vis_gt & levels[0].mask).astype(jnp.float32)
        return jnp.sum(err * ok) / jnp.maximum(ok.sum(), 1.0)

    def gn_step(T, data):
        r, J, w, valid, _ = _residuals_and_jacobian(T, data, camera, acfg)
        wr = r * w[:, None]
        g = jnp.einsum("nck,nc->k", J, wr)
        Hm = jnp.einsum("nck,ncl->kl", J * w[:, None, None], J)
        diag = jnp.diagonal(Hm)
        Hd = Hm + (cfg.lam * diag + 1e-6) * jnp.eye(6)
        delta = -jnp.linalg.solve(Hd, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return T.retract(delta)

    loss = 0.0
    T = T_init
    n_terms = 0
    for data in reversed(levels):
        if cfg.scan_steps:
            # lax.scan keeps the traced graph one-step-sized per level
            # (compile time: the unrolled variant took >1 h to compile at
            # the full config on this box; scan compiles in minutes)
            def body(carry, _):
                Tc, acc = carry
                Tn = gn_step(Tc, data)
                return (Tn, acc + reproj_loss(Tn)), None

            (T, acc), _ = jax.lax.scan(
                body, (T, jnp.float32(0.0)), None, length=cfg.k_steps
            )
            loss = loss + acc
        else:
            for _ in range(cfg.k_steps):
                T = gn_step(T, data)
                loss = loss + reproj_loss(T)
        n_terms += cfg.k_steps
    return loss / n_terms


# ----------------------------------------------------------------- training ---
def make_basin_loss_fn(model: UNetExtractor, cfg: BasinTrainConfig):
    size = cfg.size
    camera = Camera.pinhole(
        size * 1.2, size * 1.2, (size - 1) / 2, (size - 1) / 2, size, size
    )
    acfg = AlignConfig(robust_c=1.0)

    def scene_levels(params_feats_ref, params_feats_qry, p3d, T_ref):
        f_ref, w_ref, v_ref = observe_points(
            params_feats_ref, T_ref, camera, p3d, jnp.ones(p3d.shape[0], bool)
        )
        return build_level_data(
            params_feats_qry, f_ref, w_ref, v_ref, p3d,
            jnp.ones(p3d.shape[0], bool),
        )

    def one_scene(params, key):
        (k_tex, k_bg, k_pose, k_roll, k_pts, k_ref, k_nui, k_pert,
         k_smooth, k_qbg, k_rbg) = jax.random.split(key, 11)
        # texture smoothness spans sharp checker-like to near-featureless
        # blob-like surfaces (the r2 blob-world failure was a distribution
        # gap: the UNet had never seen smooth low-frequency objects)
        freq_scale = jnp.exp(jax.random.uniform(
            k_smooth, (), minval=np.log(0.125), maxval=0.0
        ))
        texture = random_texture(k_tex, cfg.tex_size, freq_scale=freq_scale)
        clutter = random_texture(k_bg, size)

        # background modes, matching every production render convention:
        # query in {clutter, black (splat-masked), white}; reference in
        # {black (render_nerf_view), white (bench render path)}
        black = jnp.zeros((size, size, 3))
        white = jnp.ones((size, size, 3))
        qsel = jax.random.randint(k_qbg, (), 0, 4)  # clutter x2, black, white
        qbg = jnp.stack([clutter, clutter, black, white])[qsel]
        rsel = jax.random.randint(k_rbg, (), 0, 2)
        rbg = jnp.stack([black, white])[rsel]

        # GT pose: +Z-hemisphere look-at with roll
        kd, kth, kph = jax.random.split(k_pose, 3)
        d = jax.random.uniform(kd, (), minval=1.2, maxval=2.0)
        th = jax.random.uniform(kth, (), minval=0.05, maxval=0.9)
        ph = jax.random.uniform(kph, (), minval=0.0, maxval=2 * np.pi)
        center = d * jnp.stack(
            [jnp.sin(th) * jnp.cos(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(th)]
        )
        roll = jax.random.uniform(k_roll, (), minval=-np.pi, maxval=np.pi)
        T_gt = _look_at_w2c(center, roll)

        # reference render pose: small offset (previous-estimate distance)
        dr = jax.random.normal(k_ref, (6,))
        dr = dr / jnp.maximum(jnp.linalg.norm(dr), 1e-8)
        mag = jnp.deg2rad(cfg.ref_rot_deg)
        T_ref = T_gt.retract(dr * mag * jnp.asarray([1, 1, 1, 0.3, 0.3, 0.3]))

        # renders: clean reference, nuisanced query
        img_ref = render_plane(texture, rbg, T_ref, camera, (size, size))
        img_qry = render_plane(texture, qbg, T_gt, camera, (size, size))
        img_qry = apply_nuisances(k_nui, img_qry, clutter, cfg)

        # 3D points on the plane
        uvp = jax.random.uniform(k_pts, (cfg.n_points, 2), minval=-0.45, maxval=0.45)
        p3d = jnp.concatenate([uvp, jnp.zeros((cfg.n_points, 1))], axis=1)

        out = model.apply(params, jnp.stack([img_ref, img_qry]))
        pyr_ref = _pyramid_from_unet(out, 0, model.scales)
        pyr_qry = _pyramid_from_unet(out, 1, model.scales)
        levels = scene_levels(pyr_ref, pyr_qry, p3d, T_ref)

        # sampled initial perturbations (log-uniform magnitudes)
        kw_, kv_, km_ = jax.random.split(k_pert, 3)
        wdir = jax.random.normal(kw_, (cfg.n_perturb, 3))
        wdir = wdir / jnp.maximum(jnp.linalg.norm(wdir, axis=1, keepdims=True), 1e-8)
        vdir = jax.random.normal(kv_, (cfg.n_perturb, 3))
        vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=1, keepdims=True), 1e-8)
        u = jax.random.uniform(km_, (cfg.n_perturb, 2))
        rmag = jnp.deg2rad(cfg.rot_deg[0]) * (
            (cfg.rot_deg[1] / cfg.rot_deg[0]) ** u[:, 0]
        )
        tmag = d * cfg.trans_frac[0] * (
            (cfg.trans_frac[1] / cfg.trans_frac[0]) ** u[:, 1]
        )
        deltas = jnp.concatenate(
            [wdir * rmag[:, None], vdir * tmag[:, None]], axis=1
        )

        def run_one(delta):
            T0 = T_gt.retract(delta)
            return unrolled_align_loss(levels, T0, T_gt, camera, cfg, acfg)

        return jnp.mean(jax.vmap(run_one)(deltas))

    def loss_fn(params, key):
        keys = jax.random.split(key, cfg.batch)
        return jnp.mean(jax.vmap(lambda k: one_scene(params, k))(keys))

    return loss_fn


def train_basin_features(
    cfg: BasinTrainConfig = BasinTrainConfig(),
    seed: int = 0,
    params: Optional[dict] = None,
    callback=None,
):
    """Train the UNet through the unrolled aligner; returns
    (model, params, info)."""
    model, init_params = init_unet(jax.random.PRNGKey(seed), cfg.size, cfg.size)
    if params is None:
        params = init_params
    loss_fn = make_basin_loss_fn(model, cfg)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(cfg.lr)
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k, k_next = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    key = jax.random.PRNGKey(seed + 1)
    history = []
    t0 = time.time()
    for i in range(cfg.n_steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        if (i + 1) % cfg.log_every == 0 or i == 0:
            lv = float(loss)
            history.append((i + 1, lv))
            if callback:
                callback(i + 1, lv)
    jax.block_until_ready(params)
    return model, params, {"history": history, "seconds": time.time() - t0}
