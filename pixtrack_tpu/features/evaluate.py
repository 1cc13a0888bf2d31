"""Feature-quality benchmark: production-aligner convergence on held-out
nuisance scenes.

The deciding metric for the extractor choice (handcrafted pyramid vs trained
UNet — the pixloc_megadepth role, reference setup.sh:14-21): run the ACTUAL
production LM (align.lm.align_pyramid, while-loop + early stop + robust
weights) from sampled pose perturbations on held-out textured-plane scenes
with the tracking nuisance set (background clutter, photometric jitter,
blur, noise, occluders — train_basin.apply_nuisances), and measure the final
pose error. A feature pyramid is better iff the aligner lands closer to
ground truth from the same starts on the same scenes.

This is intentionally the same scene generator the basin trainer uses but
with HELD-OUT seeds — it measures generalization over textures/nuisances,
not memorization. Cross-domain generalization (3D blob world) is measured
separately by tests/test_learned_features.py on the synthetic world.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.align.lm import AlignConfig, align_pyramid
from pixtrack_tpu.align.observations import build_level_data, observe_points
from pixtrack_tpu.features.train_basin import (
    BasinTrainConfig,
    _look_at_w2c,
    apply_nuisances,
    random_texture,
    render_plane,
)
from pixtrack_tpu.geometry import Camera, Pose


@dataclasses.dataclass(frozen=True)
class FeatureEvalConfig:
    n_scenes: int = 16
    n_perturb: int = 4          # starts per scene
    size: int = 192
    tex_size: int = 256
    n_points: int = 512
    rot_deg: Tuple[float, float] = (2.0, 8.0)
    trans_frac: Tuple[float, float] = (0.01, 0.04)
    ref_rot_deg: float = 3.0
    # nuisances (same knobs as training; defaults match BasinTrainConfig)
    max_blur_sigma: float = 1.5
    max_noise: float = 0.04
    n_occluders: int = 2
    max_occluder_frac: float = 0.3
    seed: int = 1000            # held out from training (trainer uses seed+1)


def _nuisance_cfg(cfg: FeatureEvalConfig) -> BasinTrainConfig:
    return BasinTrainConfig(
        size=cfg.size, tex_size=cfg.tex_size, n_points=cfg.n_points,
        max_blur_sigma=cfg.max_blur_sigma, max_noise=cfg.max_noise,
        n_occluders=cfg.n_occluders, max_occluder_frac=cfg.max_occluder_frac,
    )


def make_eval_scene(key, cfg: FeatureEvalConfig):
    """One held-out scene: (img_ref f32, img_qry f32, T_ref, T_gt, p3d,
    camera). Same construction as train_basin.make_basin_loss_fn.one_scene
    but returned as arrays so any extractor can be plugged in."""
    bcfg = _nuisance_cfg(cfg)
    size = cfg.size
    camera = Camera.pinhole(
        size * 1.2, size * 1.2, (size - 1) / 2, (size - 1) / 2, size, size
    )
    (k_tex, k_bg, k_pose, k_roll, k_pts, k_ref, k_nui) = jax.random.split(key, 7)
    texture = random_texture(k_tex, cfg.tex_size)
    clutter = random_texture(k_bg, size)

    kd, kth, kph = jax.random.split(k_pose, 3)
    d = jax.random.uniform(kd, (), minval=1.2, maxval=2.0)
    th = jax.random.uniform(kth, (), minval=0.05, maxval=0.9)
    ph = jax.random.uniform(kph, (), minval=0.0, maxval=2 * np.pi)
    center = d * jnp.stack(
        [jnp.sin(th) * jnp.cos(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(th)]
    )
    roll = jax.random.uniform(k_roll, (), minval=-np.pi, maxval=np.pi)
    T_gt = _look_at_w2c(center, roll)

    dr = jax.random.normal(k_ref, (6,))
    dr = dr / jnp.maximum(jnp.linalg.norm(dr), 1e-8)
    mag = jnp.deg2rad(cfg.ref_rot_deg)
    T_ref = T_gt.retract(dr * mag * jnp.asarray([1, 1, 1, 0.3, 0.3, 0.3]))

    img_ref = render_plane(texture, None, T_ref, camera, (size, size))
    img_qry = render_plane(texture, clutter, T_gt, camera, (size, size))
    img_qry = apply_nuisances(k_nui, img_qry, clutter, bcfg)

    uvp = jax.random.uniform(k_pts, (cfg.n_points, 2), minval=-0.45, maxval=0.45)
    p3d = jnp.concatenate([uvp, jnp.zeros((cfg.n_points, 1))], axis=1)
    return img_ref, img_qry, T_ref, T_gt, p3d, camera, d


def _perturbations(key, cfg: FeatureEvalConfig, d):
    kw_, kv_, km_ = jax.random.split(key, 3)
    wdir = jax.random.normal(kw_, (cfg.n_perturb, 3))
    wdir = wdir / jnp.maximum(jnp.linalg.norm(wdir, axis=1, keepdims=True), 1e-8)
    vdir = jax.random.normal(kv_, (cfg.n_perturb, 3))
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=1, keepdims=True), 1e-8)
    u = jax.random.uniform(km_, (cfg.n_perturb, 2))
    rmag = jnp.deg2rad(cfg.rot_deg[0]) * ((cfg.rot_deg[1] / cfg.rot_deg[0]) ** u[:, 0])
    tmag = d * cfg.trans_frac[0] * (
        (cfg.trans_frac[1] / cfg.trans_frac[0]) ** u[:, 1]
    )
    return jnp.concatenate([wdir * rmag[:, None], vdir * tmag[:, None]], axis=1)


def evaluate_extractor(
    extract: Callable,
    cfg: FeatureEvalConfig = FeatureEvalConfig(),
    align_cfg: Optional[AlignConfig] = None,
) -> dict:
    """Benchmark one extractor: ``extract(img) -> FeaturePyramid``.

    Returns dict with mean/median final rotation (deg) and translation
    errors, the initial errors for reference, and the convergence rate
    (final rot err < 1 deg AND < 25% of the initial rot err).
    """
    acfg = align_cfg or AlignConfig(num_iters=100, robust_c=1.0)
    key = jax.random.PRNGKey(cfg.seed)

    init_R, init_t, fin_R, fin_t = [], [], [], []
    for s in range(cfg.n_scenes):
        key, k_scene, k_pert = jax.random.split(key, 3)
        img_ref, img_qry, T_ref, T_gt, p3d, camera, d = make_eval_scene(
            k_scene, cfg
        )
        pyr_ref = extract(img_ref)
        pyr_qry = extract(img_qry)
        pmask = jnp.ones(p3d.shape[0], bool)
        f_ref, w_ref, v_ref = observe_points(pyr_ref, T_ref, camera, p3d, pmask)
        levels = build_level_data(pyr_qry, f_ref, w_ref, v_ref, p3d, pmask)

        for delta in _perturbations(k_pert, cfg, d):
            T0 = T_gt.retract(delta)
            dR0, dt0 = (T0 @ T_gt.inv()).magnitude()
            final, _ = align_pyramid(T0, levels, camera, acfg)
            dR1, dt1 = (final.T @ T_gt.inv()).magnitude()
            init_R.append(float(dR0))
            init_t.append(float(dt0))
            fin_R.append(float(dR1))
            fin_t.append(float(dt1))

    init_R, fin_R = np.asarray(init_R), np.asarray(fin_R)
    init_t, fin_t = np.asarray(init_t), np.asarray(fin_t)
    conv = (fin_R < 1.0) & (fin_R < 0.25 * np.maximum(init_R, 1e-6))
    return {
        "rot_err_mean": float(fin_R.mean()),
        "rot_err_median": float(np.median(fin_R)),
        "t_err_mean": float(fin_t.mean()),
        "t_err_median": float(np.median(fin_t)),
        "rot_init_mean": float(init_R.mean()),
        "t_init_mean": float(init_t.mean()),
        "convergence_rate": float(conv.mean()),
        "n": int(fin_R.size),
    }
