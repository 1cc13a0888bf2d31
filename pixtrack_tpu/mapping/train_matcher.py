"""Train the attentional matcher on synthetic correspondences.

SuperGlue's training recipe, rebuilt offline (the reference downloads
trained 'indoor' weights, run_reconstruction.py:41-50). Two data sources:

1. **Plane pairs** (``train_matcher``): render textured plane pairs with
   exact two-view geometry (train_basin's scene machinery), plant
   keypoints at plane points visible in both views, describe them with
   the PRODUCTION patch descriptor (mapping/detector.describe_keypoints —
   the matcher must fix THIS descriptor's confusions, not SuperPoint's),
   add unmatched distractor keypoints, and minimize the dual-softmax NLL
   of the ground-truth assignment. Measured limitation: mutual-NN + ratio
   is STRONG on these pairs even at 40 deg relative rotation (planar
   texture patches stay correlated), so this source alone does not teach
   the matcher anything NN cannot already do.

2. **Mesh-pair bank** (``build_mesh_pair_bank`` + ``train_matcher_on_bank``)
   — the deployment distribution: renders of textured cube objects on the
   SfM capture rig geometry, REAL detected keypoints (detect_and_describe,
   exactly as incremental_sfm runs it), and ground-truth assignments from
   depth-consistent reprojection. This is where mutual-NN actually breaks
   (repetitive face texture aliases under foreshortening at >=3-view
   baseline gaps — the measured cause of the mapper's wide-baseline
   failures), so it is the training source that matters for SfM.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.features.train_basin import (
    _look_at_w2c,
    random_texture,
    render_plane,
)
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.mapping.attention_matcher import (
    AttentionMatcher,
    MatcherConfig,
    assignment_log_probs,
    init_matcher,
)


@dataclasses.dataclass(frozen=True)
class MatcherTrainConfig:
    n_steps: int = 2000
    batch: int = 4
    size: int = 160
    tex_size: int = 192
    n_match: int = 96           # planted correspondences per pair
    n_distract: int = 32        # per-view unmatched keypoints
    max_rel_deg: float = 45.0   # relative-rotation range (wide baseline)
    jitter_px: float = 0.5      # keypoint localization noise
    lr: float = 2e-4
    log_every: int = 50
    seed: int = 0
    # bank-training augmentation (r2's 5-scene/370-pair run overfit scene
    # textures and failed the held-out gate, assets/negative/ — these fight
    # exactly that): independent random in-plane rotation of each view's
    # normalized keypoint frame (camera roll is a real nuisance; positional
    # reasoning must survive it) and descriptor noise + renormalization.
    aug_rotate: bool = True
    aug_desc_noise: float = 0.02


def make_pair(key, cfg: MatcherTrainConfig, camera: Camera):
    """One training pair; returns (img0, img1, kp0, kp1, valid_match,
    d0_extra, d1_extra) — all static shapes. kp arrays hold the planted
    matches first, then the distractors."""
    (k_tex, k_p0, k_r0, k_rel, k_pts, k_d0, k_d1, k_j) = jax.random.split(key, 8)
    size = cfg.size
    texture = random_texture(k_tex, cfg.tex_size)

    kd, kth, kph = jax.random.split(k_p0, 3)
    d = jax.random.uniform(kd, (), minval=1.3, maxval=1.9)
    th = jax.random.uniform(kth, (), minval=0.05, maxval=0.7)
    ph = jax.random.uniform(kph, (), minval=0.0, maxval=2 * np.pi)
    center = d * jnp.stack(
        [jnp.sin(th) * jnp.cos(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(th)]
    )
    roll0 = jax.random.uniform(k_r0, (), minval=-np.pi, maxval=np.pi)
    T0 = _look_at_w2c(center, roll0)

    # second view: random relative motion up to max_rel_deg
    dr = jax.random.normal(k_rel, (6,))
    dr = dr / jnp.maximum(jnp.linalg.norm(dr), 1e-8)
    mag = jnp.deg2rad(cfg.max_rel_deg) * jax.random.uniform(k_rel, ())
    T1 = T0.retract(dr * mag * jnp.asarray([1, 1, 1, 0.25, 0.25, 0.25]))

    img0 = render_plane(texture, None, T0, camera, (size, size))
    img1 = render_plane(texture, None, T1, camera, (size, size))

    # planted correspondences: plane points visible in both views
    uvp = jax.random.uniform(k_pts, (cfg.n_match, 2), minval=-0.45, maxval=0.45)
    p3d = jnp.concatenate([uvp, jnp.zeros((cfg.n_match, 1))], axis=1)
    kp0m, v0 = camera.world2image(T0, p3d)
    kp1m, v1 = camera.world2image(T1, p3d)
    inb = lambda k: (
        (k[:, 0] > 8) & (k[:, 0] < size - 9) & (k[:, 1] > 8) & (k[:, 1] < size - 9)
    )
    valid_match = v0 & v1 & inb(kp0m) & inb(kp1m)

    # localization jitter (detector noise)
    j0, j1 = jax.random.normal(k_j, (2, cfg.n_match, 2)) * cfg.jitter_px
    kp0m = kp0m + j0
    kp1m = kp1m + j1

    # distractors: random image locations (background / one-view-only)
    d0 = jax.random.uniform(
        k_d0, (cfg.n_distract, 2), minval=10.0, maxval=size - 11.0
    )
    d1 = jax.random.uniform(
        k_d1, (cfg.n_distract, 2), minval=10.0, maxval=size - 11.0
    )
    kp0 = jnp.concatenate([kp0m, d0], axis=0)
    kp1 = jnp.concatenate([kp1m, d1], axis=0)
    return img0, img1, kp0, kp1, valid_match


def make_batch(key, cfg: MatcherTrainConfig):
    """Host-callable batch generator (jitted internally). Returns arrays for
    the train step: descs, normalized kps, valid masks, gt assignment."""
    size = cfg.size
    camera = Camera.pinhole(
        size * 1.2, size * 1.2, (size - 1) / 2, (size - 1) / 2, size, size
    )
    from pixtrack_tpu.mapping.detector import _describe

    def one(k):
        img0, img1, kp0, kp1, vm = make_pair(k, cfg, camera)
        de0 = _describe(img0, kp0, 13, 2.0)
        de1 = _describe(img1, kp1, 13, 2.0)
        kn0 = kp0 / (size - 1) * 2.0 - 1.0
        kn1 = kp1 / (size - 1) * 2.0 - 1.0
        return de0, kn0, de1, kn1, vm

    return jax.vmap(one)(jax.random.split(key, cfg.batch))


def matcher_loss(logp, valid_match, n_match, n_total):
    """NLL of the GT assignment. Planted pair i <-> i when valid; every
    other keypoint (invalid plants + distractors) belongs to a dustbin."""
    B = logp.shape[0]
    idx = jnp.arange(n_match)
    diag = logp[:, idx, idx]                          # (B, n_match)
    pos = jnp.where(valid_match, diag, 0.0)
    n_pos = jnp.maximum(valid_match.sum(axis=1), 1)

    # unmatched: row dustbin for view-0 extras, col dustbin for view-1
    row_bin = logp[:, :n_total, n_total]              # (B, n_total)
    col_bin = logp[:, n_total, :n_total]
    unm0 = jnp.concatenate(
        [~valid_match, jnp.ones((B, n_total - n_match), bool)], axis=1
    )
    neg0 = jnp.where(unm0, row_bin, 0.0)
    neg1 = jnp.where(unm0, col_bin, 0.0)  # same planted validity by symmetry
    n_neg = jnp.maximum(unm0.sum(axis=1), 1)

    loss = -(pos.sum(1) / n_pos) - 0.5 * (
        neg0.sum(1) / n_neg + neg1.sum(1) / n_neg
    )
    return loss.mean()


def train_matcher(
    cfg: MatcherTrainConfig = MatcherTrainConfig(),
    mcfg: Optional[MatcherConfig] = None,
    params: Optional[dict] = None,
    callback=None,
):
    mcfg = mcfg or MatcherConfig()
    model, init_params = init_matcher(jax.random.PRNGKey(cfg.seed), mcfg)
    if params is None:
        params = init_params
    n_total = cfg.n_match + cfg.n_distract

    # warmup + cosine decay: a flat lr >= 1e-3 was measured to collapse the
    # assignment head to uniform scores (loss pinned at the dustbin
    # plateau); warmup keeps the early dual-softmax gradients bounded
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, warmup_steps=min(200, cfg.n_steps // 10),
        decay_steps=cfg.n_steps, end_value=0.05 * cfg.lr,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_data, k_next = jax.random.split(key)
        de0, kn0, de1, kn1, vm = make_batch(k_data, cfg)
        B = de0.shape[0]
        valid = jnp.ones((B, n_total), bool)

        def loss_fn(p):
            scores = model.apply(p, de0, kn0, valid, de1, kn1, valid)
            return matcher_loss(
                assignment_log_probs(scores), vm, cfg.n_match, n_total
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    t0 = time.time()
    for i in range(cfg.n_steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        if (i + 1) % cfg.log_every == 0 or i == 0:
            lv = float(loss)
            history.append((i + 1, lv))
            if callback:
                # params included so callers can checkpoint mid-train
                callback(i + 1, lv, params)
    jax.block_until_ready(params)
    return model, params, {"history": history, "seconds": time.time() - t0}


# --------------------------------------------------------------------------
# mesh-pair bank: the deployment distribution (SfM capture-rig pairs)
# --------------------------------------------------------------------------

def _random_cube_mesh(workdir, seed: int):
    """A textured cube with one distinct random tile per face (the same
    recipe as the SfM test rigs: a shared/periodic texture makes opposite
    faces alias — which is also exactly the nuisance the matcher must
    learn to reject via geometric context)."""
    import cv2
    import scipy.ndimage as ndi

    from pixtrack_tpu.mapping.mesh_render import load_obj

    d = workdir / f"cube_{seed}"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, (128, 192, 3))
    tex = ndi.gaussian_filter(tex, (rng.uniform(1.0, 3.0),) * 2 + (0,))
    tex = ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.uint8)
    cv2.imwrite(str(d / "tex.png"), tex)
    (d / "cube.mtl").write_text("newmtl m\nmap_Kd tex.png\n")
    s = 0.2
    v = [(x, y, z) for x in (-s, s) for y in (-s, s) for z in (-s, s)]
    faces = [  # (vertex quad, uv tile) per cube face
        ((0, 1, 3, 2), 0), ((4, 6, 7, 5), 1), ((0, 4, 5, 1), 2),
        ((2, 3, 7, 6), 3), ((0, 2, 6, 4), 4), ((1, 5, 7, 3), 5),
    ]
    lines = [f"mtllib cube.mtl\nusemtl m"]
    for x, y, z in v:
        lines.append(f"v {x} {y} {z}")
    uv_tiles = [(c / 3.0, r / 2.0) for r in range(2) for c in range(3)]
    for (u0, v0) in uv_tiles:
        for (du, dv) in ((0, 0), (1 / 3, 0), (1 / 3, 1 / 2), (0, 1 / 2)):
            lines.append(f"vt {u0 + du} {v0 + dv}")
    for fi, (quad, tile) in enumerate(faces):
        a, b, c, dd = (i + 1 for i in quad)
        t = tile * 4 + 1
        lines.append(f"f {a}/{t} {b}/{t + 1} {c}/{t + 2}")
        lines.append(f"f {a}/{t} {c}/{t + 2} {dd}/{t + 3}")
    (d / "cube.obj").write_text("\n".join(lines) + "\n")
    return load_obj(d / "cube.obj")


def build_mesh_pair_bank(
    workdir,
    n_scenes: int = 4,
    n_views: int = 18,
    res: int = 192,
    max_kp: int = 256,
    nms_radius: int = 1,
    min_deg: float = 8.0,
    max_deg: float = 52.0,
    gt_radius_px: float = 2.0,
    seed: int = 0,
    verbose: bool = False,
    rich_textures: bool = False,
    detector=None,
):
    """Precompute a training bank of real detected keypoints + descriptors
    + depth-verified GT assignments over wide-baseline mesh-render pairs.

    Geometry mirrors the SfM capture rig (ring with elevation wobble, 0.9
    radius, ~20 deg steps); detection/description is the production
    detect_and_describe with the mapper's settings. Returns a dict of
    static-shape arrays: desc0/1 (P, K, D) f32, kpn0/1 (P, K, 2) in
    [-1, 1], valid0/1 (P, K) bool, gt (P, K) int32 (-1 = unmatched),
    angle_deg (P,).

    ``rich_textures``: draw each cube face from the diverse family mix
    (mapping/textures.py) instead of the legacy blurred-noise family the
    r2 bank overfit. ``detector``: optional override with the
    detect_and_describe contract (e.g. mapping.default_detector() to bank
    learned-descriptor pairs).
    """
    import pathlib

    from pixtrack_tpu.mapping.detector import detect_and_describe
    from pixtrack_tpu.mapping.mesh_render import render_mesh
    from pixtrack_tpu.mapping.textures import rich_cube_mesh

    if detector is None:
        detector = detect_and_describe

    workdir = pathlib.Path(workdir)
    rng = np.random.default_rng(seed)
    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                            (res - 1) / 2, res, res)
    fx = fy = res * 1.1
    cx = cy = (res - 1) / 2

    P_desc0, P_desc1, P_kp0, P_kp1 = [], [], [], []
    P_v0, P_v1, P_gt, P_ang = [], [], [], []
    D = None
    for sc in range(n_scenes):
        mesh = (rich_cube_mesh(workdir, seed * 100 + sc) if rich_textures
                else _random_cube_mesh(workdir, seed * 100 + sc))
        views = []
        for i in range(n_views):
            ang = 2 * np.pi * i / n_views + rng.uniform(-0.04, 0.04)
            el = rng.uniform(0.15, 0.55)
            center = 0.9 * np.array(
                [np.sin(ang) * np.cos(el), np.sin(el), np.cos(ang) * np.cos(el)]
            )
            T = _look_at_w2c(jnp.asarray(center, jnp.float32),
                             rng.uniform(-0.3, 0.3))
            img, depth = render_mesh(mesh, T, camera, return_depth=True)
            kp, _, desc = detector(
                img, max_keypoints=max_kp, nms_radius=nms_radius
            )
            views.append((T, np.asarray(kp), np.asarray(desc), depth))
            D = desc.shape[-1]

        def pad(a, fill=0.0):
            out = np.full((max_kp,) + a.shape[1:], fill, np.float32)
            out[: len(a)] = a
            return out

        centers = [np.asarray(-(np.asarray(T.R).T @ np.asarray(T.t)))
                   for (T, _, _, _) in views]
        for i in range(n_views):
            for j in range(n_views):
                if i == j:
                    continue
                ci, cj = centers[i], centers[j]
                cosang = (ci @ cj) / (np.linalg.norm(ci) * np.linalg.norm(cj))
                ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
                if not (min_deg <= ang <= max_deg):
                    continue
                (Ti, kpi, dei, zi) = views[i]
                (Tj, kpj, dej, zj) = views[j]
                ni, nj = len(kpi), len(kpj)
                # backproject kp_i with its z-buffer depth
                xi = np.clip(np.round(kpi[:, 0]).astype(int), 0, res - 1)
                yi = np.clip(np.round(kpi[:, 1]).astype(int), 0, res - 1)
                z = zi[yi, xi]
                has_d = z > 0
                Xc = np.stack(
                    [(kpi[:, 0] - cx) / fx * z, (kpi[:, 1] - cy) / fy * z, z],
                    axis=-1,
                )
                Ri, ti = np.asarray(Ti.R), np.asarray(Ti.t)
                Xw = (Xc - ti) @ Ri
                uv, vis = camera.world2image(Tj, jnp.asarray(Xw, jnp.float32))
                uv, vis = np.asarray(uv), np.asarray(vis) & has_d
                # occlusion: depth in view j must agree with the z-buffer
                Rj, tj = np.asarray(Tj.R), np.asarray(Tj.t)
                zc_j = (Xw @ Rj.T + tj)[:, 2]
                xj = np.clip(np.round(uv[:, 0]).astype(int), 0, res - 1)
                yj = np.clip(np.round(uv[:, 1]).astype(int), 0, res - 1)
                zbuf_j = zj[yj, xj]
                vis &= (zbuf_j > 0) & (np.abs(zbuf_j - zc_j) < 0.04 * zc_j)
                # snap to nearest detected keypoint in view j
                gt = np.full(max_kp, -1, np.int32)
                if vis.any() and nj:
                    d2 = ((uv[:, None, :] - kpj[None, :, :]) ** 2).sum(-1)
                    d2[~vis] = np.inf
                    best = np.argmin(d2, axis=1)
                    bd = d2[np.arange(ni), best]
                    ok = bd <= gt_radius_px**2
                    # injectivity: nearer keypoint wins a contested target
                    order = np.argsort(bd)
                    taken = set()
                    for o in order:
                        if not ok[o] or int(best[o]) in taken:
                            continue
                        gt[o] = best[o]
                        taken.add(int(best[o]))
                if (gt >= 0).sum() < 12:
                    continue  # too little supervision in this pair
                kn = lambda kp: kp / (res - 1) * 2.0 - 1.0
                P_desc0.append(pad(dei))
                P_desc1.append(pad(dej))
                P_kp0.append(pad(kn(kpi)))
                P_kp1.append(pad(kn(kpj)))
                v0 = np.zeros(max_kp, bool); v0[:ni] = True
                v1 = np.zeros(max_kp, bool); v1[:nj] = True
                P_v0.append(v0)
                P_v1.append(v1)
                P_gt.append(gt)
                P_ang.append(ang)
        if verbose:
            print(f"bank scene {sc}: {len(P_gt)} pairs so far", flush=True)

    return {
        "desc0": np.stack(P_desc0), "desc1": np.stack(P_desc1),
        "kpn0": np.stack(P_kp0), "kpn1": np.stack(P_kp1),
        "valid0": np.stack(P_v0), "valid1": np.stack(P_v1),
        "gt": np.stack(P_gt), "angle_deg": np.asarray(P_ang, np.float32),
    }


def assignment_nll(logp, gt0, valid0, valid1):
    """NLL of an arbitrary GT assignment (generalizes matcher_loss beyond
    the diagonal layout). logp (N0+1, N1+1) dual-softmax log-probs; gt0
    (N0,) int32 index into view-1 keypoints or -1; valid masks."""
    N0 = gt0.shape[0]
    N1 = logp.shape[1] - 1
    matched = (gt0 >= 0) & valid0
    idx = jnp.clip(gt0, 0, N1 - 1)
    pos = jnp.where(matched, logp[jnp.arange(N0), idx], 0.0)
    n_pos = jnp.maximum(matched.sum(), 1)

    unm0 = valid0 & ~matched
    neg0 = jnp.where(unm0, logp[:N0, N1], 0.0)
    hit = jnp.zeros(N1, bool).at[idx].set(matched, mode="drop")
    unm1 = valid1 & ~hit
    neg1 = jnp.where(unm1, logp[N0, :N1], 0.0)
    return (
        -(pos.sum() / n_pos)
        - 0.5 * (neg0.sum() / jnp.maximum(unm0.sum(), 1)
                 + neg1.sum() / jnp.maximum(unm1.sum(), 1))
    )


def train_matcher_on_bank(
    bank: dict,
    cfg: MatcherTrainConfig = MatcherTrainConfig(),
    mcfg: Optional[MatcherConfig] = None,
    params: Optional[dict] = None,
    holdout_frac: float = 0.1,
    callback=None,
    scan_chunk: int = 0,
):
    """Train on a precomputed mesh-pair bank (build_mesh_pair_bank).
    Returns (model, params, info) where info includes the held-out NLL.

    Two data paths:
      - ``scan_chunk=0`` (default, CPU-friendly): the bank stays on the
        HOST; batches are sampled/augmented with numpy per step and
        shipped to the device.
      - ``scan_chunk=K>0`` (TPU): the bank is uploaded ONCE (descriptors
        as f16 — a 40-scene bank is ~1.8 GB), and each dispatch runs K
        training steps under ``lax.scan`` with on-device sampling and
        augmentation. Through the axon tunnel one dispatch costs ~0.4 s,
        so per-step host batching would spend more time on dispatch than
        on compute; chunking amortizes it K-fold."""
    mcfg = mcfg or MatcherConfig(desc_dim=bank["desc0"].shape[-1])
    model, init_params = init_matcher(jax.random.PRNGKey(cfg.seed), mcfg)
    if params is None:
        params = init_params

    P = bank["gt"].shape[0]
    n_hold = max(1, int(P * holdout_frac))
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(P)
    hold, tr = perm[:n_hold], perm[n_hold:]
    host = {k: np.asarray(v) for k, v in bank.items()}

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, warmup_steps=min(200, cfg.n_steps // 10),
        decay_steps=cfg.n_steps, end_value=0.05 * cfg.lr,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = optimizer.init(params)

    def sample_batch(idx, augment: bool):
        d0 = host["desc0"][idx].astype(np.float32)
        d1 = host["desc1"][idx].astype(np.float32)
        k0 = host["kpn0"][idx].astype(np.float32)
        k1 = host["kpn1"][idx].astype(np.float32)
        v0 = host["valid0"][idx]
        v1 = host["valid1"][idx]
        gt = host["gt"][idx]
        if augment:
            if cfg.aug_rotate:
                for karr in (k0, k1):  # independent per-view roll
                    th = rng.uniform(-np.pi, np.pi, size=len(idx))
                    ca, sa = np.cos(th), np.sin(th)
                    R = np.stack([np.stack([ca, -sa], -1),
                                  np.stack([sa, ca], -1)], -2)  # (B, 2, 2)
                    karr[:] = np.einsum("bij,bnj->bni", R, karr)
            if cfg.aug_desc_noise > 0:
                for darr in (d0, d1):
                    darr += rng.normal(0, cfg.aug_desc_noise, darr.shape)
                    darr /= np.clip(
                        np.linalg.norm(darr, axis=-1, keepdims=True), 1e-8, None
                    )
        return (jnp.asarray(d0), jnp.asarray(k0), jnp.asarray(v0),
                jnp.asarray(d1), jnp.asarray(k1), jnp.asarray(v1),
                jnp.asarray(gt))

    @jax.jit
    def step(params, opt_state, d0, k0, v0, d1, k1, v1, gt):
        def loss_fn(p):
            logp = assignment_log_probs(
                model.apply(p, d0, k0, v0, d1, k1, v1)
            )
            return jax.vmap(assignment_nll)(logp, gt, v0, v1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def chunk_nll(p, d0, k0, v0, d1, k1, v1, gt):
        logp = assignment_log_probs(model.apply(p, d0, k0, v0, d1, k1, v1))
        return jax.vmap(assignment_nll)(logp, gt, v0, v1).sum()

    def holdout_nll(p):
        total = 0.0
        for s in range(0, len(hold), cfg.batch):
            idx = hold[s: s + cfg.batch]
            if len(idx) < cfg.batch:  # pad to the jitted batch shape
                idx = np.concatenate([idx, hold[: cfg.batch - len(idx)]])
            total += float(chunk_nll(p, *sample_batch(idx, augment=False)))
        n_eval = -(-len(hold) // cfg.batch) * cfg.batch
        return total / n_eval

    history = []
    t0 = time.time()
    if scan_chunk > 0:
        # ---- device-resident path: upload once, K steps per dispatch ----
        dev = {
            "desc0": jnp.asarray(host["desc0"][tr], jnp.float16),
            "desc1": jnp.asarray(host["desc1"][tr], jnp.float16),
            "kpn0": jnp.asarray(host["kpn0"][tr], jnp.float32),
            "kpn1": jnp.asarray(host["kpn1"][tr], jnp.float32),
            "valid0": jnp.asarray(host["valid0"][tr]),
            "valid1": jnp.asarray(host["valid1"][tr]),
            "gt": jnp.asarray(host["gt"][tr]),
        }

        def dev_batch(key):
            k_i, k_r0, k_r1, k_n = jax.random.split(key, 4)
            idx = jax.random.randint(k_i, (cfg.batch,), 0, len(tr))
            d0 = dev["desc0"][idx].astype(jnp.float32)
            d1 = dev["desc1"][idx].astype(jnp.float32)
            k0 = dev["kpn0"][idx]
            k1 = dev["kpn1"][idx]
            if cfg.aug_rotate:
                def rot(karr, kk):
                    th = jax.random.uniform(
                        kk, (cfg.batch,), minval=-np.pi, maxval=np.pi
                    )
                    ca, sa = jnp.cos(th), jnp.sin(th)
                    R = jnp.stack([jnp.stack([ca, -sa], -1),
                                   jnp.stack([sa, ca], -1)], -2)
                    return jnp.einsum("bij,bnj->bni", R, karr)
                k0 = rot(k0, k_r0)
                k1 = rot(k1, k_r1)
            if cfg.aug_desc_noise > 0:
                kn0, kn1 = jax.random.split(k_n)
                def noisy(d, kk):
                    d = d + cfg.aug_desc_noise * jax.random.normal(
                        kk, d.shape, d.dtype
                    )
                    return d / jnp.clip(
                        jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8
                    )
                d0, d1 = noisy(d0, kn0), noisy(d1, kn1)
            return (d0, k0, dev["valid0"][idx],
                    d1, k1, dev["valid1"][idx], dev["gt"][idx])

        @jax.jit
        def chunk(params, opt_state, key):
            def body(carry, _):
                params, opt_state, key = carry
                k_b, key = jax.random.split(key)
                d0, k0, v0, d1, k1, v1, gt = dev_batch(k_b)

                def loss_fn(p):
                    logp = assignment_log_probs(
                        model.apply(p, d0, k0, v0, d1, k1, v1)
                    )
                    return jax.vmap(assignment_nll)(logp, gt, v0, v1).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key), loss

            (params, opt_state, key), losses = jax.lax.scan(
                body, (params, opt_state, key), None, length=scan_chunk
            )
            return params, opt_state, key, losses

        key = jax.random.PRNGKey(cfg.seed + 7)
        done = 0
        while done < cfg.n_steps:
            params, opt_state, key, losses = chunk(params, opt_state, key)
            done += scan_chunk
            lv = float(losses[-1])
            history.append((done, lv))
            if callback:
                callback(done, lv, params)
    else:
        for i in range(cfg.n_steps):
            idx = rng.integers(0, len(tr), cfg.batch)
            params, opt_state, loss = step(
                params, opt_state, *sample_batch(tr[idx], augment=True)
            )
            if (i + 1) % cfg.log_every == 0 or i == 0:
                lv = float(loss)
                history.append((i + 1, lv))
                if callback:
                    callback(i + 1, lv, params)
    h_nll = float(holdout_nll(params))
    return model, params, {
        "history": history, "holdout_nll": h_nll,
        "seconds": time.time() - t0, "n_pairs": int(P),
    }
