"""Train SuperPoint on synthetic geometry — the MagicPoint/SuperPoint recipe
rebuilt in JAX (no external data, no downloaded weights).

The reference's hloc stage runs SuperPoint with downloaded weights
(reference scripts/run_reconstruction.py:39-48; fetched by hloc at import
time — unreachable here). This trainer produces in-repo weights for
mapping/superpoint.py from first principles, following the published
two-stage idea compressed into one stage:

- **Detector** (MagicPoint role): random scenes of non-overlapping convex
  quadrilaterals and ellipses with exactly-known corner locations; the
  65-way cell classifier is trained with plain cross-entropy against the
  true corner cells (ellipses contribute no corners — pure negatives, the
  corner/no-corner contrast MagicPoint gets from its ellipse class).
- **Descriptor**: each scene is re-rendered under a random 4-point
  homography; the dense 1/8-resolution descriptor grids of the two views
  are trained with SuperPoint's hinge loss (positive pairs = cells whose
  centers correspond under the homography within 8 px).

Everything is static-shape and generated on device inside the jitted train
step (shape rasterization is closed-form half-plane/ellipse tests on the
pixel grid — no host data pipeline), so the loop runs MXU-bound on TPU.

Scene realism is deliberately minimal: the detector's job downstream is
corner-finding on textured object renders, and the nuisances that matter
(contrast, noise, blur) are sampled per scene. Homographic adaptation
(SuperPoint's pseudo-label self-training round) is out of scope — measured
repeatability against the production Harris detector is the acceptance
gate instead (tests/test_superpoint.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixtrack_tpu.features.handcrafted import gaussian_blur
from pixtrack_tpu.mapping.superpoint import SuperPointNet, init_superpoint


@dataclasses.dataclass(frozen=True)
class SPTrainConfig:
    n_steps: int = 3000
    batch: int = 8
    size: int = 120             # multiple of 8; 15x15 cells
    grid: int = 3               # grid x grid shape slots per scene
    p_drop_max: float = 0.0     # per-scene keep fraction ~ U(1-p_drop_max, 1)
    p_ellipse: float = 0.3      # fraction of slots drawn as ellipses
    max_warp: float = 0.15      # homography corner displacement (x size)
    noise: float = 0.06
    lr: float = 1e-3
    lambda_desc: float = 1.0    # hinge loss is already mean-normalized
    margin_pos: float = 1.0
    margin_neg: float = 0.2
    # textured-render label-bank mixing (homographic adaptation): how many
    # bank crops join each batch alongside the `batch` synthetic scenes.
    # 0 = pure MagicPoint (the r3 texture-blind failure mode).
    bank_batch: int = 8
    log_every: int = 50
    seed: int = 0


# --------------------------------------------------------------------------
# synthetic geometry scenes
# --------------------------------------------------------------------------

def random_scene(key, cfg: SPTrainConfig):
    """One scene: (img (S, S), corners (grid^2*4, 2) xy, corner_valid).

    Shapes live in disjoint grid cells (exact corner ground truth — no
    occlusion bookkeeping), each a convex quad (4 corners) or an ellipse
    (0 corners). Intensities, global contrast and additive noise are
    randomized; a light blur makes edges band-limited like real images."""
    S = cfg.size
    C = cfg.grid
    cell = S / C
    n = C * C
    (k_ang, k_rad, k_typ, k_gray, k_bg, k_noise, k_ell, k_blur, k_keep) = (
        jax.random.split(key, 9)
    )

    # convex quads: sheared + rotated parallelograms (angle-sorted random
    # radii look convex but are only star-shaped — the half-plane
    # rasterizer below would then draw the convex KERNEL and concave
    # vertices would be ghost corners off the drawn boundary; a linear map
    # of the unit square is convex by construction and stays CCW as long
    # as its determinant is positive). Size bounds keep every vertex
    # strictly inside its grid cell so ground truth needs no occlusion.
    k_wh, k_sh, k_rot = jax.random.split(k_ang, 3)
    wh = jax.random.uniform(k_wh, (n, 2), minval=0.40 * cell, maxval=0.62 * cell)
    sh = jax.random.uniform(k_sh, (n,), minval=-0.15 * cell, maxval=0.15 * cell)
    phi = jax.random.uniform(k_rot, (n,), minval=0.0, maxval=np.pi)
    square = jnp.asarray(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]]
    )  # CCW
    shear = jnp.stack(
        [
            jnp.stack([wh[:, 0], sh], axis=-1),
            jnp.stack([jnp.zeros(n), wh[:, 1]], axis=-1),
        ],
        axis=1,
    )  # (n, 2, 2), det = w*h > 0
    c_, s_ = jnp.cos(phi), jnp.sin(phi)
    rot = jnp.stack(
        [jnp.stack([c_, -s_], axis=-1), jnp.stack([s_, c_], axis=-1)], axis=1
    )
    M = rot @ shear  # (n, 2, 2), det > 0 keeps CCW
    cy, cx = jnp.divmod(jnp.arange(n), C)
    centers = jnp.stack(
        [(cx + 0.5) * cell, (cy + 0.5) * cell], axis=-1
    )  # (n, 2) xy
    verts = centers[:, None, :] + jnp.einsum("nij,kj->nki", M, square)

    is_ellipse = jax.random.uniform(k_typ, (n,)) < cfg.p_ellipse
    ell_ab = jax.random.uniform(
        k_ell, (n, 2), minval=0.18 * cell, maxval=0.42 * cell
    )
    ell_th = jax.random.uniform(k_ell, (n,), minval=0.0, maxval=np.pi)

    yy, xx = jnp.meshgrid(jnp.arange(S), jnp.arange(S), indexing="ij")
    P = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)  # (S, S, 2) xy

    def shape_mask(v, c, ab, th, ell):
        # convex quad: inside iff left of every directed edge (CCW by
        # construction from sorted angles)
        e = jnp.roll(v, -1, axis=0) - v                      # (4, 2)
        rel = P[None] - v[:, None, None, :]                  # (4, S, S, 2)
        cross = e[:, None, None, 0] * rel[..., 1] - e[:, None, None, 1] * rel[..., 0]
        quad_in = jnp.all(cross >= 0.0, axis=0)
        # ellipse: rotated implicit equation around the cell center
        d = P - c[None, None, :]
        ct, st = jnp.cos(th), jnp.sin(th)
        u = ct * d[..., 0] + st * d[..., 1]
        w = -st * d[..., 0] + ct * d[..., 1]
        ell_in = (u / ab[0]) ** 2 + (w / ab[1]) ** 2 <= 1.0
        return jnp.where(ell, ell_in, quad_in)

    masks = jax.vmap(shape_mask)(verts, centers, ell_ab, ell_th, is_ellipse)
    # density diversity (p_drop_max > 0): drop each slot with a per-SCENE
    # keep fraction so one training distribution spans sparse AND dense
    # corner layouts — a detector trained only at one density loses
    # repeatability at others (measured: grid=3-trained, rep 1.000 on
    # grid=3 eval but 0.768 vs Harris 0.832 on grid=5 eval — r3)
    k_frac, k_bern = jax.random.split(k_keep)
    keep_frac = jax.random.uniform(
        k_frac, (), minval=1.0 - cfg.p_drop_max, maxval=1.0
    )
    keep = jax.random.uniform(k_bern, (n,)) < keep_frac
    masks = masks & keep[:, None, None]
    is_ellipse = is_ellipse | ~keep  # dropped slots contribute no corners
    # enforce a minimum shape/background contrast: a near-invisible shape
    # would make its corner labels noise for the detector loss
    bg = jax.random.uniform(k_bg, (), minval=0.3, maxval=0.7)
    k_sign, k_mag = jax.random.split(k_gray)
    sign = jnp.where(jax.random.uniform(k_sign, (n,)) < 0.5, -1.0, 1.0)
    mag = jax.random.uniform(k_mag, (n,), minval=0.3, maxval=0.65)
    gray = jnp.clip(bg + sign * mag, 0.0, 1.0)
    img = bg + jnp.sum(masks * (gray - bg)[:, None, None], axis=0)
    img = gaussian_blur(img, 0.9)  # band-limit edges (kernel width is static)
    noise = cfg.noise * jax.random.uniform(k_blur, (), minval=0.5, maxval=1.5)
    img = img + noise * jax.random.normal(k_noise, (S, S))
    img = jnp.clip(img, 0.0, 1.0)

    corners = verts.reshape(n * 4, 2)
    corner_valid = jnp.repeat(~is_ellipse, 4)
    return img, corners, corner_valid


def random_homography(key, size: int, max_disp: float):
    """Random 4-point homography mapping view-0 pixels to view-1 pixels."""
    src = jnp.asarray(
        [[0.0, 0.0], [size - 1.0, 0.0], [size - 1.0, size - 1.0], [0.0, size - 1.0]]
    )
    dst = src + jax.random.uniform(
        key, (4, 2), minval=-max_disp * size, maxval=max_disp * size
    )

    # DLT: 8 equations in h = (h11..h32), h33 = 1
    def rows(s, d):
        x, y = s
        u, v = d
        return jnp.asarray(
            [
                [x, y, 1, 0, 0, 0, -u * x, -u * y],
                [0, 0, 0, x, y, 1, -v * x, -v * y],
            ]
        ), jnp.asarray([u, v])

    A, b = jax.vmap(rows)(src, dst)
    h = jnp.linalg.solve(A.reshape(8, 8), b.reshape(8))
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)


def apply_homography(H, pts):
    """pts (..., 2) xy -> warped xy."""
    q = pts @ H[:2, :2].T + H[:2, 2]
    z = pts @ H[2, :2] + H[2, 2]
    return q / z[..., None]


def warp_image(img, H, fill: float = 0.5):
    """Warp view-0 ``img`` (S, S) into view 1 under H (0 -> 1 pixels)."""
    from pixtrack_tpu.align.interpolate import interpolate_features

    S = img.shape[0]
    yy, xx = jnp.meshgrid(jnp.arange(S), jnp.arange(S), indexing="ij")
    tgt = jnp.stack([xx, yy], axis=-1).reshape(-1, 2).astype(jnp.float32)
    src = apply_homography(jnp.linalg.inv(H), tgt)
    vals, _, valid = interpolate_features(img[..., None], src, compute_grad=False)
    out = jnp.where(valid, vals[:, 0], fill)
    return out.reshape(S, S)


# --------------------------------------------------------------------------
# targets + losses
# --------------------------------------------------------------------------

def cell_labels(corners, valid, size: int):
    """(N, 2) xy corners -> (S/8, S/8) int labels in [0, 64]; 64 = dustbin.
    Later corners overwrite earlier ones sharing a cell (MagicPoint keeps
    one corner per cell)."""
    Sc = size // 8
    labels = jnp.full((Sc, Sc), 64, jnp.int32)
    xi = jnp.round(corners[:, 0]).astype(jnp.int32)
    yi = jnp.round(corners[:, 1]).astype(jnp.int32)
    inb = valid & (xi >= 0) & (xi < size) & (yi >= 0) & (yi < size)
    cx, cy = xi // 8, yi // 8
    cls = (yi % 8) * 8 + (xi % 8)
    # drop invalid rows by routing them out of bounds (scatter mode drop)
    cx = jnp.where(inb, cx, Sc + 1)
    return labels.at[cy, cx].set(cls, mode="drop")


def detector_loss(det_logits, labels):
    """Plain 65-way CE over all cells (B, Hc, Wc)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(det_logits, labels)
    return ce.mean()


def descriptor_loss(desc0, desc1, H, size: int, cfg: SPTrainConfig):
    """SuperPoint dense hinge loss between the 1/8-res descriptor grids of
    the two views. Positive pairs: cell centers within 8 px under H."""
    Sc = size // 8
    yy, xx = jnp.meshgrid(jnp.arange(Sc), jnp.arange(Sc), indexing="ij")
    cen = (
        jnp.stack([xx, yy], axis=-1).reshape(-1, 2).astype(jnp.float32) * 8.0
        + 3.5
    )
    cen_w = apply_homography(H, cen)                      # (M, 2) in view 1
    inb = (
        (cen_w[:, 0] >= 0) & (cen_w[:, 0] <= size - 1)
        & (cen_w[:, 1] >= 0) & (cen_w[:, 1] <= size - 1)
    )
    d2 = ((cen_w[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
    s = (d2 <= 64.0) & inb[:, None]                       # (M, M)

    d0 = desc0.reshape(-1, desc0.shape[-1])
    d1 = desc1.reshape(-1, desc1.shape[-1])
    sim = d0 @ d1.T                                        # (M, M) cosine
    pos = jnp.maximum(0.0, cfg.margin_pos - sim)
    neg = jnp.maximum(0.0, sim - cfg.margin_neg)
    # balance: positives are ~1/M of all pairs
    n_pos = jnp.maximum(s.sum(), 1)
    n_neg = jnp.maximum((~s).sum(), 1)
    return jnp.where(s, pos, 0.0).sum() / n_pos + jnp.where(
        ~s, neg, 0.0
    ).sum() / n_neg


# --------------------------------------------------------------------------
# training loop
# --------------------------------------------------------------------------

def make_batch(key, cfg: SPTrainConfig):
    """(img0, img1, labels0, labels1, H) batches, all device-generated."""

    def one(k):
        k_s, k_h = jax.random.split(k)
        img0, corners, cv = random_scene(k_s, cfg)
        H = random_homography(k_h, cfg.size, cfg.max_warp)
        img1 = warp_image(img0, H)
        lab0 = cell_labels(corners, cv, cfg.size)
        c1 = apply_homography(H, corners)
        lab1 = cell_labels(c1, cv, cfg.size)
        return img0, img1, lab0, lab1, H

    return jax.vmap(one)(jax.random.split(key, cfg.batch))


def build_texture_label_bank(
    n_scenes: int = 32, res: int = 160, n_views: int = 6, n_warps: int = 12,
    max_keypoints: int = 160, vote_frac: float = 0.5, max_warp: float = 0.12,
    nms_radius: int = 4, seed: int = 0, verbose: bool = False,
):
    """Homographic-adaptation labels on the DEPLOYMENT distribution.

    The MagicPoint stage trains on synthetic shapes with exact corner GT,
    but a detector trained only there is texture-blind (the r3 retraction:
    0.995 synthetic repeatability, ~7 keypoints on textured renders). This
    builds the SuperPoint stage-2 corpus: textured mesh renders
    (train_matcher._random_cube_mesh — the same procedural scenes the
    matcher bank and the SfM test rigs use) self-labeled by aggregating a
    base detector (the production multi-scale Harris) over ``n_warps``
    random homographies. A pixel becomes a label only when detections from
    ≥ ``vote_frac`` of the warps land within 2 px of it — cross-warp
    STABILITY is the label, so the trained head learns Harris's texture
    response minus its flicker.

    Returns dict: images (N, res, res) f32 grayscale in [0, 1],
    keypoints (N, K, 2) f32 xy, valid (N, K) bool.
    """
    import tempfile
    from pathlib import Path

    from pixtrack_tpu.geometry import Camera
    from pixtrack_tpu.mapping.detector import detect_keypoints
    from pixtrack_tpu.mapping.mesh_render import render_mesh
    from pixtrack_tpu.mapping.train_matcher import (
        _look_at_w2c,
        _random_cube_mesh,
    )

    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                            (res - 1) / 2, res, res)
    rng = np.random.default_rng(seed)
    images, kps, valids = [], [], []
    n_votes = n_warps + 1  # the unwarped image votes too
    with tempfile.TemporaryDirectory() as td:
        for sc in range(n_scenes):
            mesh = _random_cube_mesh(Path(td), seed * 1000 + sc)
            for v in range(n_views):
                ang = 2 * np.pi * v / n_views + rng.uniform(-0.05, 0.05)
                el = rng.uniform(0.15, 0.55)
                center = 0.9 * np.array(
                    [np.sin(ang) * np.cos(el), np.sin(el),
                     np.cos(ang) * np.cos(el)]
                )
                T = _look_at_w2c(jnp.asarray(center, jnp.float32),
                                 rng.uniform(-0.3, 0.3))
                img = render_mesh(mesh, T, camera)
                gray = (
                    np.asarray(img, np.float32) @ np.asarray(
                        [0.299, 0.587, 0.114], np.float32)
                ) / 255.0
                gray_j = jnp.asarray(gray)

                votes = np.zeros((res, res), np.float32)
                for w in range(n_votes):
                    if w == 0:
                        view, H = gray, None
                    else:
                        H = random_homography(
                            jax.random.PRNGKey(seed * 7919 + sc * 101
                                               + v * 13 + w),
                            res, max_warp,
                        )
                        view = np.asarray(warp_image(gray_j, H))
                    kp, _ = detect_keypoints(
                        (view * 255).astype(np.uint8),
                        max_keypoints=max_keypoints * 2,
                    )
                    kp = np.asarray(kp, np.float32)
                    if len(kp) == 0:
                        continue
                    if H is not None:
                        kp = np.asarray(apply_homography(
                            jnp.linalg.inv(H), jnp.asarray(kp)))
                    xi = np.round(kp[:, 0]).astype(int)
                    yi = np.round(kp[:, 1]).astype(int)
                    inb = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
                    votes[yi[inb], xi[inb]] += 1.0
                # 2 px cluster tolerance: 5x5 box-sum, then 1-px NMS
                import scipy.ndimage as ndi

                acc = ndi.uniform_filter(votes, size=5) * 25.0
                local_max = acc == ndi.maximum_filter(
                    acc, size=2 * nms_radius + 1)
                stable = local_max & (acc >= vote_frac * n_votes)
                ys, xs = np.nonzero(stable)
                order = np.argsort(-acc[ys, xs])[:max_keypoints]
                k = np.stack([xs[order], ys[order]], axis=-1).astype(
                    np.float32)
                pad = np.zeros((max_keypoints, 2), np.float32)
                val = np.zeros(max_keypoints, bool)
                pad[: len(k)] = k
                val[: len(k)] = True
                images.append(gray)
                kps.append(pad)
                valids.append(val)
            if verbose:
                print(f"bank scene {sc + 1}/{n_scenes}: "
                      f"{int(valids[-1].sum())} stable labels in last view",
                      flush=True)
    return {
        "images": np.stack(images),
        "keypoints": np.stack(kps),
        "valid": np.stack(valids),
    }


def make_bank_batch(key, cfg: SPTrainConfig, images, keypoints, valid):
    """Batch of (img0, img1, labels0, labels1, H) drawn from a texture
    label bank: random crop to ``cfg.size``, photometric jitter, random
    homography second view — same tuple format as ``make_batch`` so both
    sources concatenate into one train step."""
    images = jnp.asarray(images, jnp.float32)
    keypoints = jnp.asarray(keypoints, jnp.float32)
    valid = jnp.asarray(valid)
    N, R, _ = images.shape
    S = cfg.size

    def one(k):
        k_i, k_c, k_b, k_n, k_h = jax.random.split(k, 5)
        idx = jax.random.randint(k_i, (), 0, N)
        img_full = images[idx]
        kp = keypoints[idx]
        kv = valid[idx]
        off = jax.random.randint(k_c, (2,), 0, R - S + 1)  # (x0, y0)
        img0 = jax.lax.dynamic_slice(img_full, (off[1], off[0]), (S, S))
        kp = kp - off[None, :].astype(jnp.float32)
        kv = (
            kv & (kp[:, 0] >= 0) & (kp[:, 0] <= S - 1)
            & (kp[:, 1] >= 0) & (kp[:, 1] <= S - 1)
        )
        # photometric jitter: contrast/brightness/noise
        k_g, k_o = jax.random.split(k_b)
        gain = jax.random.uniform(k_g, (), minval=0.7, maxval=1.3)
        bias = jax.random.uniform(k_o, (), minval=-0.15, maxval=0.15)
        img0 = jnp.clip(img0 * gain + bias, 0.0, 1.0)
        img0 = jnp.clip(
            img0 + cfg.noise * jax.random.normal(k_n, (S, S)), 0.0, 1.0
        )
        H = random_homography(k_h, S, cfg.max_warp)
        img1 = warp_image(img0, H)
        lab0 = cell_labels(kp, kv, S)
        lab1 = cell_labels(apply_homography(H, kp), kv, S)
        return img0, img1, lab0, lab1, H

    return jax.vmap(one)(jax.random.split(key, cfg.bank_batch))


def train_superpoint(
    cfg: SPTrainConfig = SPTrainConfig(),
    params: Optional[dict] = None,
    callback=None,
    bank: Optional[dict] = None,
):
    model, init_params = init_superpoint(
        jax.random.PRNGKey(cfg.seed), cfg.size, cfg.size
    )
    if params is None:
        params = init_params

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    opt_state = optimizer.init(params)

    if bank is not None and cfg.bank_batch > 0:
        bank_dev = (
            jnp.asarray(bank["images"], jnp.float32),
            jnp.asarray(bank["keypoints"], jnp.float32),
            jnp.asarray(bank["valid"]),
        )
    else:
        bank_dev = None

    @jax.jit
    def step(params, opt_state, key):
        k_data, k_bank, k_next = jax.random.split(key, 3)
        batch = make_batch(k_data, cfg)
        if bank_dev is not None:
            bb = make_bank_batch(k_bank, cfg, *bank_dev)
            batch = tuple(
                jnp.concatenate([a, b], axis=0) for a, b in zip(batch, bb)
            )
        img0, img1, lab0, lab1, H = batch

        def loss_fn(p):
            det0, desc0 = model.apply(p, img0[..., None])
            det1, desc1 = model.apply(p, img1[..., None])
            l_det = detector_loss(det0, lab0) + detector_loss(det1, lab1)
            l_desc = jax.vmap(
                lambda a, b, h: descriptor_loss(a, b, h, cfg.size, cfg)
            )(desc0, desc1, H).mean()
            return l_det + cfg.lambda_desc * l_desc

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, k_next

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    t0 = time.time()
    for i in range(cfg.n_steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        # the final step always lands in history, so history[-1] is the
        # true final loss regardless of n_steps % log_every
        if (i + 1) % cfg.log_every == 0 or i == 0 or i + 1 == cfg.n_steps:
            lv = float(loss)
            history.append((i + 1, lv))
            if callback:
                # params included so callers can checkpoint mid-train
                callback(i + 1, lv, params)
    jax.block_until_ready(params)
    return model, params, {"history": history, "seconds": time.time() - t0}


# --------------------------------------------------------------------------
# weights IO + evaluation
# --------------------------------------------------------------------------

def save_superpoint_weights(path, params) -> None:
    import json

    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    arrays = {"/".join(map(str, k)): np.asarray(v) for k, v in flat.items()}
    meta = {"keys": list(arrays)}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_superpoint_weights(path):
    import json

    from flax.traverse_util import unflatten_dict

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    return unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(data[k]) for k in meta["keys"]}
    )


def repeatability(
    params, n_pairs: int = 6, size: int = 120, max_warp: float = 0.12,
    max_keypoints: int = 256, tol_px: float = 3.0, seed: int = 77,
    detector: str = "superpoint", grid: int = 5,
):
    """Detector repeatability under homography on held-out synthetic scenes:
    fraction of view-0 keypoints whose warp lands within ``tol_px`` of a
    view-1 keypoint. ``detector``: 'superpoint' (params) or 'harris' (the
    production corner detector, as the baseline).

    ``grid=5`` makes the held-out scenes DENSER than the training
    distribution (25 shape slots = up to ~70 true corners vs 9/25 at the
    training grid=3): the acceptance gate counts fired keypoints, and at
    grid=3 six pairs top out near ~150 true corners, below the >200 bar
    even for a perfect detector (measured: rep 1.000, 147 fired,
    rejected — r3 first run)."""
    from pixtrack_tpu.mapping.detector import detect_keypoints
    from pixtrack_tpu.mapping.superpoint import extract_superpoint

    cfg = SPTrainConfig(size=size, max_warp=max_warp, grid=grid)
    rep, counts = [], []
    for s in range(n_pairs):
        key = jax.random.PRNGKey(seed + s)
        k_s, k_h = jax.random.split(key)
        img0, _, _ = random_scene(k_s, cfg)
        H = random_homography(k_h, size, max_warp)
        img1 = warp_image(img0, H)
        a0 = (np.asarray(img0) * 255).astype(np.uint8)
        a1 = (np.asarray(img1) * 255).astype(np.uint8)
        if detector == "superpoint":
            kp0, _, _ = extract_superpoint(params, a0, max_keypoints)
            kp1, _, _ = extract_superpoint(params, a1, max_keypoints)
        else:
            kp0, _ = detect_keypoints(a0, max_keypoints=max_keypoints)
            kp1, _ = detect_keypoints(a1, max_keypoints=max_keypoints)
        if len(kp0) == 0 or len(kp1) == 0:
            rep.append(0.0)
            counts.append(0)
            continue
        w0 = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(kp0)))
        inb = (
            (w0[:, 0] >= 0) & (w0[:, 0] <= size - 1)
            & (w0[:, 1] >= 0) & (w0[:, 1] <= size - 1)
        )
        if inb.sum() == 0:
            rep.append(0.0)
            counts.append(0)
            continue
        d = np.linalg.norm(w0[inb][:, None, :] - kp1[None, :, :], axis=-1)
        rep.append(float((d.min(axis=1) <= tol_px).mean()))
        counts.append(int(inb.sum()))
    return float(np.mean(rep)), counts


def mesh_repeatability(
    params, n_scenes: int = 4, res: int = 192, max_keypoints: int = 512,
    tol_px: float = 3.0, seed: int = 500, baseline_deg: float = 17.0,
    detector: str = "superpoint",
):
    """Detector repeatability + density on the DEPLOYMENT distribution:
    textured mesh renders under real viewpoint change, correspondences
    verified through the GT depth buffer (not synthetic homographies).

    Why this gate exists: the r3 grid=5 checkpoint scored 0.995 on the
    synthetic homography gate yet fired only ~20 keypoints on textured
    cube renders (Harris: ~270) and collapsed the 10-view arc
    reconstruction to 1/10 registered images — keypoint DENSITY on
    texture is invisible to a shapes-only gate. A checkpoint may only be
    promoted to the production ``--detector auto`` slot when it passes
    BOTH gates (scripts_dev/train_superpoint_run.py).

    Returns ``(repeatability, counts)``: mean fraction of view-0
    keypoints whose depth-reprojection lands within ``tol_px`` of a
    view-1 keypoint (over co-visible keypoints), and the per-pair fired
    keypoint counts in view 0.
    """
    import tempfile
    from pathlib import Path

    from pixtrack_tpu.geometry import Camera
    from pixtrack_tpu.mapping.detector import detect_keypoints
    from pixtrack_tpu.mapping.mesh_render import render_mesh
    from pixtrack_tpu.mapping.superpoint import extract_superpoint
    from pixtrack_tpu.mapping.train_matcher import (
        _look_at_w2c,
        _random_cube_mesh,
    )

    camera = Camera.pinhole(res * 1.1, res * 1.1, (res - 1) / 2,
                            (res - 1) / 2, res, res)
    fx = fy = res * 1.1
    cx = cy = (res - 1) / 2
    rng = np.random.default_rng(seed)
    rep, counts = [], []
    with tempfile.TemporaryDirectory() as td:
        for sc in range(n_scenes):
            mesh = _random_cube_mesh(Path(td), seed + sc)
            views = []
            for i in range(2):
                ang = np.deg2rad(baseline_deg) * i + rng.uniform(-0.03, 0.03)
                el = 0.35 + 0.1 * i
                center = 0.9 * np.array(
                    [np.sin(ang) * np.cos(el), np.sin(el),
                     np.cos(ang) * np.cos(el)]
                )
                T = _look_at_w2c(jnp.asarray(center, jnp.float32), 0.0)
                img, depth = render_mesh(mesh, T, camera, return_depth=True)
                if detector == "superpoint":
                    kp, _, _ = extract_superpoint(params, img, max_keypoints)
                else:
                    kp, _ = detect_keypoints(img, max_keypoints=max_keypoints)
                views.append((T, np.asarray(kp), np.asarray(depth)))
            (T0, kp0, dep0), (T1, kp1, dep1) = views
            counts.append(len(kp0))
            if len(kp0) == 0 or len(kp1) == 0:
                rep.append(0.0)
                continue
            # backproject view-0 keypoints through the depth buffer
            xi = np.clip(np.round(kp0[:, 0]).astype(int), 0, res - 1)
            yi = np.clip(np.round(kp0[:, 1]).astype(int), 0, res - 1)
            z = dep0[yi, xi]
            has_depth = z > 0
            Xc = np.stack(
                [(kp0[:, 0] - cx) / fx * z, (kp0[:, 1] - cy) / fy * z, z], -1
            )
            R0, t0 = np.asarray(T0.R), np.asarray(T0.t)
            Xw = (Xc - t0) @ R0
            uv, vis = camera.world2image(T1, jnp.asarray(Xw, jnp.float32))
            uv, vis = np.asarray(uv), np.asarray(vis) & has_depth
            # occlusion check against view-1's depth buffer
            R1, t1 = np.asarray(T1.R), np.asarray(T1.t)
            zc1 = (Xw @ R1.T + t1)[:, 2]
            xj = np.clip(np.round(uv[:, 0]).astype(int), 0, res - 1)
            yj = np.clip(np.round(uv[:, 1]).astype(int), 0, res - 1)
            zb1 = dep1[yj, xj]
            vis &= (zb1 > 0) & (np.abs(zb1 - zc1) < 0.03 * np.abs(zc1))
            if vis.sum() == 0:
                rep.append(0.0)
                continue
            d = np.linalg.norm(
                uv[vis][:, None, :] - kp1[None, :, :], axis=-1
            )
            rep.append(float((d.min(axis=1) <= tol_px).mean()))
    return float(np.mean(rep)), counts
