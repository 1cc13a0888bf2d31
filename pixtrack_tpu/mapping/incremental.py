"""Incremental SfM from UNPOSED images: the COLMAP-mapper role.

The reference's first reconstruction runs the COLMAP incremental mapper
under hloc/PixSfM (scripts/run_reconstruction.py:52-61, C++/Ceres). This is
the TPU-first equivalent for the single-camera object rigs the pipeline
feeds it: every RANSAC is a *hypothesis-batched* JAX program (hundreds of
minimal solves as one vmapped SVD + one dense scoring pass — no per-sample
Python loop), pose polish is a jitted Gauss-Newton on reprojection
residuals, and the final assembly reuses the batched-DLT multi-view
triangulator (mapping/triangulate.py).

Algorithm (standard incremental pipeline):
  1. detect + mutual-ratio match all pairs (mapping/detector, matcher);
  2. init pair = most matches; essential-matrix RANSAC (8-point, Sampson
     scoring) -> decompose -> chirality vote;
  3. triangulate the init pair's tracks;
  4. register remaining images by 2D-3D PnP RANSAC (DLT-6pt) + GN polish,
     best-supported image first;
  5. after each registration: triangulate newly-completed tracks; periodic
     resection-intersection refinement (re-polish every pose, re-DLT every
     track) — the lightweight BA;
  6. assemble a SceneModel via triangulate_scene.

Deltas vs COLMAP (documented): single shared camera, intrinsics fixed (the
caller supplies them, e.g. infer_camera_from_image's f = 1.2 * max(w, h),
matching pycolmap's prior), no vocabulary-tree retrieval (exhaustive pairs,
like the reference's pairs_from_exhaustive).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.rotation import so3_hat
from pixtrack_tpu.sfm import colmap_io
from pixtrack_tpu.sfm.scene import SceneModel




def _f32_precision(fn):
    """TPU matmuls default to bf16; epipolar/PnP scoring needs f32 (measured:
    a 4.7deg CPU estimate degrades to 19.6deg on TPU without this)."""
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped

# ---------------------------------------------------------------------------
# Essential matrix: batched 8-point + Sampson RANSAC
# ---------------------------------------------------------------------------

def _eight_point(p0, p1):
    """(B, 8, 2) normalized correspondences -> (B, 3, 3) essential candidates."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    one = jnp.ones_like(x0)
    # rows of the epipolar constraint x1^T E x0 = 0
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], axis=-1
    )  # (B, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[..., -1, :].reshape(-1, 3, 3)
    # project to the essential manifold: singular values (1, 1, 0)
    u, s, vt2 = jnp.linalg.svd(E)
    sv = jnp.stack([jnp.ones_like(s[..., 0]), jnp.ones_like(s[..., 0]),
                    jnp.zeros_like(s[..., 0])], axis=-1)
    return u @ (sv[..., None] * vt2)


def _sampson(E, p0, p1, eps=1e-12):
    """Squared Sampson distance. E (B, 3, 3), p0/p1 (N, 2) -> (B, N)."""
    x0 = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1))], axis=1)  # (N, 3)
    x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
    Ex0 = jnp.einsum("bij,nj->bni", E, x0)
    Etx1 = jnp.einsum("bji,nj->bni", E, x1)
    x1Ex0 = jnp.einsum("ni,bni->bn", x1, Ex0)
    denom = (
        Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2
        + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    )
    return x1Ex0**2 / (denom + eps)


def _eight_point_weighted(p0, p1, w):
    """Least-squares E from ALL weighted correspondences (N >= 8)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    one = jnp.ones_like(x0)
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], axis=-1
    ) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0])) @ vt2


@_f32_precision
@functools.partial(jax.jit, static_argnames=("n_hyp", "lo_iters"))
def _essential_ransac(p0, p1, key, n_hyp: int = 4096, thresh: float = 1e-5,
                      lo_iters: int = 3):
    """Hypothesis-batched 8-point RANSAC + local-optimization refits.

    n_hyp must cover low inlier ratios: at 40% inliers, P(clean 8-draw) ~
    0.07%, so thousands of (cheap, batched) hypotheses are required.
    Each LO iteration refits E by weighted least squares on the current
    inlier set and re-scores — recovers full accuracy from a barely-clean
    minimal draw."""
    N = p0.shape[0]
    idx = jax.random.randint(key, (n_hyp, 8), 0, N)
    E = _eight_point(p0[idx], p1[idx])
    d = _sampson(E, p0, p1)
    inl = d < thresh
    scores = inl.sum(axis=1)
    best = jnp.argmax(scores)
    E_best, inl_best = E[best], inl[best]
    for _ in range(lo_iters):
        E_best = _eight_point_weighted(p0, p1, inl_best.astype(jnp.float32))
        d = _sampson(E_best[None], p0, p1)[0]
        inl_best = d < thresh
    return E_best, inl_best, inl_best.sum()


def _four_point_h(p0, p1):
    """(B, 4, 2) correspondences -> (B, 3, 3) homographies (DLT)."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    one = jnp.ones_like(x0)
    zero = jnp.zeros_like(x0)
    r1 = jnp.stack([x0, y0, one, zero, zero, zero,
                    -x1 * x0, -x1 * y0, -x1], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x0, y0, one,
                    -y1 * x0, -y1 * y0, -y1], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., -1, :].reshape(-1, 3, 3)


def _h_transfer(H, p0, p1, eps=1e-9):
    """Symmetric-ish transfer error (forward only): |H p0 - p1|^2, (B, N)."""
    x0 = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1))], axis=1)
    Hx = jnp.einsum("bij,nj->bni", H, x0)
    uv = Hx[..., :2] / jnp.where(jnp.abs(Hx[..., 2:]) < eps, eps, Hx[..., 2:])
    return jnp.sum((uv - p1[None]) ** 2, axis=-1)


@_f32_precision
@functools.partial(jax.jit, static_argnames=("n_hyp", "lo_iters"))
def _homography_ransac(p0, p1, key, n_hyp: int = 2048, thresh: float = 1e-5,
                       lo_iters: int = 2):
    N = p0.shape[0]
    idx = jax.random.randint(key, (n_hyp, 4), 0, N)
    H = _four_point_h(p0[idx], p1[idx])
    d = _h_transfer(H, p0, p1)
    inl = d < thresh
    best = jnp.argmax(inl.sum(axis=1))
    H_best, inl_best = H[best], inl[best]
    for _ in range(lo_iters):
        # weighted LS refit on inliers
        w = inl_best.astype(jnp.float32)
        x0b, y0b = p0[:, 0], p0[:, 1]
        x1b, y1b = p1[:, 0], p1[:, 1]
        one = jnp.ones_like(x0b)
        zero = jnp.zeros_like(x0b)
        r1 = jnp.stack([x0b, y0b, one, zero, zero, zero,
                        -x1b * x0b, -x1b * y0b, -x1b], axis=-1) * w[:, None]
        r2 = jnp.stack([zero, zero, zero, x0b, y0b, one,
                        -y1b * x0b, -y1b * y0b, -y1b], axis=-1) * w[:, None]
        A = jnp.concatenate([r1, r2], axis=0)
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        H_best = vt[-1].reshape(3, 3)
        inl_best = _h_transfer(H_best[None], p0, p1)[0] < thresh
    return H_best, inl_best, inl_best.sum()


def decompose_homography(H: np.ndarray):
    """Calibrated homography -> up to 8 (R, t, n) (Faugeras/Malis SVD method).

    H maps normalized coords cam0 -> cam1 for a plane n^T x = d (cam0 frame):
    H ~ R + t n^T / d. Returns candidate rigid motions with |t| unnormalized
    by d (scale-free, like the essential path)."""
    H = np.asarray(H, np.float64)
    U, S, Vt = np.linalg.svd(H)
    d1, d2, d3 = S
    if d2 < 1e-12:
        return []
    H = H / d2
    d1, d3 = d1 / d2, d3 / d2
    s = np.linalg.det(U) * np.linalg.det(Vt)
    out = []
    if abs(d1 - d3) < 1e-9:  # pure rotation (degenerate plane at infinity)
        R = s * U @ Vt
        return [(R, np.zeros(3), np.array([0.0, 0.0, 1.0]))]
    x1 = np.sqrt(max((d1**2 - 1.0) / (d1**2 - d3**2), 0.0))
    x3 = np.sqrt(max((1.0 - d3**2) / (d1**2 - d3**2), 0.0))
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            n_p = np.array([e1 * x1, 0.0, e3 * x3])
            # d' > 0 family
            sin_t = (d1 - d3) * e1 * x1 * e3 * x3
            cos_t = d1 * x3**2 + d3 * x1**2
            Rp = np.array([[cos_t, 0, -sin_t], [0, 1, 0], [sin_t, 0, cos_t]])
            tp = (d1 - d3) * np.array([e1 * x1, 0.0, -e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            n = Vt.T @ n_p
            if n[2] < 0:  # plane normal faces the camera
                n, t = -n, -t
            out.append((R, t, n))
            # d' < 0 family
            sin_t2 = (d1 + d3) * e1 * x1 * e3 * x3
            cos_t2 = d3 * x1**2 - d1 * x3**2
            Rp2 = np.array([[cos_t2, 0, sin_t2], [0, -1, 0], [sin_t2, 0, -cos_t2]])
            tp2 = (d1 + d3) * np.array([e1 * x1, 0.0, e3 * x3])
            R2 = s * U @ Rp2 @ Vt
            t2 = U @ tp2
            n2 = Vt.T @ n_p
            if n2[2] < 0:
                n2, t2 = -n2, -t2
            out.append((R2, t2, n2))
    return out


def _triangulate_pair(R, t, p0, p1):
    """Midpoint-free two-view DLT in normalized coords. Returns (N, 3) in
    cam0 frame and the two depth arrays."""
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.concatenate([R, t[:, None]], axis=1)

    def tri(u0, u1):
        A = jnp.stack(
            [
                u0[0] * P0[2] - P0[0],
                u0[1] * P0[2] - P0[1],
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    X = jax.vmap(tri)(p0, p1)
    z0 = X[:, 2]
    z1 = (R @ X.T + t[:, None])[2]
    return X, z0, z1


def estimate_relative_pose(
    p0n: np.ndarray, p1n: np.ndarray, key, n_hyp: int = 4096,
    thresh_px: float = 2.0, focal: float = 1.0,
    return_candidates: bool = False,
):
    """Two-view relative pose (cam0 -> cam1, unit baseline) from normalized
    correspondences, via essential RANSAC + cheirality vote over the four
    (R, t) decompositions. Returns (T_0to1, inlier mask).

    ``thresh_px`` is the inlier gate in PIXELS, converted to the squared
    Sampson units the scoring uses via ``focal`` — a fixed normalized
    threshold silently becomes sub-pixel-strict at long focals (observed:
    zero inliers at f=280 with the old 1e-5 default)."""
    p0 = jnp.asarray(p0n, jnp.float32)
    p1 = jnp.asarray(p1n, jnp.float32)
    thresh = (thresh_px / focal) ** 2
    kE, kH = jax.random.split(key)

    # Model A: essential matrix (general scenes)
    E, inlE, _ = _essential_ransac(p0, p1, kE, n_hyp=n_hyp, thresh=thresh)
    u, _, vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Rs = [u @ W @ vt, u @ W.T @ vt]
    Rs = [R * jnp.sign(jnp.linalg.det(R)) for R in Rs]
    candidates = [
        (np.asarray(R, np.float64), np.asarray(s * u[:, 2], np.float64), inlE)
        for R in Rs for s in (1.0, -1.0)
    ]

    # Model B: homography (shallow / near-planar objects — the 8-point's
    # degenerate case, where a small textured object at distance lives;
    # observed: a correct E simply cannot be recovered from such pairs)
    Hm, inlH, _ = _homography_ransac(p0, p1, kH, thresh=thresh)
    for (R, t, n) in decompose_homography(np.asarray(Hm)):
        if np.linalg.norm(t) > 1e-6:
            # BOTH translation signs: the homography decomposition carries a
            # (t, n) <-> (-t, -n) sign ambiguity, and the branch paired with
            # the wrong sign fails chirality wholesale. Measured on the cube
            # rig: the CORRECT rotation (1-2 deg error) sat in the list with
            # score 0 while a wrong 18-20-deg branch won — the root cause of
            # the mapper's systematic per-link rotation bias.
            candidates.append((R, t, inlH))
            candidates.append((R, -t, inlH))

    # chirality + reprojection vote over the union of candidates: triangulate
    # with each motion, count inliers that land in front of both cameras AND
    # reproject within threshold into image 1
    scored = []
    for (R, t, inl) in candidates:
        tn = t / max(np.linalg.norm(t), 1e-12)
        Rj = jnp.asarray(R, jnp.float32)
        tj = jnp.asarray(tn, jnp.float32)
        X, z0, z1 = _triangulate_pair(Rj, tj, p0, p1)
        x1 = (Rj @ X.T + tj[:, None]).T
        uv1 = x1[:, :2] / jnp.where(jnp.abs(x1[:, 2:]) < 1e-9, 1e-9, x1[:, 2:])
        reproj_ok = jnp.sum((uv1 - p1) ** 2, axis=1) < thresh
        score = int(jnp.sum((z0 > 0) & (z1 > 0) & reproj_ok & inl))
        scored.append((score, R, tn, inl))
    scored.sort(key=lambda s: -s[0])
    best_score = scored[0][0]

    def polish(R, tn, inl):
        T = Pose.from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(tn, jnp.float32))
        # Maximum-likelihood polish: Gauss-Newton directly on the SAMPSON
        # error over (R, t) — 5 true DOF, no structure in the loop. The
        # algebraic 8-point (and alternating triangulate-refine schemes) are
        # biased ~15 deg for narrow-baseline object pairs at 1px noise;
        # Sampson-GN recovers the statistically attainable accuracy.
        return refine_relative_pose_sampson(T, p0, p1, jnp.asarray(inl, jnp.float32))

    if not return_candidates:
        _, R, tn, inl = scored[0]
        return polish(R, tn, inl), np.asarray(inl)

    # Near-planar pairs: the homography decomposition is TWO-fold ambiguous
    # and both branches (plus their E shadows) reproject perfectly — a
    # single pair cannot decide. Return every near-best, rotationally
    # distinct candidate (polished); the caller disambiguates with graph
    # (triangle) consistency.
    out = []
    for (score, R, tn, inl) in scored:
        if score < 0.7 * max(best_score, 1):
            continue
        dup = False
        for (_, T_prev, _) in out:
            c = (np.trace(np.asarray(T_prev.R) @ R.T) - 1) / 2
            if np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0:
                dup = True
                break
        if not dup:
            out.append((score, polish(R, tn, inl), np.asarray(inl)))
        if len(out) == 4:
            break
    return out


@_f32_precision
@functools.partial(jax.jit, static_argnames=("iters", "damping"))
def refine_relative_pose_sampson(T01: Pose, p0, p1, w, iters: int = 30,
                                 damping: float = 1e-4):
    """GN on sum w * sampson^2 over a left se(3) delta of T01; translation
    renormalized to the unit-baseline gauge each step (the 6th DOF is pure
    gauge and the damping absorbs it)."""

    def residuals(delta, T):
        Tn = T.retract(delta)
        tx = so3_hat(Tn.t[None])[0]
        E = tx @ Tn.R
        x0 = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1))], axis=1)
        x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
        Ex0 = x0 @ E.T
        Etx1 = x1 @ E
        num = jnp.sum(x1 * Ex0, axis=1)
        den = jnp.sqrt(
            Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
            + 1e-12
        )
        return (num / den) * w

    def body(T, _):
        J = jax.jacfwd(residuals)(jnp.zeros(6), T)  # (N, 6)
        r = residuals(jnp.zeros(6), T)
        H = J.T @ J + damping * jnp.eye(6)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        Tn = T.retract(delta)
        t_n = Tn.t / jnp.maximum(jnp.linalg.norm(Tn.t), 1e-9)
        return Pose.from_Rt(Tn.R, t_n), None

    T, _ = jax.lax.scan(body, T01, None, length=iters)
    return T


# ---------------------------------------------------------------------------
# PnP: batched DLT-6pt RANSAC + Gauss-Newton polish
# ---------------------------------------------------------------------------

def _dlt_pnp(p3d, p2dn):
    """(B, 6, 3) points, (B, 6, 2) normalized obs -> (B, 3, 4) projections."""
    X = jnp.concatenate([p3d, jnp.ones((*p3d.shape[:2], 1))], axis=-1)  # (B,6,4)
    zero = jnp.zeros_like(X)
    u = p2dn[..., 0:1]
    v = p2dn[..., 1:2]
    r1 = jnp.concatenate([X, zero, -u * X], axis=-1)   # (B, 6, 12)
    r2 = jnp.concatenate([zero, X, -v * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)              # (B, 12, 12)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[..., -1, :].reshape(-1, 3, 4)
    # fix scale/sign: make the rotation part proper
    M = P[..., :3]
    det = jnp.linalg.det(M)
    P = P * jnp.sign(det)[..., None, None]
    norm = jnp.cbrt(jnp.abs(det))
    P = P / jnp.where(norm < 1e-12, 1e-12, norm)[..., None, None]
    return P


def _score_P(P, p3d, p2dn, thresh):
    Xh = jnp.concatenate([p3d, jnp.ones((p3d.shape[0], 1))], axis=1)
    proj = jnp.einsum("...ij,nj->...ni", P, Xh)
    z = proj[..., 2]
    uv = proj[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-9, 1e-9, z[..., None])
    err = jnp.linalg.norm(uv - p2dn, axis=-1)
    return (err < thresh) & (z > 0)


def _dlt_pnp_weighted(p3d, p2dn, w):
    """Least-squares P from ALL weighted 2D-3D correspondences."""
    X = jnp.concatenate([p3d, jnp.ones((p3d.shape[0], 1))], axis=-1)
    zero = jnp.zeros_like(X)
    u = p2dn[:, 0:1]
    v = p2dn[:, 1:2]
    rows = jnp.concatenate(
        [
            jnp.concatenate([X, zero, -u * X], axis=-1),
            jnp.concatenate([zero, X, -v * X], axis=-1),
        ],
        axis=0,
    ) * jnp.concatenate([w, w])[:, None]
    _, _, vt = jnp.linalg.svd(rows, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    det = jnp.linalg.det(P[:, :3])
    P = P * jnp.sign(det)
    norm = jnp.cbrt(jnp.abs(det))
    return P / jnp.where(norm < 1e-12, 1e-12, norm)


@_f32_precision
@functools.partial(jax.jit, static_argnames=("n_hyp", "lo_iters"))
def _pnp_ransac(p3d, p2dn, key, n_hyp: int = 1024, thresh: float = 2e-3,
                lo_iters: int = 2):
    N = p3d.shape[0]
    idx = jax.random.randint(key, (n_hyp, 6), 0, N)
    P = _dlt_pnp(p3d[idx], p2dn[idx])
    inl = _score_P(P, p3d, p2dn[None], thresh)
    scores = inl.sum(axis=1)
    best = jnp.argmax(scores)
    P_best, inl_best = P[best], inl[best]
    for _ in range(lo_iters):
        P_best = _dlt_pnp_weighted(p3d, p2dn, inl_best.astype(jnp.float32))
        inl_best = _score_P(P_best, p3d, p2dn, thresh)
    return P_best, inl_best, inl_best.sum()


def _orthogonalize(P) -> Tuple[np.ndarray, np.ndarray]:
    """Projective (3, 4) -> nearest rigid (R, t)."""
    M = np.asarray(P[:, :3], np.float64)
    u, s, vt = np.linalg.svd(M)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R, s = -R, -s
    scale = s.mean()
    t = np.asarray(P[:, 3], np.float64) / max(scale, 1e-12)
    return R, t


@_f32_precision
@functools.partial(jax.jit, static_argnames=("iters", "damping", "robust_c_px"))
def refine_pose_reprojection(T: Pose, p3d, p2d_ic, weights, camera: Camera,
                             iters: int = 15, damping: float = 1e-3,
                             robust_c_px: float = 0.0):
    """Gauss-Newton polish of a w2c pose on pixel reprojection residuals
    (the geometric counterpart of align/lm.py's feature-metric step).

    With ``robust_c_px`` > 0 the residuals get Cauchy IRLS weights — a
    hypothesis-free robust PnP when initialized from a neighboring pose
    (DLT-based minimal solvers are degenerate for coplanar points, which
    single-face views of objects produce constantly)."""

    def body(T, _):
        p_cam = T.transform(p3d)
        uv, visible = camera.project(p_cam)
        r = (uv - p2d_ic) * weights[:, None]
        w = jnp.where(visible, 1.0, 0.0) * weights
        if robust_c_px > 0:
            e2 = jnp.sum((uv - p2d_ic) ** 2, axis=-1)
            w = w / (1.0 + e2 / (robust_c_px**2))
        N = p_cam.shape[0]
        J_pcam = jnp.concatenate(
            [-so3_hat(p_cam),
             jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), (N, 3, 3))],
            axis=-1,
        )
        J = jnp.einsum("nij,njk->nik", camera.project_jacobian(p_cam), J_pcam)
        g = jnp.einsum("nik,ni->k", J * w[:, None, None], r)
        H = jnp.einsum("nik,nil->kl", J * w[:, None, None], J)
        H = H + damping * jnp.eye(6)
        delta = -jnp.linalg.solve(H, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return T.retract(delta), None

    T, _ = jax.lax.scan(body, T, None, length=iters)
    return T


# ---------------------------------------------------------------------------
# The incremental mapper
# ---------------------------------------------------------------------------

def _normalize(camera: Camera, p2d_ic: np.ndarray) -> np.ndarray:
    f = np.asarray(camera.f)
    c = np.asarray(camera.c)
    return (p2d_ic - c) / f


def _chain_initialize(
    ids, matches, kp_n, f_mean, key, verbose=False
) -> Dict[int, "Pose"]:
    """Sequential chain initialization for ordered captures (the pixtrack
    asset rigs are rings/videos): relative pose per strongest-neighbor pair,
    scales chained through shared tracks' depths. Produces a complete,
    drifty-but-topologically-correct pose set for global BA to polish —
    PnP bootstrap against two-view structure fails on shallow objects
    (bas-relief distortion makes early structure unusable)."""
    # build the chain greedily from verified match counts
    order = [ids[0]]
    left = set(ids[1:])
    while left:
        cur = order[-1]
        best, bn = None, -1
        for j in left:
            a, b = (cur, j) if cur < j else (j, cur)
            n = int((matches.get((a, b), np.asarray([-1])) >= 0).sum())
            if n > bn:
                bn, best = n, j
        if bn < 8:
            break
        order.append(best)
        left.discard(best)

    poses: Dict[int, Pose] = {order[0]: Pose.identity()}
    prev_pts: Optional[Dict[int, np.ndarray]] = None  # kidx in prev -> depth
    scale = 1.0
    for a_i in range(len(order) - 1):
        i, j = order[a_i], order[a_i + 1]
        a, b = (i, j) if i < j else (j, i)
        m = matches[(a, b)]
        k0 = np.nonzero(m >= 0)[0]
        k1 = m[k0]
        if i > j:  # matches stored low->high; flip to i->j direction
            k0, k1 = k1, k0
        key, k_e = jax.random.split(key)
        T_ij, inl = estimate_relative_pose(
            kp_n[i][k0], kp_n[j][k1], k_e, focal=f_mean
        )
        X, z0, z1 = _triangulate_pair(
            jnp.asarray(T_ij.R), jnp.asarray(T_ij.t),
            jnp.asarray(kp_n[i][k0], jnp.float32),
            jnp.asarray(kp_n[j][k1], jnp.float32),
        )
        z0 = np.asarray(z0)
        ok = np.asarray(inl) & (z0 > 0) & (np.asarray(z1) > 0)
        depth_i = {int(k): float(z) for k, z, o in zip(k0, z0, ok) if o}
        if prev_pts is not None:
            shared = [k for k in depth_i if k in prev_pts]
            if len(shared) >= 3:
                # prev_pts are GLOBAL-scale depths of the same physical
                # points in camera i; depth_i are unit-baseline depths of
                # this link -> their ratio IS this link's baseline scale
                scale = float(np.median(
                    [prev_pts[k] / depth_i[k] for k in shared]
                ))
        T_scaled = Pose.from_Rt(
            T_ij.R, T_ij.t * jnp.asarray(scale, jnp.float32)
        )
        poses[j] = T_scaled @ poses[i]
        # depths of j's keypoints for the next link's scale chain
        z1 = np.asarray(z1)
        prev_pts = {int(kk): float(zz) * scale
                    for kk, zz, o in zip(k1, z1, ok) if o}
        if verbose:
            print(f"chain {i}->{j}: {int(np.asarray(inl).sum())}/{len(k0)} "
                  f"inl, scale {scale:.3f}")
    return poses


def _structure_guided_matches(
    poses: Dict[int, Pose],
    camera: Camera,
    kps: Dict[int, np.ndarray],
    kp_ic: Dict[int, np.ndarray],
    descs: Dict[int, np.ndarray],
    tracks: List[List[Tuple[int, int]]],
    xyz_of_track: Dict[int, np.ndarray],
    radius_px: float = 6.0,
    min_desc_score: float = 0.75,
    vis_cone_deg: float = 55.0,
) -> Optional[Dict[Tuple[int, int], np.ndarray]]:
    """Synthesize pair matches from reconstructed structure (COLMAP's
    guided matching role): project every triangulated track into every
    registered view and snap it to a nearby detected keypoint, gated by
    descriptor similarity and a visibility cone around the views that
    actually observed the track.

    Why this exists: appearance-only matching fails at wide baselines
    (repetitive texture aliases under MNN; measured 60-150 deg relative-
    pose errors at >=3-view gaps on the arc rig), so the pair graph the
    global averaging sees is a noisy near-chain and drift around the arc
    cannot be closed. A first reconstruction pass is locally accurate
    (<~10 px projection drift between far-apart views), which is exactly
    the prior needed to re-match those pairs correctly.

    Returns {(i, j): match_array} over all registered pairs i < j (the
    j-keypoint index per i-keypoint, -1 = unmatched), or None if there is
    no structure to guide with.
    """
    tids = sorted(xyz_of_track)
    if not tids:
        return None
    X = np.stack([xyz_of_track[t] for t in tids])  # (P, 3)
    trow = {t: r for r, t in enumerate(tids)}
    P = len(tids)
    reg = sorted(poses)

    centers = {
        i: -(np.asarray(poses[i].R).T @ np.asarray(poses[i].t)) for i in reg
    }
    # per-track observing directions (unit vectors point -> camera center)
    obs_dirs: List[List[np.ndarray]] = [[] for _ in range(P)]
    kp_of: Dict[int, Dict[int, int]] = {i: {} for i in reg}  # view -> row -> kp
    for t in tids:
        r = trow[t]
        for (im, k) in tracks[t]:
            if im in poses:
                d = centers[im] - X[r]
                obs_dirs[r].append(d / (np.linalg.norm(d) + 1e-12))
                kp_of[im][r] = k

    proj, vis = {}, {}
    for i in reg:
        uv, v = camera.world2image(poses[i], jnp.asarray(X, jnp.float32))
        proj[i] = np.asarray(uv)
        vis[i] = np.asarray(v)

    # --- union-find guard over (tracks + loose keypoints) ---------------
    # Guided matches MERGE tracks downstream (build_tracks union-find).
    # Merging two tracks that co-observe an image creates a same-image
    # conflict and the whole merged track is dropped wholesale — with
    # near-duplicate detections (nms_radius=1) this silently destroys most
    # of the model (measured: 302 -> <100 points). Simulate the union-find
    # here and refuse any match that would union two nodes with
    # intersecting image sets.
    parent: Dict[Tuple[str, int, int], Tuple[str, int, int]] = {}
    imgset: Dict[Tuple[str, int, int], set] = {}

    def node_of(im: int, k: int) -> Tuple[str, int, int]:
        t = _track_lookup.get((im, k))
        return ("t", t, 0) if t is not None else ("k", im, k)

    def find(n):
        while parent.get(n, n) != n:
            parent[n] = parent.get(parent[n], parent[n])
            n = parent[n]
        return n

    def images_of(n):
        if n not in imgset:
            if n[0] == "t":
                imgset[n] = {im for (im, _) in tracks[n[1]]}
            else:
                imgset[n] = {n[1]}
        return imgset[n]

    def try_union(na, nb) -> bool:
        ra, rb = find(na), find(nb)
        if ra == rb:
            return True
        A, B = images_of(ra), images_of(rb)
        if A & B:
            return False
        parent[rb] = ra
        imgset[ra] = A | B
        imgset.pop(rb, None)
        return True

    _track_lookup: Dict[Tuple[int, int], int] = {}
    for t, tr in enumerate(tracks):  # ALL tracks, incl. untriangulated
        for obs in tr:
            _track_lookup[obs] = t

    cos_gate = np.cos(np.deg2rad(vis_cone_deg))
    # cone visibility of every track in every view (front-facing proxy:
    # the target viewing direction must be close to SOME observing one —
    # a sparse model has no occlusion geometry to raycast against)
    cone = {}
    for j in reg:
        dirs_j = centers[j][None, :] - X  # (P, 3)
        dirs_j /= np.linalg.norm(dirs_j, axis=-1, keepdims=True) + 1e-12
        ok = np.zeros(P, bool)
        for r in range(P):
            if obs_dirs[r]:
                ok[r] = (np.stack(obs_dirs[r]) @ dirs_j[r]).max() > cos_gate
        cone[j] = ok

    out: Dict[Tuple[int, int], np.ndarray] = {}
    for ai in range(len(reg)):
        for bi in range(ai + 1, len(reg)):
            i, j = reg[ai], reg[bi]
            rows = sorted(set(kp_of[i]) & set(np.nonzero(cone[j] & vis[j])[0]))
            m = np.full(len(kps[i]), -1, np.int64)
            if not rows:
                out[(i, j)] = m
                continue
            rows = np.asarray(rows)
            pj = proj[j][rows]  # (R, 2) index-centered
            d2 = (
                (pj[:, None, :] - kp_ic[j][None, :, :]) ** 2
            ).sum(-1)  # (R, Kj)
            within = d2 <= radius_px * radius_px
            ki = np.asarray([kp_of[i][r] for r in rows])
            if descs.get(i) is not None and descs.get(j) is not None and len(
                descs[i]
            ):
                score = descs[i][ki] @ descs[j].T  # (R, Kj) cosine
                score = np.where(within, score, -np.inf)
                best = np.argmax(score, axis=1)
                best_s = score[np.arange(len(rows)), best]
                keep = best_s > min_desc_score
            else:
                # no descriptors (bring-your-own-keypoints path): nearest
                # within a tighter radius
                d2g = np.where(within, d2, np.inf)
                best = np.argmin(d2g, axis=1)
                best_s = -d2g[np.arange(len(rows)), best]
                keep = best_s > -(radius_px / 2) ** 2
            # resolve collisions (two tracks snapping to one j-keypoint):
            # highest score wins; refuse conflict-creating track merges
            order = np.argsort(-best_s)
            taken: Dict[int, None] = {}
            for o in order:
                if not keep[o]:
                    continue
                kj = int(best[o])
                if kj in taken:
                    continue
                if not try_union(node_of(i, int(ki[o])), node_of(j, kj)):
                    continue
                taken[kj] = None
                m[ki[o]] = kj
            out[(i, j)] = m
    return out


def incremental_sfm(
    images: Dict[int, np.ndarray],
    camera_rec: colmap_io.CameraRecord,
    names: Optional[Dict[int, str]] = None,
    max_keypoints: int = 1024,
    seed: int = 0,
    min_pnp_points: int = 6,
    refine_every: int = 3,
    verbose: bool = False,
    match_kw: Optional[dict] = None,
    strategy: str = "chain",
    featuremetric_ka: bool = False,
    featuremetric_ba_rounds: int = 0,
    ka_extractor=None,
    keypoints: Optional[Dict[int, np.ndarray]] = None,
    pair_matches: Optional[Dict[Tuple[int, int], np.ndarray]] = None,
    descriptors: Optional[Dict[int, np.ndarray]] = None,
    init_poses: Optional[Dict[int, Pose]] = None,
    guided_rounds: int = 0,
    matcher=None,
    detector=None,
    **detect_kw,
) -> SceneModel:
    """Full unposed reconstruction -> SceneModel (arbitrary global scale,
    like any monocular SfM).

    ``strategy``: "chain" (default) initializes poses sequentially through
    the strongest-neighbor chain and polishes with global BA — robust for
    the ordered ring/video captures the pipeline ingests. "pnp" is the
    classical init-pair + PnP-growing mapper (COLMAP-style); it needs
    deeper scenes (PnP bootstrap against two-view structure of a shallow
    object inherits its bas-relief distortion).

    ``keypoints``/``pair_matches``: bring-your-own features — precomputed
    corner-convention keypoints per image and match arrays per (i, j)
    pair (j-index per i-keypoint, -1 = unmatched; i < j), the same layout
    hloc feeds COLMAP from its h5 stores (reference
    scripts/run_reconstruction.py:39-61). When given, detection, matching
    and two-view verification are skipped (the matches are trusted);
    ``descriptors`` optionally supplies per-image descriptors for guided
    re-matching.

    ``matcher``: optional learned pair matcher with the LearnedMatcher
    call contract ``(desc0, kp0, shape0, desc1, kp1, shape1) ->
    (matches0, scores0)`` (mapping/attention_matcher.py — the SuperGlue
    role, reference scripts/run_reconstruction.py:41-50); defaults to
    mutual-NN + ratio on descriptors. Two-view geometric verification
    still applies to its output.

    ``guided_rounds``: after the model converges, re-match every
    registered pair with structure-guided matching (project tracks, snap
    to detected keypoints — _structure_guided_matches), enrich the pair
    graph, rebuild tracks and REFINE from the converged poses (the
    rebuilt model keeps this pass's poses as init; re-initializing from
    averaging on the enriched graph was measured worse — guided matches
    are structure-consistent, so a fresh init just re-derives the same
    drift with less redundancy). Off by default. Measured on the 10-view
    arc rig with handcrafted descriptors: global rotation 2.92 -> 2.67
    deg but reprojection 0.53 -> 0.78 px and fewer points — projection-
    snap matching inherits the model's drift unless descriptors are
    distinctive enough to reject near-miss candidates, so this helps
    only WITH a learned matcher/descriptor (the attention matcher), not
    as a substitute for one."""
    from pixtrack_tpu.mapping.detector import detect_and_describe
    from pixtrack_tpu.mapping.matcher import match_descriptors
    from pixtrack_tpu.mapping.triangulate import (
        build_tracks,
        triangulate_scene,
    )

    camera = Camera.from_colmap(
        camera_rec.model, camera_rec.params, camera_rec.width, camera_rec.height
    )
    f_mean = float(np.asarray(camera.f).mean())
    names = names or {iid: f"view_{iid:04d}.png" for iid in images}
    key = jax.random.PRNGKey(seed)

    # 1. features + exhaustive matching (corner-convention keypoints, like
    # the COLMAP h5 layout used across sfm/)
    kps: Dict[int, np.ndarray] = {}
    descs: Dict[int, np.ndarray] = {}
    if keypoints is not None:
        kps = {iid: np.asarray(kp, np.float64) for iid, kp in keypoints.items()}
        if descriptors is not None:
            descs = {iid: np.asarray(d) for iid, d in descriptors.items()}
    else:
        # ``detector``: learned detector/descriptor backend with the
        # detect_and_describe contract (the SuperPoint-weights role,
        # mapping.default_detector); default is the multi-scale Harris
        detect = detector or detect_and_describe
        for iid, img in images.items():
            kp, _, desc = detect(img, max_keypoints=max_keypoints, **detect_kw)
            kps[iid] = np.asarray(kp)
            descs[iid] = np.asarray(desc)
    ids = sorted(images)
    kp_ic = {iid: kps[iid] - 0.5 for iid in kps}  # index-centered
    kp_n = {iid: _normalize(camera, kp_ic[iid]) for iid in kps}

    # 1b. two-view geometric verification (COLMAP's verification stage):
    # essential-RANSAC each pair, keep only epipolar-consistent matches.
    # Without this, union-find chains wrong matches into inconsistent
    # tracks that the same-image rule then drops wholesale.
    matches: Dict[Tuple[int, int], np.ndarray] = {}
    min_pair_inliers = 10
    if pair_matches is not None:
        matches = {
            (min(p), max(p)): np.asarray(m).copy()
            for p, m in pair_matches.items()
        }
    for a in range(len(ids) if pair_matches is None else 0):
        for b in range(a + 1, len(ids)):
            i0, i1 = ids[a], ids[b]
            if matcher is not None:
                m0, _ = matcher(
                    descs[i0], kps[i0], images[i0].shape[:2],
                    descs[i1], kps[i1], images[i1].shape[:2],
                )
            else:
                m0, _ = match_descriptors(
                    descs[i0], descs[i1], **(match_kw or {})
                )
            m0 = np.asarray(m0).copy()
            k0 = np.nonzero(m0 >= 0)[0]
            if len(k0) < min_pair_inliers:
                matches[(i0, i1)] = np.full_like(m0, -1)
                continue
            key, k_v, k_h = jax.random.split(key, 3)
            # pad to power-of-two buckets by cyclic repetition: every pair
            # otherwise jit-recompiles the RANSACs for its unique N
            Nv = len(k0)
            Npad = 1 << int(np.ceil(np.log2(max(Nv, 32))))
            sel = np.resize(np.arange(Nv), Npad)
            pa = jnp.asarray(kp_n[i0][k0][sel], jnp.float32)
            pb = jnp.asarray(kp_n[i1][m0[k0]][sel], jnp.float32)
            # union of epipolar- AND homography-consistent matches: the
            # 8-point E is biased on shallow pairs and rejects true wide-
            # baseline matches, destroying the >=3-view tracks global BA
            # needs for loop closure; H catches the dominant-plane subset
            _, inlE, _ = _essential_ransac(
                pa, pb, k_v, n_hyp=2048, thresh=(3.0 / f_mean) ** 2,
            )
            _, inlH, _ = _homography_ransac(
                pa, pb, k_h, thresh=(3.0 / f_mean) ** 2,
            )
            inl = (np.asarray(inlE) | np.asarray(inlH))[:Nv]
            if inl.sum() < min_pair_inliers:
                m0[:] = -1
            else:
                m0[k0[~inl]] = -1
            matches[(i0, i1)] = m0

    # 1c. featuremetric keypoint adjustment (the pixsfm KA role, reference
    # scripts/run_reconstruction.py:52-61): refine keypoint locations so the
    # verified tracks agree in dense feature space BEFORE any geometry is
    # estimated — subpixel corrections feed every downstream pose/point.
    if featuremetric_ka:
        from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
        from pixtrack_tpu.mapping.featuremetric import keypoint_adjustment
        from pixtrack_tpu.mapping.triangulate import build_tracks as _bt

        ka_tracks = _bt(kps, matches)
        if ka_tracks:
            if verbose:
                print(f"featuremetric KA over {len(ka_tracks)} tracks")
            extractor = ka_extractor or FeatureExtractor(
                HandcraftedExtractor(), resize=1024
            )
            kps = keypoint_adjustment(images, kps, ka_tracks, extractor)
            kp_ic = {iid: kps[iid] - 0.5 for iid in kps}
            kp_n = {iid: _normalize(camera, kp_ic[iid]) for iid in kps}

    # 2. init pair + relative pose
    pair_counts = {p: int((m >= 0).sum()) for p, m in matches.items()}
    (i0, i1) = max(pair_counts, key=pair_counts.get)
    if init_poses is not None:
        # bring-your-own poses (guided refine round / posed-prior mapping):
        # keep them, skip chain/averaging entirely
        poses = dict(init_poses)
        i0 = next(iter(poses))
    elif strategy == "chain":
        key, k_c = jax.random.split(key)
        poses: Dict[int, Pose] = _chain_initialize(
            ids, matches, kp_n, f_mean, k_c, verbose=verbose
        )
        i0 = next(iter(poses))
        # Loop closure by global averaging (mapping/global_init.py): the
        # chain alone accumulates its per-link error around the ring with
        # nothing to close it. With the homography +/-t branch fix the
        # pairwise edges are unbiased (~1 deg links), and rotation +
        # translation averaging over the triangle-consistent pair graph
        # lands within ~2 deg / 8%-of-radius globally BEFORE any structure
        # is built; falls back to the plain chain on sparse pair graphs.
        key, k_g = jax.random.split(key)
        from pixtrack_tpu.mapping.global_init import global_initialize

        g_poses = global_initialize(
            ids, matches, kp_n, f_mean, k_g, chain_init=poses,
            verbose=verbose,
        )
        if g_poses is not None:
            poses = g_poses
            i0 = next(iter(poses))  # averaging may have peeled the anchor
            if verbose:
                print(f"global init: averaged {len(poses)} poses")
    else:
        m01 = matches[(i0, i1)]
        k0 = np.nonzero(m01 >= 0)[0]
        k1 = m01[k0]
        key, k_e = jax.random.split(key)
        T01, inl = estimate_relative_pose(kp_n[i0][k0], kp_n[i1][k1], k_e,
                                          focal=f_mean)
        poses = {i0: Pose.identity(), i1: T01}
        if verbose:
            print(f"init pair ({i0},{i1}): {int(inl.sum())}/{len(k0)} inliers")

    # 3-5. register remaining images against the growing point set
    tracks = build_tracks(kps, matches, min_track_length=2)
    track_of_obs: Dict[Tuple[int, int], int] = {}
    for ti, tr in enumerate(tracks):
        for obs in tr:
            track_of_obs[obs] = ti
    xyz_of_track: Dict[int, np.ndarray] = {}

    def triangulate_ready(registered: List[int]) -> None:
        """(Re-)triangulate all tracks with >= 2 registered observations,
        in one padded batch, with a fixed 6 px reprojection acceptance
        gate. (A coarse-to-fine gate schedule was tried and reverted — see
        the final-polish comment below: robust BA fully downweights
        far-off tracks, so a wide gate only admits junk.)"""
        from pixtrack_tpu.mapping.triangulate import triangulate_tracks

        cand, cand_ids = [], []
        reg = set(registered)
        for ti, tr in enumerate(tracks):
            obs = [o for o in tr if o[0] in reg]
            if len(obs) >= 2:
                cand.append(obs)
                cand_ids.append(ti)
        if not cand:
            return
        xyz, kept, _ = triangulate_tracks(
            cand, kp_ic, {i: poses[i] for i in reg}, {1: camera},
            {i: 1 for i in reg}, max_reproj_error=6.0,
        )
        kept_set = {tuple(t[0]): None for t in kept}
        # map kept back to track ids by first observation
        first_to_tid = {tuple(c[0]): tid for c, tid in zip(cand, cand_ids)}
        for t, p in zip(kept, xyz):
            tid = first_to_tid.get(tuple(t[0]))
            if tid is not None:
                xyz_of_track[tid] = p

    # seed triangulation from the init pair — but chain/averaging init can
    # legitimately drop either pair member (averaging peels inconsistent
    # nodes), so fall back to all posed images when the pair isn't whole
    seed = [i for i in (i0, i1) if i in poses]
    triangulate_ready(seed if len(seed) == 2 else list(poses))

    def _polish_rounds(n: int, ba_iters: int = 15) -> None:
        """Iterated intersect/adjust: triangulate everything the current
        poses support, BA, re-triangulate (the 6 px acceptance gate is
        re-evaluated under the improved poses each round, readmitting
        tracks the init explained poorly). This is what converges an
        ALL-camera averaging init: the incremental register loop never
        runs for it, so without these rounds the model would go into
        final polish with only the init pair triangulated."""
        for _ in range(n):
            triangulate_ready(list(poses))
            global_ba(ba_iters=ba_iters)
        triangulate_ready(list(poses))

    def global_ba(ba_iters: int = 15) -> None:
        """Joint pose+structure BA over the current model (bundle.py).
        Pads observation counts to power-of-two buckets to bound jit
        recompiles as the model grows."""
        from pixtrack_tpu.mapping.bundle import bundle_adjust

        reg = [i0] + [i for i in poses if i != i0]  # gauge: i0 first
        row_of = {iid: k for k, iid in enumerate(reg)}
        tids = sorted(xyz_of_track)
        trow = {t: k for k, t in enumerate(tids)}
        if len(tids) < 8:
            return
        ci, pi, uvs = [], [], []
        for t in tids:
            for (im, k) in tracks[t]:
                if im in row_of:
                    ci.append(row_of[im])
                    pi.append(trow[t])
                    uvs.append(kp_ic[im][k])
        M = len(ci)
        Mp = 1 << int(np.ceil(np.log2(max(M, 64))))
        pad = Mp - M
        ci = np.asarray(ci + [0] * pad, np.int32)
        pi = np.asarray(pi + [0] * pad, np.int32)
        uvs = np.concatenate([np.stack(uvs), np.zeros((pad, 2))]).astype(np.float32)
        w = np.concatenate([np.ones(M), np.zeros(pad)]).astype(np.float32)
        pb = Pose(
            R=jnp.stack([poses[i].R for i in reg]),
            t=jnp.stack([poses[i].t for i in reg]),
        )
        Np = len(tids)
        Xb = jnp.asarray(np.stack([xyz_of_track[t] for t in tids]), jnp.float32)
        pb2, Xb2 = bundle_adjust(
            pb, Xb, jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uvs),
            jnp.asarray(w), camera, iters=ba_iters, robust_c_px=3.0,
        )
        Xb2 = np.asarray(Xb2)
        for k, iid in enumerate(reg):
            poses[iid] = Pose.from_Rt(pb2.R[k], pb2.t[k])
        for t in tids:
            xyz_of_track[t] = Xb2[trow[t]]

    remaining = [i for i in ids if i not in poses]
    if init_poses is not None and len(poses) > 2:
        # Only for bring-your-own poses (guided refine): iterate structure
        # into the given poses. For the chain/averaging inits this was
        # measured HARMFUL (3.6 vs 2.9 deg global on the arc rig): early
        # BA entrenches the init's basin before final polish gets to
        # RE-REGISTER each camera against converged structure.
        _polish_rounds(2)
        if verbose:
            print(f"init convergence: {len(xyz_of_track)} tracks "
                  f"triangulated over {len(poses)} init poses")
    rejected: Dict[int, int] = {}
    _EMPTY = np.asarray([-1])
    while remaining:
        # most 2D-3D correspondences first; support is recomputed every
        # round so images skipped earlier are retried once new points exist
        def support(iid):
            return sum(
                1
                for k in range(len(kps[iid]))
                if track_of_obs.get((iid, k)) in xyz_of_track
            )

        remaining.sort(key=support, reverse=True)
        iid = remaining[0]
        obs3d, obs2dn, obs2dic = [], [], []
        for k in range(len(kps[iid])):
            tid = track_of_obs.get((iid, k))
            if tid in xyz_of_track:
                obs3d.append(xyz_of_track[tid])
                obs2dn.append(kp_n[iid][k])
                obs2dic.append(kp_ic[iid][k])
        if len(obs3d) < min_pnp_points:
            if verbose:
                print(f"stop: best remaining image {iid} has only "
                      f"{len(obs3d)} 2D-3D ({len(remaining)} unregistered)")
            break
        remaining.remove(iid)
        X = jnp.asarray(np.stack(obs3d), jnp.float32)
        uv_ic = jnp.asarray(np.stack(obs2dic), jnp.float32)

        # Registration A (primary): robust GN from the most-connected
        # registered neighbor's pose. Hypothesis-free and well-posed for
        # COPLANAR point sets — where DLT-PnP is degenerate, and single-face
        # object views are coplanar almost by construction.
        def shared(rid):
            a, b = (rid, iid) if rid < iid else (iid, rid)
            return int((matches.get((a, b), _EMPTY) >= 0).sum())

        neighbor = max(poses, key=shared)
        candidates_T = []
        if shared(neighbor) > 0:
            T_nb = refine_pose_reprojection(
                poses[neighbor], X, uv_ic, jnp.ones(len(obs3d)),
                camera, iters=30, robust_c_px=4.0,
            )
            candidates_T.append(T_nb)
        # Registration B (fallback): DLT-6pt RANSAC (general-position sets)
        key, k_p = jax.random.split(key)
        P, _, _ = _pnp_ransac(
            X, jnp.asarray(np.stack(obs2dn), jnp.float32), k_p,
            thresh=4.0 / f_mean,
        )
        R, t = _orthogonalize(np.asarray(P))
        T_dlt = Pose.from_Rt(R.astype(np.float32), t.astype(np.float32))
        candidates_T.append(refine_pose_reprojection(
            T_dlt, X, uv_ic, jnp.ones(len(obs3d)), camera, iters=15,
            robust_c_px=4.0,
        ))

        def inlier_count(T):
            uv, vis = camera.world2image(T, X)
            err = jnp.linalg.norm(uv - uv_ic, axis=-1)
            return int(jnp.sum(vis & (err < 4.0)))

        scores = [inlier_count(T) for T in candidates_T]
        bi = int(np.argmax(scores))
        T, score = candidates_T[bi], scores[bi]
        # acceptance gate: a registration the data doesn't support poisons
        # the whole downstream model
        if score < max(min_pnp_points, int(0.25 * len(obs3d))):
            if verbose:
                print(f"reject image {iid}: {score}/{len(obs3d)} inliers")
            rejected[iid] = rejected.get(iid, 0) + 1
            if rejected[iid] < 3:
                remaining.append(iid)  # retry once more structure exists
            continue
        poses[iid] = T
        if verbose:
            print(f"registered {iid}: {score}/{len(obs3d)} inliers "
                  f"({'GN' if bi == 0 and len(candidates_T) == 2 else 'DLT'})")
        triangulate_ready(list(poses))

        # periodic GLOBAL bundle adjustment (poses + structure jointly —
        # alternating resection/intersection converges to collapsed local
        # minima on shallow object rigs)
        if len(poses) % refine_every == 0:
            global_ba()
            triangulate_ready(list(poses))

    # final polish: BA -> re-register every pose against the converged
    # structure (robust GN; snaps chain-drifted poses back) -> BA again.
    # (A coarse-to-fine triangulation gate was tried here to readmit
    # loop-closure tracks: it measurably HURTS — tracks hundreds of px off
    # are fully downweighted by the robust kernel, so the wide gate only
    # admits junk. Closure must come from a better init, not the gate.)
    global_ba(ba_iters=25)
    triangulate_ready(list(poses))

    def cull_observations() -> int:
        """Hard per-OBSERVATION outlier culling (COLMAP's filter step).

        Robust BA only DOWN-weights a bad observation (a 6 px outlier at
        robust_c=3 keeps ~20% weight) — wrong-but-epipolar-consistent
        matches that survive verification keep biasing every pose. The
        oracle error budget (assets/sfm_error_budget.json) measures that
        surviving match mistakes cost ~1.7 deg global rotation on the arc
        rig while the geometry stack itself is exact. Drop observations
        whose reprojection error exceeds max(3 x median, 1.0 px), dissolve
        tracks left with < 2 observations, and let the caller
        re-triangulate + re-BA. Returns the number of culled observations."""
        by_img: Dict[int, list] = {}
        for tid, X in xyz_of_track.items():
            for (im, k) in tracks[tid]:
                if im in poses:
                    by_img.setdefault(im, []).append((tid, k, X))
        errs_l, locs = [], []
        for im, obs in by_img.items():
            X = jnp.asarray(np.stack([o[2] for o in obs]), jnp.float32)
            uv, vis = camera.world2image(poses[im], X)
            p2 = np.stack([kp_ic[im][o[1]] for o in obs])
            e = np.linalg.norm(np.asarray(uv) - p2, axis=1)
            e = np.where(np.asarray(vis), e, 1e6)
            errs_l.append(e)
            locs += [(tid, (im, k)) for (tid, k, _) in obs]
        if not errs_l:
            return 0
        errs = np.concatenate(errs_l)
        finite = errs[errs < 1e5]
        if finite.size == 0:  # every posed observation flagged invisible
            return 0
        # invisible (behind-camera / out-of-frame) observations bypass the
        # 20% damage bound below — they always exceed the gate. A model
        # where >30% of observations are invisible is globally broken
        # (flipped poses), and mass-culling it only hides the failure as an
        # near-empty "reconstruction"; leave it for the caller's quality
        # gates to reject instead.
        if errs.size - finite.size > 0.3 * errs.size:
            if verbose:
                print(f"cull: skipped ({errs.size - finite.size}/{errs.size} "
                      "invisible — model inconsistent)", flush=True)
            return 0
        gate = max(3.0 * float(np.median(finite)), 1.0)
        # never cull more than the worst 20% of observations in one round:
        # on thin scenes (tens of tracks) the 3x-median gate is a
        # high-variance statistic and was measured culling a 21-track
        # model to ZERO in one round (144 px 7-view smoke); bounding the
        # per-round damage keeps the cull-retriangulate-reBA loop
        # convergent instead of destructive
        gate = max(gate, float(np.quantile(finite, 0.8)))
        if verbose:
            print(f"cull: {errs.size} obs ({errs.size - finite.size} "
                  f"invisible), median {float(np.median(finite)):.2f} px, "
                  f"gate {gate:.2f} px", flush=True)
        n_cull = 0
        for e, (tid, obs) in zip(errs, locs):
            if e > gate and obs in tracks[tid]:
                tracks[tid] = [o for o in tracks[tid] if o != obs]
                track_of_obs.pop(obs, None)
                n_cull += 1
        for tid in list(xyz_of_track):
            if len([o for o in tracks[tid] if o[0] in poses]) < 2:
                xyz_of_track.pop(tid, None)
        return n_cull

    for _ in range(2):
        n = cull_observations()
        if n == 0:
            break
        triangulate_ready(list(poses))
        global_ba(ba_iters=15)
        if verbose:
            print(f"culled {n} observations; {len(xyz_of_track)} tracks live")
    n_snapped = 0
    for rid in list(poses):
        o3, o2 = [], []
        for k in range(len(kps[rid])):
            tid = track_of_obs.get((rid, k))
            if tid in xyz_of_track:
                o3.append(xyz_of_track[tid])
                o2.append(kp_ic[rid][k])
        if len(o3) >= min_pnp_points and rid != i0:
            X = jnp.asarray(np.stack(o3), jnp.float32)
            uv_obs = np.stack(o2)
            T_new = refine_pose_reprojection(
                poses[rid], X, jnp.asarray(uv_obs, jnp.float32),
                jnp.ones(len(o3)), camera, iters=30, robust_c_px=3.0,
            )

            # VERIFIED re-registration: robust GN on a single pose against
            # near-planar structure has a two-fold (reflection) ambiguity,
            # and was measured hopping to the mirror solution on dense
            # high-recall track sets (the learned-descriptor arc rig: 9/10
            # poses flipped, 514/516 observations left behind the camera,
            # and the following cull round dissolved a converged
            # median-0.18 px model to a single track). A refined pose is a
            # hypothesis, not an answer: accept it only if it does not
            # worsen this image's own median reprojection error.
            def med_err(T):
                uv, vis = camera.world2image(T, X)
                e = np.linalg.norm(np.asarray(uv) - uv_obs, axis=1)
                return float(np.median(np.where(np.asarray(vis), e, 1e6)))

            if med_err(T_new) <= max(med_err(poses[rid]), 1e-6) * 1.5:
                poses[rid] = T_new
            else:
                n_snapped += 1
    if verbose:
        print(f"post-PnP-refine: {len(xyz_of_track)} tracks "
              f"({n_snapped} refinements rejected)", flush=True)
    triangulate_ready(list(poses))
    if verbose:
        print(f"post-retriangulate: {len(xyz_of_track)} tracks", flush=True)
    global_ba(ba_iters=25)
    triangulate_ready(list(poses))
    if verbose:
        print(f"post-BA25: {len(xyz_of_track)} tracks", flush=True)
    # one more cull round against the re-registered poses: re-registration
    # moves poses enough to expose observations the first rounds' gate let
    # through
    if cull_observations() > 0:
        triangulate_ready(list(poses))
        global_ba(ba_iters=15)
    if verbose:
        print(f"final polish: {len(xyz_of_track)} tracks with 3D points")

    # 5b. structure-guided re-matching: rebuild the model from the pair
    # graph the converged structure implies (closes wide-baseline loops
    # appearance matching cannot).
    if guided_rounds > 0 and len(poses) >= 3 and xyz_of_track:
        gm = _structure_guided_matches(
            poses, camera, kps, kp_ic, descs, tracks, xyz_of_track
        )
        if gm is not None:
            # ENRICH the appearance matches with the guided ones (guided
            # wins conflicts: it is structure-verified). Replacing
            # wholesale was measured WORSE: guided matches only exist for
            # triangulated tracks, so adjacent-pair redundancy collapses
            # (2404 -> 1573 matches on the arc rig) and 2-view tracks
            # (the PnP support of weakly-connected cameras) vanish.
            n_old = sum(int((m >= 0).sum()) for m in matches.values())
            for p in set(matches) | set(gm):
                mo, mg = matches.get(p), gm.get(p)
                if mo is None or mg is None:
                    gm[p] = mg if mo is None else mo.copy()
                    continue
                m = mo.copy()
                taken = {int(v) for v in mg[mg >= 0]}
                old_idx = np.nonzero(m >= 0)[0]
                drop = [k for k in old_idx if int(m[k]) in taken]
                m[drop] = -1
                sel = mg >= 0
                m[sel] = mg[sel]
                gm[p] = m
            if verbose:
                n_new = sum(int((m >= 0).sum()) for m in gm.values())
                print(f"guided re-matching: {n_old} -> {n_new} matches "
                      f"over {len(gm)} pairs; rebuilding")
            return incremental_sfm(
                images,
                camera_rec,
                names=names,
                seed=seed + 1,
                min_pnp_points=min_pnp_points,
                refine_every=refine_every,
                verbose=verbose,
                strategy=strategy,
                featuremetric_ka=featuremetric_ka,
                featuremetric_ba_rounds=featuremetric_ba_rounds,
                ka_extractor=ka_extractor,
                keypoints=kps,
                pair_matches=gm,
                descriptors=descs if descs else None,
                init_poses=poses,
                guided_rounds=guided_rounds - 1,
            )

    # 6. final assembly through the shared triangulator
    image_meta = {}
    for iid, T in poses.items():
        q, t = T.to_quat_t()
        image_meta[iid] = {
            "name": names[iid],
            "qvec": np.asarray(q),
            "tvec": np.asarray(t),
            "camera_id": camera_rec.camera_id,
        }
    reg_matches = {
        p: m for p, m in matches.items() if p[0] in poses and p[1] in poses
    }
    rec = triangulate_scene(
        image_meta, kps, reg_matches, {camera_rec.camera_id: camera_rec}
    )
    if featuremetric_ba_rounds > 0 and len(rec.images) >= 3:
        # final featuremetric polish (the pixsfm featuremetric-BA role):
        # pose + point blocks against dense features, below keypoint
        # quantization. Measured on the 10-view arc: 0.915 -> 0.837 deg
        # global rotation median at rounds=2 (rounds=3 regresses to 0.864;
        # scripts_dev/fmba_experiment.py r5 sweep).
        from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
        from pixtrack_tpu.mapping.featuremetric import featuremetric_ba

        extractor = ka_extractor or FeatureExtractor(
            HandcraftedExtractor(), resize=1024
        )
        if verbose:
            print(f"featuremetric BA: {featuremetric_ba_rounds} round(s)")
        rec = featuremetric_ba(
            rec, images, extractor, rounds=featuremetric_ba_rounds
        )
    return rec
