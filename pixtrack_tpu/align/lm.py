"""Damped Gauss-Newton / Levenberg-Marquardt feature-metric pose alignment.

This is the hot core of the framework — the TPU-native replacement for
pixloc's ``LearnedOptimizer`` + ``PixTrackOptimizer`` (reference
pixtrack/optimizers/pixtrack_optimizer.py:6-18, conf at
pixtrack/pose_trackers/pixloc_tracker_r9.py:43-58) and the residual machinery
of ``BaseRefiner.refine_pose_using_features``.

Design (TPU-first):
- one jitted ``lax.while_loop`` per pyramid level; every iteration processes
  ALL points x channels as dense batched tensors (no data-dependent shapes);
- early stop follows the reference rule exactly — stop when ||grad|| <
  grad_stop OR (dt < dt_stop AND dR < dR_stop) — implemented as a loop-carried
  flag (masked convergence) rather than a host sync;
- classic adaptive LM damping (multiplicative lambda on accept/reject)
  replaces pixloc's *learned* damping — no checkpoint exists to port, and
  adaptive damping is strictly more robust at equal cost per iteration;
- robust Cauchy weighting on per-point residual norms replaces the learned
  robust cost, with optional confidence maps multiplied in (the reference's
  interpolated uncertainties).

All shapes static: points padded + masked (SceneModel.pack_points).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from pixtrack_tpu.align.interpolate import interpolate_features, interpolate_scalar
from pixtrack_tpu.geometry.camera import Camera
from pixtrack_tpu.geometry.pose import Pose
from pixtrack_tpu.geometry.rotation import so3_hat


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """Static LM configuration (hashable -> usable as a jit static arg)."""

    num_iters: int = 150          # reference r9:47
    lambda_init: float = 1e-2     # pixloc LearnedOptimizer lambda_
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-7
    lambda_max: float = 1e4
    grad_stop_criteria: float = 1e-4   # pixloc defaults, used by early_stop
    dt_stop_criteria: float = 5e-3
    dR_stop_criteria: float = 5e-4     # degrees
    robust_c: float = 0.5         # Cauchy scale on residual norm (unit-norm feats)
    use_confidence: bool = True
    confidence_floor: float = 0.2  # keeps weights from collapsing (see
                                   # observations.observe_points docstring)
    eps: float = 1e-8
    # Cost-stagnation stop (Ceres-style function_tolerance), IN ADDITION to
    # the reference grad/step rule: stop after `stagnation_iters` consecutive
    # iterations without a relative best-cost improvement of `cost_rel_tol`.
    # pixloc's LEARNED damping shrinks steps to ~0 at convergence so its
    # step-size criteria fire; classic adaptive LM at a plateau keeps taking
    # small accept/reject bounces forever (measured: the fine level burns the
    # full 150 budget with the pose long converged). 0 disables.
    stagnation_iters: int = 10
    cost_rel_tol: float = 1e-4
    # A candidate step is only acceptable while it keeps at least this
    # fraction of the init evaluation's valid points in view: shrinking the
    # valid set shrinks the mean cost's support, so "escape by invalidity"
    # (large steps that push points off the feature map) can masquerade as
    # improvement. 0 disables.
    min_valid_frac: float = 0.5
    # Level-entry arbitration (align_pyramid): each finer level starts from
    # whichever of {the coarser level's result, the frame's init pose} has
    # the lower cost under ITS OWN residual. Guards against a coarse level
    # committing to a false basin that finer levels cannot escape — measured
    # on the near-rotationally-symmetric bench blob, where the UNet's
    # coarsest level walks from a <2 deg init to a stable ~16 deg attractor
    # whose FINE-level cost is higher than at the init (diag 2026-08-19);
    # two extra residual evaluations per level. The reference avoids this
    # only because pixloc's learned damping rarely moves far at the coarse
    # level; classic adaptive LM needs the guard.
    level_arbitration: bool = True


@flax.struct.dataclass
class LevelData:
    """Per-pyramid-level observation data (static shapes, padded + masked).

    p3d:    (N, 3) world points.
    f_ref:  (N, C) reference descriptors for each point.
    w_ref:  (N,) reference confidence per point (1.0 if none).
    mask:   (N,) bool — padding / track validity.
    fmap:   (H, W, C) query feature map for this level.
    conf:   (H, W) query confidence map (or None).
    scale:  (2,) (sx, sy) original-image -> feature coords multipliers.
    """

    p3d: jax.Array
    f_ref: jax.Array
    w_ref: jax.Array
    mask: jax.Array
    fmap: jax.Array
    conf: Optional[jax.Array]
    scale: jax.Array


@flax.struct.dataclass
class AlignState:
    """Result of one level (or full pyramid) of alignment."""

    T: Pose
    cost: jax.Array           # mean robust cost over valid points
    num_valid: jax.Array      # number of contributing points
    num_iters: jax.Array      # iterations actually run
    converged: jax.Array      # early-stop flag
    grad_norm: jax.Array


def _pack_level(data: LevelData):
    """Corner-pack the level's feature (+confidence) map once per align call;
    the LM loop then needs ONE gather row per point per iteration (see
    interpolate.pack_fmap). Returns (packed, has_conf)."""
    from pixtrack_tpu.align.interpolate import pack_fmap

    fm = data.fmap
    has_conf = data.conf is not None
    if has_conf:
        fm = jnp.concatenate([fm, data.conf[..., None]], axis=-1)
    return pack_fmap(fm), has_conf


def _point_weights(e2, cq, valid, data: LevelData, cfg: AlignConfig):
    """The ONE definition of per-point weighting, shared by every residual
    path (dense, and align_level's packed evaluate): static weights =
    validity x reference confidence x floored query confidence; robust
    weight = Cauchy d rho / d e2. Returns (w_static, w)."""
    w_static = jnp.where(valid, 1.0, 0.0)
    if cfg.use_confidence:
        w_static = w_static * data.w_ref
        if cq is not None:
            fl = cfg.confidence_floor
            w_static = w_static * (fl + (1.0 - fl) * jnp.clip(cq, 0.0, 1.0))
    w_robust = 1.0 / (1.0 + e2 / (cfg.robust_c**2))
    return w_static, w_static * w_robust


def _pixel_pose_jacobian(p_cam, camera: Camera, scale):
    """d p2d_feature / d (w, v): projection Jacobian (in feature-level
    coords) chained with the left-multiplicative se(3) point Jacobian
    [-hat(p_cam) | I]. Returns (N, 2, 6)."""
    N = p_cam.shape[0]
    J_pcam = jnp.concatenate(
        [-so3_hat(p_cam), jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), (N, 3, 3))],
        axis=-1,
    )
    J_proj = camera.project_jacobian(p_cam) * scale[None, :, None]
    return jnp.einsum("nij,njk->nik", J_proj, J_pcam)


def _residuals_and_jacobian(
    T: Pose, data: LevelData, camera: Camera, cfg: AlignConfig,
    compute_jac: bool = True,
):
    """Dense residual/Jacobian build over all points.

    r    (N, C)   residuals (query - reference features)
    J    (N, C, 6) d r / d (w, v) for the left-multiplicative se(3) delta
    w    (N,)     IRLS weights (static view weights x Cauchy robust weight)

    The IRLS weight is exactly d rho / d e2 of the objective used by
    ``residual_cost`` (static-weighted Cauchy cost), so the normal equations
    and the accept/reject test optimize the SAME scalar — an inconsistent
    pair silently vetoes good steps (observed: silhouette points with ~zero
    optimization weight still dominated an unweighted accept metric).
    """
    p_cam = T.transform(data.p3d)  # (N, 3)
    p2d_img, visible = camera.project(p_cam)
    p2d = p2d_img * data.scale  # feature-level coords

    f_q, grad, in_map = interpolate_features(data.fmap, p2d, compute_grad=compute_jac)
    r = f_q - data.f_ref  # (N, C)
    valid = data.mask & visible & in_map

    e2 = jnp.sum(r * r, axis=-1)  # (N,)
    cq = None
    if cfg.use_confidence and data.conf is not None:
        cq, _ = interpolate_scalar(data.conf, p2d)
    w_static, w = _point_weights(e2, cq, valid, data, cfg)

    if not compute_jac:
        return r, None, w, valid, (e2, w_static)

    J_pix = _pixel_pose_jacobian(p_cam, camera, data.scale)  # (N, 2, 6)
    J = jnp.einsum("ncd,ndk->nck", grad, J_pix)  # (N, C, 6)
    return r, J, w, valid, (e2, w_static)


def _mean_cost(e2, w_static, valid, cfg: AlignConfig):
    """Static-weighted Cauchy cost, normalized per valid point.

    rho(e2) = c^2 * log(1 + e2 / c^2); d rho / d e2 = 1 / (1 + e2 / c^2),
    which is exactly the robust IRLS weight used in the normal equations.
    """
    c2 = cfg.robust_c**2
    rho = c2 * jnp.log1p(e2 / c2)
    n = jnp.sum(valid)
    # An empty valid set must be the WORST cost, not a perfect one: a
    # divergent step that throws every point out of view otherwise scores
    # 0.0, beats every genuine cost, and gets accepted (measured: the
    # closed-loop mid level escaped to an all-invalid pose exactly this
    # way, collapsing the frame and triggering a spurious relocalization).
    return jnp.where(
        n > 0, jnp.sum(w_static * rho) / jnp.maximum(n, 1), jnp.inf
    )


def residual_cost(T: Pose, data: LevelData, camera: Camera, cfg: AlignConfig):
    """Cost at pose T (no Jacobian) — the LM accept/reject scalar and the
    tracker's adaptive cost threshold (r9:251-263)."""
    _, _, _, valid, (e2, w_static) = _residuals_and_jacobian(
        T, data, camera, cfg, compute_jac=False
    )
    return _mean_cost(e2, w_static, valid, cfg), jnp.sum(valid)


def align_level(
    T_init: Pose, data: LevelData, camera: Camera, cfg: AlignConfig
) -> AlignState:
    """Run LM on one pyramid level. Fully jittable; static iteration bound.

    Deferred-accept LM: each iteration makes ONE residual/Jacobian
    evaluation (at the current candidate). The candidate is accepted or
    rejected against the best cost so far using the cost that evaluation
    already produced; on rejection the next step re-solves from the BEST
    pose's memoized (H, g) with increased damping — no re-evaluation. The
    classic eval-step-eval loop costs exactly 2x this (measured: the LM is
    the per-frame bottleneck and each evaluation is feature-gather-bound)."""
    packed, has_conf = _pack_level(data)
    # Pin the packed map as a materialized loop input: when this align runs
    # inside the full frame program, XLA otherwise schedules/fuses the
    # feature-pyramid producer chain against the while loop and the loop's
    # per-iteration cost more than doubles (measured 72 -> 180 us/iter).
    packed = jax.lax.optimization_barrier(packed)

    def evaluate(T):
        """One residual/Jacobian evaluation -> (cost, g, H, n_valid).

        The naive normal equations build J = grad @ J_pix as an (N, C, 6)
        tensor and contract it twice; here the channel dimension is
        contracted FIRST (G = grad^T grad is 2x2, gr = grad^T r is 2), so
        every pose-side tensor is (N, 2, *) — algebraically identical
        H = J_pix^T (w G) J_pix and g = J_pix^T (w gr), ~6x less HBM traffic
        and fewer ops in the while-loop body (measured ~80 -> ~35 us/iter
        for the J/H/g chain at N=4096, C=13)."""
        from pixtrack_tpu.align.interpolate import interpolate_packed

        p_cam = T.transform(data.p3d)
        p2d_img, visible = camera.project(p_cam)
        p2d = p2d_img * data.scale

        vals, grad, in_map = interpolate_packed(packed, p2d, compute_grad=True)
        if has_conf:
            f_q, cq = vals[:, :-1], vals[:, -1]
            grad = grad[:, :-1]
        else:
            f_q, cq = vals, None
        r = f_q - data.f_ref
        valid = data.mask & visible & in_map

        e2 = jnp.sum(r * r, axis=-1)
        if not cfg.use_confidence:
            cq = None
        w_static, w = _point_weights(e2, cq, valid, data, cfg)
        cost = _mean_cost(e2, w_static, valid, cfg)

        J_pix = _pixel_pose_jacobian(p_cam, camera, data.scale)  # (N, 2, 6)

        G = jnp.einsum("nca,ncb->nab", grad, grad)          # (N, 2, 2)
        gr = jnp.einsum("nca,nc->na", grad, r)              # (N, 2)
        M = jnp.einsum("nab,nbk->nak", G * w[:, None, None], J_pix)
        H = jnp.einsum("nak,nal->kl", J_pix, M)
        g = jnp.einsum("nak,na->k", J_pix, gr * w[:, None])
        return cost, g, H, jnp.sum(valid)

    def solve(H, g, lam):
        diag = jnp.diagonal(H)
        H_damped = H + (lam * diag + cfg.eps) * jnp.eye(6, dtype=H.dtype)
        delta = -jax.scipy.linalg.solve(H_damped, g, assume_a="pos")
        return jnp.where(jnp.isfinite(delta), delta, 0.0)

    # carry: best (T, cost, g, H), candidate T, lam, i, done, gnorm, stall
    def body(carry):
        T_best, c_best, g_best, H_best, T_cand, lam, i, done, _, stall = carry
        c_cand, g_cand, H_cand, nv_cand = evaluate(T_cand)
        accept = (c_cand < c_best) & (nv_cand >= nv_floor)
        improved = c_cand < c_best * (1.0 - cfg.cost_rel_tol)

        T_b = jax.tree.map(lambda a, b: jnp.where(accept, a, b), T_cand, T_best)
        c_b = jnp.where(accept, c_cand, c_best)
        g_b = jnp.where(accept, g_cand, g_best)
        H_b = jnp.where(accept, H_cand, H_best)
        lam_next = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.lambda_min, cfg.lambda_max,
        )
        delta = solve(H_b, g_b, lam_next)
        T_next = T_b.retract(delta)

        # Reference early-stop rule (pixtrack_optimizer.py:6-18):
        # stop when ||grad|| small OR the accepted step is small.
        gnorm = jnp.linalg.norm(g_b)
        dR, dt = Pose.exp(delta).magnitude()
        small_grad = gnorm < cfg.grad_stop_criteria
        small_step = accept & (dt < cfg.dt_stop_criteria) & (dR < cfg.dR_stop_criteria)
        # plus the Ceres-style cost-stagnation rule (see AlignConfig)
        stall_next = jnp.where(improved, 0, stall + 1)
        stagnated = (cfg.stagnation_iters > 0) & (stall_next >= cfg.stagnation_iters)
        done_next = done | small_grad | small_step | stagnated
        return (T_b, c_b, g_b, H_b, T_next, lam_next, i + 1, done_next, gnorm,
                stall_next)

    def cond(carry):
        i, done = carry[6], carry[7]
        return (i < cfg.num_iters) & (~done)

    lam0 = jnp.asarray(cfg.lambda_init, jnp.float32)
    c0, g0, H0, nvalid0 = evaluate(T_init)
    nv_floor = jnp.asarray(cfg.min_valid_frac, jnp.float32) * nvalid0
    delta0 = solve(H0, g0, lam0)
    carry = (
        T_init, c0, g0, H0, T_init.retract(delta0), lam0,
        jnp.asarray(1), jnp.asarray(False), jnp.linalg.norm(g0), jnp.asarray(0),
    )
    T_best, c_best, g_best, H_best, _, lam, iters, done, gnorm, _ = (
        jax.lax.while_loop(cond, body, carry)
    )
    return AlignState(
        T=T_best, cost=c_best, num_valid=nvalid0, num_iters=iters,
        converged=done, grad_norm=gnorm,
    )


def align_level_traced(
    T_init: Pose, data: LevelData, camera: Camera, cfg: AlignConfig
) -> Tuple[AlignState, dict]:
    """align_level with a per-iteration trace (the DebugTracker role,
    reference localization/tracker.py:32-46): returns the final state plus
    {costs, dt, dR, accepted, active} arrays of length cfg.num_iters.
    Implemented as a fixed-length ``lax.scan`` of the SAME step math as
    align_level (entries after early-stop are masked via ``active``)."""

    def compute_step(T, lam):
        r, J, w, valid, (e2, w_static) = _residuals_and_jacobian(T, data, camera, cfg)
        cost = _mean_cost(e2, w_static, valid, cfg)
        wr = r * w[:, None]
        g = jnp.einsum("nck,nc->k", J, wr)
        H = jnp.einsum("nck,ncl->kl", J * w[:, None, None], J)
        diag = jnp.diagonal(H)
        H_damped = H + (lam * diag + cfg.eps) * jnp.eye(6, dtype=H.dtype)
        delta = -jax.scipy.linalg.solve(H_damped, g, assume_a="pos")
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return delta, g, cost

    def body(carry, _):
        T, lam, done = carry
        delta, g, cost = compute_step(T, lam)
        T_new = T.retract(delta)
        new_cost, nv_new = residual_cost(T_new, data, camera, cfg)
        accept = (new_cost < cost) & (nv_new >= nv_floor) & (~done)
        T_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), T_new, T)
        lam_next = jnp.where(
            done, lam,
            jnp.clip(jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
                     cfg.lambda_min, cfg.lambda_max),
        )
        gnorm = jnp.linalg.norm(g)
        dR, dt = Pose.exp(delta).magnitude()
        small_grad = gnorm < cfg.grad_stop_criteria
        small_step = accept & (dt < cfg.dt_stop_criteria) & (dR < cfg.dR_stop_criteria)
        done_next = done | small_grad | small_step
        rec = {
            "cost": jnp.where(done, jnp.nan, new_cost),
            "dt": jnp.where(done, jnp.nan, dt),
            "dR": jnp.where(done, jnp.nan, dR),
            "accepted": accept,
            "active": ~done,
        }
        return (T_next, lam_next, done_next), rec

    lam0 = jnp.asarray(cfg.lambda_init, jnp.float32)
    _, nv0 = residual_cost(T_init, data, camera, cfg)
    nv_floor = jnp.asarray(cfg.min_valid_frac, jnp.float32) * nv0
    (T, lam, done), trace = jax.lax.scan(
        body, (T_init, lam0, jnp.asarray(False)), None, length=cfg.num_iters
    )
    cost_final, nvalid = residual_cost(T, data, camera, cfg)
    state = AlignState(
        T=T, cost=cost_final, num_valid=nvalid,
        num_iters=jnp.sum(trace["active"]), converged=done,
        grad_norm=jnp.asarray(jnp.nan),
    )
    return state, trace


def align_pyramid(
    T_init: Pose,
    levels: Tuple[LevelData, ...],
    camera: Camera,
    cfg: AlignConfig,
) -> Tuple[AlignState, Tuple[AlignState, ...]]:
    """Coarse-to-fine alignment over pyramid levels.

    ``levels`` must be ordered fine -> coarse (the FeaturePyramid contract);
    iteration runs reversed, like the reference refiner. With
    ``cfg.level_arbitration`` each finer level re-judges the coarser result
    against the frame init under its own cost and starts from the better
    pose (see AlignConfig).
    """
    states = []
    T = T_init
    for li, data in enumerate(reversed(levels)):
        if cfg.level_arbitration and li > 0:
            c_carry, _ = residual_cost(T, data, camera, cfg)
            c_init, _ = residual_cost(T_init, data, camera, cfg)
            take_init = c_init < c_carry
            T = jax.tree.map(
                lambda a, b: jnp.where(take_init, a, b), T_init, T
            )
        st = align_level(T, data, camera, cfg)
        T = st.T
        states.append(st)
    return states[-1], tuple(states)
