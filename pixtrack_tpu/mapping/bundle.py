"""Joint bundle adjustment: poses + structure, dense-J Gauss-Newton.

The COLMAP/Ceres bundle-adjuster role (reference Dockerfile builds COLMAP
for exactly this; pixsfm refines it further). TPU-first design for the
object-rig scale this framework lives at (tens of cameras, hundreds to a
few thousand points): build the FULL dense Jacobian (2M x D) by scattering
per-observation analytic blocks and form the normal equations with one MXU
matmul — at D <= a few thousand, one dense solve beats sparse-Schur
bookkeeping on TPU by a wide margin and is exact.

Residuals are pixel reprojections with Cauchy IRLS weights; camera 0 is
gauge-fixed (its 6 columns are removed); the remaining scale gauge is
absorbed by LM damping and irrelevant to monocular consumers.

Used by: incremental SfM (two-view init polish + periodic global BA) and
standalone model refinement (`bundle_adjust_scene`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.rotation import so3_hat


def _f32_precision(fn):
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_f32_precision
@functools.partial(jax.jit, static_argnames=("iters", "robust_c_px"))
def bundle_adjust(
    poses: Pose,            # stacked (P, ...) w2c poses
    X: jax.Array,           # (N, 3)
    cam_idx: jax.Array,     # (M,) int32
    pt_idx: jax.Array,      # (M,) int32
    uv: jax.Array,          # (M, 2) index-centered pixel observations
    w_obs: jax.Array,       # (M,) observation weights (0 = padding)
    camera: Camera,
    iters: int = 20,
    robust_c_px: float = 2.0,
    damping: float = 1e-4,
) -> Tuple[Pose, jax.Array]:
    """Returns (refined poses, refined X). Camera 0 is held fixed.

    Levenberg-Marquardt with STEP ACCEPTANCE, not raw Gauss-Newton: each
    iteration's full step is kept only if it lowers the robust cost, else
    it is discarded and the damping is raised 10x (halved on success —
    the classic Marquardt schedule Ceres/COLMAP run). Acceptance is
    measured on a cost where invisible (behind-camera / off-frame)
    observations pay a CAP penalty larger than any visible residual —
    with the IRLS weights alone, an observation that leaves the frustum
    leaves the objective, so a diverging step that flips the model
    mirror-wise (all points behind all cameras) looks like a cost DROP
    and raw GN happily takes it (measured: the learned-descriptor arc
    rig's final-polish BA left 514/516 observations behind the cameras
    from a converged median-0.18 px model)."""
    P = poses.R.shape[0]
    N = X.shape[0]
    M = cam_idx.shape[0]
    D = 6 * (P - 1) + 3 * N
    c2 = robust_c_px**2
    # Cauchy loss matching the IRLS weight 1/(1+e2/c^2); invisible
    # observations pay the loss's value at a 1e3 px residual
    cap = c2 * jnp.log1p(1e6 / c2)

    def robust_cost(poses, X):
        R_i = poses.R[cam_idx]
        t_i = poses.t[cam_idx]
        p_cam = jnp.einsum("mij,mj->mi", R_i, X[pt_idx]) + t_i
        uv_hat, vis = camera.project(p_cam)
        e2 = jnp.sum((uv_hat - uv) ** 2, axis=-1)
        rho = c2 * jnp.log1p(jnp.minimum(e2, 1e6) / c2)
        return jnp.sum(w_obs * jnp.where(vis, rho, cap))

    def step(carry, _):
        poses, X, lam = carry
        R_i = poses.R[cam_idx]                    # (M, 3, 3)
        t_i = poses.t[cam_idx]
        Xj = X[pt_idx]
        p_cam = jnp.einsum("mij,mj->mi", R_i, Xj) + t_i
        uv_hat, vis = camera.project(p_cam)
        r = uv_hat - uv                            # (M, 2)
        e2 = jnp.sum(r * r, axis=-1)
        w = w_obs * jnp.where(vis, 1.0, 0.0) / (1.0 + e2 / robust_c_px**2)
        sw = jnp.sqrt(w)

        J_proj = camera.project_jacobian(p_cam)    # (M, 2, 3)
        # pose block: d p_cam / d (w_rot, v) for a LEFT delta = [-hat(p_cam)|I]
        J_pose = jnp.einsum(
            "mij,mjk->mik",
            J_proj,
            jnp.concatenate(
                [-so3_hat(p_cam),
                 jnp.broadcast_to(jnp.eye(3), (M, 3, 3))], axis=-1
            ),
        )                                          # (M, 2, 6)
        # point block: d p_cam / d X = R_i
        J_pt = jnp.einsum("mij,mjk->mik", J_proj, R_i)  # (M, 2, 3)

        # dense J (2M, D): camera columns then point columns
        J = jnp.zeros((2 * M, D))
        rows = jnp.arange(M)
        # camera 0 is gauge-fixed: its block maps to dead columns via clamp +
        # zero weight
        cam_cols = (cam_idx - 1) * 6
        cam_live = (cam_idx > 0).astype(jnp.float32)[:, None, None]
        rr = jnp.stack([2 * rows, 2 * rows + 1], axis=1)  # (M, 2)
        cc_cam = jnp.maximum(cam_cols, 0)[:, None] + jnp.arange(6)[None]  # (M, 6)
        J = J.at[rr[:, :, None], cc_cam[:, None, :]].add(
            J_pose * cam_live * sw[:, None, None]
        )
        cc_pt = 6 * (P - 1) + pt_idx[:, None] * 3 + jnp.arange(3)[None]
        J = J.at[rr[:, :, None], cc_pt[:, None, :]].add(
            J_pt * sw[:, None, None]
        )
        rflat = (r * sw[:, None]).reshape(-1)

        H = J.T @ J + lam * jnp.eye(D)
        g = J.T @ rflat
        delta = -jnp.linalg.solve(H, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

        d_cam = delta[: 6 * (P - 1)].reshape(P - 1, 6)
        d_cam = jnp.concatenate([jnp.zeros((1, 6)), d_cam], axis=0)
        poses_new = poses.retract(d_cam)
        X_new = X + delta[6 * (P - 1):].reshape(N, 3)

        c_old = robust_cost(poses, X)
        c_new = robust_cost(poses_new, X_new)
        accept = c_new < c_old
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), poses_new, poses
        )
        X = jnp.where(accept, X_new, X)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                        jnp.minimum(lam * 10.0, 1e5))
        return (poses, X, lam), jnp.minimum(c_old, c_new)

    (poses, X, _), costs = jax.lax.scan(
        step, (poses, X, jnp.float32(damping)), None, length=iters
    )
    return poses, X


def bundle_adjust_scene(scene, iters: int = 20, robust_c_px: float = 2.0,
                        max_points: int = 4000):
    """Run BA over a SceneModel in place of COLMAP's bundle_adjuster CLI.

    Subsamples to the ``max_points`` longest tracks when the model is larger
    than the dense-J design point. Returns a NEW SceneModel.
    """
    from pixtrack_tpu.sfm import colmap_io
    from pixtrack_tpu.sfm.scene import SceneModel

    pids = sorted(scene.points3D)
    if len(pids) > max_points:
        pids = sorted(
            pids, key=lambda p: len(scene.points3D[p].image_ids), reverse=True
        )[:max_points]
    pid_to_row = {p: k for k, p in enumerate(pids)}
    iid_list = sorted(scene.images)
    iid_to_row = {i: k for k, i in enumerate(iid_list)}

    cam_idx, pt_idx, uvs = [], [], []
    for p in pids:
        rec = scene.points3D[p]
        for iid, kidx in zip(rec.image_ids, rec.point2D_idxs):
            im = scene.images[int(iid)]
            cam_idx.append(iid_to_row[int(iid)])
            pt_idx.append(pid_to_row[p])
            uvs.append(im.xys[int(kidx)] - 0.5)  # index-centered
    cam_idx = jnp.asarray(np.asarray(cam_idx, np.int32))
    pt_idx = jnp.asarray(np.asarray(pt_idx, np.int32))
    uvs = jnp.asarray(np.asarray(uvs, np.float32))
    w_obs = jnp.ones(cam_idx.shape[0])

    poses = Pose.from_quat_t(
        jnp.asarray(scene.qvecs[[scene._imgidx[i] for i in iid_list]], jnp.float32),
        jnp.asarray(scene.tvecs[[scene._imgidx[i] for i in iid_list]], jnp.float32),
    )
    X = jnp.asarray(scene.xyz[[scene._ptidx[p] for p in pids]], jnp.float32)
    camera = scene.camera(scene.cameras[next(iter(scene.cameras))].camera_id)

    poses2, X2 = bundle_adjust(
        poses, X, cam_idx, pt_idx, uvs, w_obs, camera,
        iters=iters, robust_c_px=robust_c_px,
    )

    # write back
    images = dict(scene.images)
    for k, iid in enumerate(iid_list):
        T = Pose.from_Rt(poses2.R[k], poses2.t[k])
        q, t = T.to_quat_t()
        rec = images[iid]
        images[iid] = colmap_io.ImageRecord(
            rec.image_id, np.asarray(q, np.float64), np.asarray(t, np.float64),
            rec.camera_id, rec.name, rec.xys, rec.point3D_ids,
        )
    points = dict(scene.points3D)
    X2 = np.asarray(X2, np.float64)
    for p in pids:
        rec = points[p]
        points[p] = colmap_io.Point3DRecord(
            rec.id, X2[pid_to_row[p]], rec.rgb, rec.error,
            rec.image_ids, rec.point2D_idxs,
        )
    return SceneModel(scene.cameras, images, points)
