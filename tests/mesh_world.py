"""Mesh-backed tracking world for robustness testing.

Like tests/synthetic_world.py but the object is a textured MESH rendered
exactly (mapping/mesh_render): the reference views the tracker renders are
pixel-exact (MeshTestbed), so every tracking error measured here is caused
by the QUERY-side nuisances (noise, lighting, blur, clutter, occlusion) —
the robustness axis the reference gets from real premier_protein/YCB videos
(BASELINE.json configs 2/4), reconstructed offline."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.mapping.mesh_render import MeshTestbed, load_obj, render_mesh
from pixtrack_tpu.sfm import colmap_io
from pixtrack_tpu.sfm.scene import SceneModel

from synthetic_world import look_at_w2c


def sample_mesh_surface(mesh: dict, n: int, seed: int = 0) -> np.ndarray:
    """Uniform-by-area points on the mesh surface."""
    rng = np.random.default_rng(seed)
    V, F = mesh["vertices"], mesh["faces"]
    v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    fi = rng.choice(len(F), size=n, p=area / area.sum())
    r1, r2 = rng.uniform(size=(2, n))
    s1 = np.sqrt(r1)
    w = np.stack([1 - s1, s1 * (1 - r2), s1 * r2], axis=1)
    return (
        w[:, 0:1] * V[F[fi, 0]] + w[:, 1:2] * V[F[fi, 1]] + w[:, 2:3] * V[F[fi, 2]]
    ).astype(np.float32)


def make_mesh_scene(
    mesh: dict, camera: Camera, n_refs: int = 12, n_points: int = 600,
    dist: float = 0.9, seed: int = 0,
) -> SceneModel:
    """SfM stand-in: ring of reference views observing surface points, with
    exact z-buffer visibility (a point is observed iff its depth matches
    the render's depth buffer at its projection)."""
    p3d = sample_mesh_surface(mesh, n_points, seed=seed)
    W = int(float(camera.width))
    H = int(float(camera.height))
    cameras = {
        1: colmap_io.CameraRecord(
            1, "PINHOLE", W, H,
            np.array([
                float(camera.f[0]), float(camera.f[1]),
                float(camera.c[0]) + 0.5, float(camera.c[1]) + 0.5,
            ]),
        )
    }
    images = {}
    tracks = {k: ([], []) for k in range(n_points)}
    for i in range(n_refs):
        ang = 2 * np.pi * i / n_refs
        el = 0.35 + 0.15 * np.sin(2 * ang)
        center = dist * np.array([np.sin(ang), el, np.cos(ang)])
        T = look_at_w2c(center)
        _, depth = render_mesh(mesh, T, camera, return_depth=True)
        p_cam = np.asarray(T.transform(jnp.asarray(p3d)))
        p2d, valid = camera.world2image(T, jnp.asarray(p3d))
        p2d, valid = np.asarray(p2d), np.asarray(valid)
        xi = np.clip(np.round(p2d[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(p2d[:, 1]).astype(int), 0, H - 1)
        zbuf = depth[yi, xi]
        vis = valid & (zbuf > 0) & (np.abs(p_cam[:, 2] - zbuf) < 0.02 * dist)
        obs = np.nonzero(vis)[0]
        q, t = T.to_quat_t()
        for row, pid in enumerate(obs):
            tracks[int(pid)][0].append(i + 1)
            tracks[int(pid)][1].append(row)
        images[i + 1] = colmap_io.ImageRecord(
            i + 1, np.asarray(q, np.float64), np.asarray(t, np.float64),
            1, f"ref_{i:04d}.png", p2d[obs], obs.astype(np.int64),
        )
    points = {}
    for pid, (iids, idxs) in tracks.items():
        if len(iids) < 2:
            continue
        points[pid] = colmap_io.Point3DRecord(
            pid, p3d[pid].astype(np.float64),
            np.array([128, 128, 128], np.uint8), 0.1,
            np.array(iids, np.int32), np.array(idxs, np.int32),
        )
    return SceneModel(cameras, images, points)


# --------------------------------------------------------------- nuisances ---
def motion_blur(img: np.ndarray, length: int, angle_deg: float) -> np.ndarray:
    """Directional box blur (camera motion during exposure)."""
    if length <= 1:
        return img
    k = np.zeros((length, length), np.float32)
    c = (length - 1) / 2
    a = np.deg2rad(angle_deg)
    for i in range(length * 4):
        s = (i / (length * 4 - 1) - 0.5) * (length - 1)
        x = int(round(c + s * np.cos(a)))
        y = int(round(c + s * np.sin(a)))
        k[y, x] = 1.0
    k /= k.sum()
    from scipy.ndimage import convolve

    out = np.stack(
        [convolve(img[..., c_].astype(np.float32), k, mode="nearest")
         for c_ in range(img.shape[-1])], axis=-1,
    )
    return out


def clutter_background(shape, seed: int = 0) -> np.ndarray:
    """Structured background clutter (smoothed random blobs + edges)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    H, W = shape[:2]
    bg = rng.uniform(0, 255, (H, W, 3))
    bg = gaussian_filter(bg, (4, 4, 0))
    # hard edges: random rectangles
    for _ in range(12):
        x0, y0 = rng.integers(0, W - 8), rng.integers(0, H - 8)
        w, h = rng.integers(8, W // 3), rng.integers(8, H // 3)
        bg[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 255, 3)
    bg = gaussian_filter(bg, (1, 1, 0))
    return ((bg - bg.min()) / np.ptp(bg) * 255).astype(np.uint8)


def apply_query_nuisances(
    img: np.ndarray, alpha: np.ndarray, rng,
    noise: float = 0.0,            # gaussian sigma in [0,1] units
    gain: float = 1.0,
    bias: float = 0.0,
    gamma: float = 1.0,
    blur_len: int = 1,
    background: np.ndarray | None = None,
    occluder_frac: float = 0.0,
) -> np.ndarray:
    """Nuisance stack applied to a rendered query frame (uint8 in, uint8
    out). ``alpha``: object mask from the exact render (composites clutter
    where the object is not)."""
    out = img.astype(np.float32) / 255.0
    if background is not None:
        bg = background.astype(np.float32) / 255.0
        out = np.where(alpha[..., None] > 0.5, out, bg)
    out = np.clip(out, 1e-4, 1.0) ** gamma
    out = out * gain + bias
    if blur_len > 1:
        out = motion_blur(out, blur_len, float(rng.uniform(0, 180)))
    if noise > 0:
        out = out + rng.normal(0, noise, out.shape)
    if occluder_frac > 0:
        H, W = out.shape[:2]
        w = int(W * occluder_frac)
        h = int(H * occluder_frac)
        x0 = int(rng.integers(0, W - w))
        y0 = int(rng.integers(0, H - h))
        out[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 1, 3)
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)


def build_mesh_world(tmp_path, res: int = 192, n_frames: int = 10,
                     n_refs: int = 12, n_points: int = 600):
    """(scene, testbed, nerf2sfm, camera, gt_poses, clean frames+alphas)."""
    from test_mesh_render import make_cube_obj

    obj = make_cube_obj(tmp_path)
    mesh = load_obj(obj)
    camera = Camera.pinhole(
        res * 1.1, res * 1.1, (res - 1) / 2, (res - 1) / 2, res, res
    )
    testbed = MeshTestbed(mesh)
    nerf2sfm = NerfTransform.identity()
    scene = make_mesh_scene(mesh, camera, n_refs=n_refs, n_points=n_points)

    gt = []
    for i in range(n_frames):
        ang = 0.05 * i
        el = 0.35 + 0.06 * np.sin(0.5 * i)
        center = 0.9 * np.array([np.sin(ang), el, np.cos(ang)])
        gt.append(look_at_w2c(center))
    frames = []
    for i, T in enumerate(gt):
        img, depth = render_mesh(mesh, T, camera, return_depth=True)
        frames.append((f"frame_{i:04d}.png", img, (depth > 0).astype(np.float32)))
    return scene, testbed, nerf2sfm, camera, gt, frames, mesh
