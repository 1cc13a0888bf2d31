"""NeRF training dataset: transforms.json loader + ray batch sampling.

Consumes the same ``transforms.json`` the reference's asset pipeline writes
(pixtrack/utils/colmap2ingp.py:356-371: camera_angle_x, fl_x/fl_y/cx/cy,
w/h, aabb_scale, frames[{file_path, transform_matrix, rotation}]) so assets
interoperate both ways.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from pixtrack_tpu.nerf.render import rays_from_camera


@dataclasses.dataclass
class NerfDataset:
    images: np.ndarray  # (N, H, W, 3) float32 linear [0, 1]
    c2w: np.ndarray  # (N, 4, 4) NeRF-space OpenGL camera-to-world
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    aabb_scale: int = 4

    @property
    def n_images(self):
        return len(self.images)

    @classmethod
    def from_transforms(cls, transforms_path, downscale: int = 1) -> "NerfDataset":
        """Load images + poses from a transforms.json (instant-ngp layout)."""
        import cv2

        transforms_path = Path(transforms_path)
        with open(transforms_path) as f:
            meta = json.load(f)
        root = transforms_path.parent
        frames = meta["frames"]
        images, poses = [], []
        for fr in frames:
            p = root / fr["file_path"]
            if not p.exists() and not str(p).lower().endswith((".png", ".jpg", ".jpeg")):
                for ext in (".png", ".jpg", ".jpeg"):
                    if p.with_suffix(ext).exists():
                        p = p.with_suffix(ext)
                        break
            img = cv2.imread(str(p), cv2.IMREAD_COLOR)
            if img is None:
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if downscale > 1:
                img = cv2.resize(
                    img,
                    (img.shape[1] // downscale, img.shape[0] // downscale),
                    interpolation=cv2.INTER_AREA,
                )
            images.append(img.astype(np.float32) / 255.0)
            poses.append(np.asarray(fr["transform_matrix"], np.float64))
        images = np.stack(images)
        poses = np.stack(poses).astype(np.float32)
        H, W = images.shape[1:3]
        # transforms.json stores corner-convention principal points; convert
        # to the package-wide index-centered convention (-0.5).
        if "fl_x" in meta:
            fx, fy = meta["fl_x"] / downscale, meta["fl_y"] / downscale
            cx = meta["cx"] / downscale - 0.5
            cy = meta["cy"] / downscale - 0.5
        else:
            cam_angle = float(meta["camera_angle_x"])
            fx = fy = 0.5 * W / np.tan(0.5 * cam_angle)
            cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
        return cls(
            images=images, c2w=poses, fx=float(fx), fy=float(fy),
            cx=float(cx), cy=float(cy), width=W, height=H,
            aabb_scale=int(meta.get("aabb_scale", 4)),
        )

    def all_rays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Precompute every training ray: (origins, dirs, rgb) flat arrays."""
        import jax.numpy as jnp

        origins, dirs, rgbs = [], [], []
        for i in range(self.n_images):
            o, d = rays_from_camera(
                jnp.asarray(self.c2w[i]), self.fx, self.fy, self.cx, self.cy,
                self.width, self.height,
            )
            origins.append(np.asarray(o))
            dirs.append(np.asarray(d))
            rgbs.append(self.images[i].reshape(-1, 3))
        return (
            np.concatenate(origins).astype(np.float32),
            np.concatenate(dirs).astype(np.float32),
            np.concatenate(rgbs).astype(np.float32),
        )


def make_synthetic_dataset(
    field_fn, n_views: int = 20, res: int = 64, radius: float = 3.2, seed: int = 0
) -> NerfDataset:
    """Render a synthetic analytic scene into a dataset (for tests/benchmarks).

    ``field_fn(x_grid (N,3)) -> (sigma (N,), rgb (N,3))`` defines the scene in
    grid space; views are placed on a sphere looking at the NeRF-space origin.
    """
    import jax
    import jax.numpy as jnp

    from pixtrack_tpu.nerf.render import RenderConfig, _to_grid, ray_aabb_intersect

    rng = np.random.default_rng(seed)
    fx = fy = res * 1.1
    cx = cy = (res - 1) / 2.0
    images, poses = [], []
    cfg = RenderConfig(n_coarse=96, n_fine=0, perturb=False)
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])

    @jax.jit
    def render_view_jit(c2w):
        # feature-major layout throughout (big sample axis LAST -> TPU lanes;
        # the naive (R, S, 3) einsum pads 42x and costs ~1 GB of HBM traffic
        # per call)
        o, d = rays_from_camera(c2w, fx, fy, cx, cy, res, res)
        o_g, d_g = _to_grid(o, d)
        t0, t1, hit = ray_aabb_intersect(o_g, d_g, aabb[0], aabb[1])
        t1 = jnp.maximum(t1, t0 + 1e-4)
        S = cfg.n_coarse
        ts = t0[:, None] + (t1 - t0)[:, None] * (jnp.arange(S) + 0.5) / S  # (R, S)
        oT, dT = o_g.T, d_g.T  # (3, R)
        x = (oT[:, :, None] + ts[None] * dT[:, :, None]).reshape(3, -1)  # (3, R*S)
        field_T = globals().get(field_fn.__name__ + "_T")
        if field_T is not None:
            sigma, rgbT = field_T(x)
        else:
            sigma, rgb = field_fn(x.T)
            rgbT = rgb.T
        R_ = ts.shape[0]
        sigma = sigma.reshape(R_, S)
        rgbT = rgbT.reshape(3, R_, S)
        deltas = jnp.diff(ts, axis=-1)
        deltas = jnp.concatenate([deltas, deltas[:, -1:]], axis=-1)
        alpha = 1.0 - jnp.exp(-sigma * deltas)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
        w = alpha * trans * hit[:, None]  # (R, S)
        out = jnp.einsum("rs,crs->rc", w, rgbT) + (1 - jnp.sum(w, -1))[:, None]
        return out.reshape(res, res, 3)

    def render_view(c2w):
        return np.asarray(render_view_jit(jnp.asarray(c2w, jnp.float32)))

    for i in range(n_views):
        # look-at camera on a sphere (OpenGL convention: z backward)
        theta = 2 * np.pi * i / n_views
        phi = np.deg2rad(rng.uniform(-35, 35))
        center = radius * np.array(
            [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)]
        )
        z = center / np.linalg.norm(center)  # backward = away from origin
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, center
        images.append(render_view(c2w))
        poses.append(c2w)
    return NerfDataset(
        images=np.stack(images), c2w=np.stack(poses), fx=fx, fy=fy, cx=cx, cy=cy,
        width=res, height=res, aabb_scale=1,
    )


def sphere_scene_T(xT):
    """Analytic test scene, feature-major: xT (3, N) -> (sigma (N,), rgb (3, N))."""
    import jax.numpy as jnp

    d = jnp.sqrt(jnp.sum((xT - 0.5) ** 2, axis=0))
    sigma = jnp.where(d < 0.12, 80.0, 0.0)
    rgb = jnp.stack(
        [
            0.5 + 0.5 * jnp.sin(20 * xT[0]),
            0.5 + 0.5 * jnp.cos(20 * xT[1]),
            jnp.full_like(d, 0.4),
        ],
        axis=0,
    )
    return sigma, rgb


def sphere_scene(x_grid):
    """Points-major wrapper: (N, 3) -> (sigma (N,), rgb (N, 3))."""
    sigma, rgbT = sphere_scene_T(x_grid.T)
    return sigma, rgbT.T


def blob_scene_T(xT):
    """Analytic ASYMMETRIC test scene, feature-major: xT (3, N).

    A single centered sphere is adversarial for pose tracking: its silhouette
    is viewpoint-invariant on a look-at orbit, and silhouette gradients (the
    strongest features against a black background) then vote for zero camera
    motion. Real objects are asymmetric; so is this one.
    """
    import jax.numpy as jnp

    centers = [(0.5, 0.5, 0.5), (0.58, 0.54, 0.46), (0.45, 0.44, 0.56)]
    radii = (0.10, 0.07, 0.06)
    inside = None
    for (cx, cy, cz), r in zip(centers, radii):
        d2 = (xT[0] - cx) ** 2 + (xT[1] - cy) ** 2 + (xT[2] - cz) ** 2
        hit = d2 < r * r
        inside = hit if inside is None else (inside | hit)
    sigma = jnp.where(inside, 80.0, 0.0)
    rgb = jnp.stack(
        [
            0.5 + 0.5 * jnp.sin(40 * xT[0] + 13 * xT[2]),
            0.5 + 0.5 * jnp.cos(40 * xT[1]),
            0.5 + 0.5 * jnp.sin(25 * (xT[0] + xT[1])),
        ],
        axis=0,
    )
    return sigma, rgb


def blob_scene(x_grid):
    """Points-major wrapper: (N, 3) -> (sigma (N,), rgb (N, 3))."""
    sigma, rgbT = blob_scene_T(x_grid.T)
    return sigma, rgbT.T
