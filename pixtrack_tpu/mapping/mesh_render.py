"""Textured-mesh rendering for the object pipeline (PyTorch3D role).

The reference's obj pipeline renders an icosphere rig of views of a textured
.obj with PyTorch3D and triangulates them against the renderer's GT poses
(pixtrack/utils/pytorch3d_render_utils.py + scripts/create_sfm_from_obj.py).
First-party equivalent: a small OBJ/MTL loader and a vectorized z-buffer
rasterizer with barycentric texture lookup (numpy; offline-rate tool), plus
the same look-at rig sized to the mesh bounds.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from pixtrack_tpu.geometry import Camera, Pose


# ------------------------------------------------------------- OBJ loading ----
def load_obj(path) -> dict:
    """Minimal OBJ loader: vertices, uvs, faces (v/vt), texture path."""
    path = Path(path)
    verts: List[List[float]] = []
    uvs: List[List[float]] = []
    faces_v: List[List[int]] = []
    faces_vt: List[List[int]] = []
    mtl = None
    for line in path.read_text().splitlines():
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "v":
            verts.append([float(x) for x in tok[1:4]])
        elif tok[0] == "vt":
            uvs.append([float(tok[1]), float(tok[2])])
        elif tok[0] == "mtllib":
            mtl = path.parent / tok[1]
        elif tok[0] == "f":
            fv, fvt = [], []
            for part in tok[1:]:
                comps = part.split("/")
                fv.append(int(comps[0]) - 1)
                fvt.append(int(comps[1]) - 1 if len(comps) > 1 and comps[1] else 0)
            # fan-triangulate polygons
            for k in range(1, len(fv) - 1):
                faces_v.append([fv[0], fv[k], fv[k + 1]])
                faces_vt.append([fvt[0], fvt[k], fvt[k + 1]])
    texture = None
    if mtl is not None and mtl.exists():
        for line in mtl.read_text().splitlines():
            tok = line.split()
            if tok and tok[0] == "map_Kd":
                import cv2

                tex_path = mtl.parent / tok[-1]
                img = cv2.imread(str(tex_path), cv2.IMREAD_COLOR)
                if img is not None:
                    texture = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    return {
        "vertices": np.asarray(verts, np.float64),
        "uvs": np.asarray(uvs, np.float64) if uvs else np.zeros((1, 2)),
        "faces": np.asarray(faces_v, np.int64),
        "faces_uv": np.asarray(faces_vt, np.int64),
        "texture": texture,
    }


# ------------------------------------------------------------ look-at rig ----
def icosphere_directions(subdiv: int = 1) -> np.ndarray:
    """Unit directions from icosahedron vertices (+ optional midpoints)."""
    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    if subdiv >= 1:
        # add edge midpoints of the convex hull edges (enough view coverage)
        from itertools import combinations

        extra = []
        for a, b in combinations(range(len(v)), 2):
            if v[a] @ v[b] > 0.4:  # adjacent
                m = v[a] + v[b]
                extra.append(m / np.linalg.norm(m))
        v = np.unique(np.round(np.concatenate([v, extra]), 9), axis=0)
    return v


def look_at_rig_for_mesh(
    vertices: np.ndarray, n_margin: float = 2.8, subdiv: int = 1
) -> List[Pose]:
    """World-to-camera poses on a sphere sized to the mesh bounds, looking at
    the mesh centroid (the reference's create_look_at_poses_for_mesh role)."""
    center = vertices.mean(axis=0)
    radius = np.linalg.norm(vertices - center, axis=1).max()
    dist = radius * n_margin
    poses = []
    for d in icosphere_directions(subdiv):
        eye = center + d * dist
        up = np.array([0.0, 1.0, 0.0])
        if abs(d @ up) > 0.95:
            up = np.array([1.0, 0.0, 0.0])
        z = center - eye
        z = z / np.linalg.norm(z)
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)
        t = (-R @ eye).astype(np.float32)
        poses.append(Pose.from_Rt(R, t))
    return poses


# -------------------------------------------------------------- rasterizer ----
def render_mesh(
    mesh: dict, T_w2c: Pose, camera: Camera, background=(1.0, 1.0, 1.0),
    ambient: float = 0.55, directional: float = 0.45,
    return_depth: bool = False,
) -> np.ndarray:
    """Z-buffered rasterization with barycentric texture / vertex shading.

    Vectorized per-triangle bounding-box fill (numpy); adequate for the
    offline icosphere rig (tens of views).
    """
    import jax.numpy as jnp

    W = int(float(camera.width))
    H = int(float(camera.height))
    V = mesh["vertices"].astype(np.float32)
    F = mesh["faces"]
    p_cam = np.asarray(T_w2c.transform(jnp.asarray(V)))
    p2d, _ = camera.project(jnp.asarray(p_cam))
    p2d = np.asarray(p2d)
    z = p_cam[:, 2]

    img = np.ones((H, W, 3), np.float32) * np.asarray(background, np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)

    tex = mesh.get("texture")
    uvs = mesh["uvs"]
    fuv = mesh["faces_uv"]

    # face normals for shading
    v0w, v1w, v2w = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    nrm = np.cross(v1w - v0w, v2w - v0w)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    cam_center = np.asarray(T_w2c.center)
    light_dir = cam_center - V.mean(axis=0)
    light_dir /= np.linalg.norm(light_dir)
    shade_f = ambient + directional * np.abs(nrm @ light_dir)

    order = np.argsort(-np.minimum.reduce([z[F[:, 0]], z[F[:, 1]], z[F[:, 2]]]))
    for fi in order:
        i0, i1, i2 = F[fi]
        if z[i0] <= 1e-4 or z[i1] <= 1e-4 or z[i2] <= 1e-4:
            continue
        tri = p2d[[i0, i1, i2]]
        xmin = max(int(np.floor(tri[:, 0].min())), 0)
        xmax = min(int(np.ceil(tri[:, 0].max())) + 1, W)
        ymin = max(int(np.floor(tri[:, 1].min())), 0)
        ymax = min(int(np.ceil(tri[:, 1].max())) + 1, H)
        if xmin >= xmax or ymin >= ymax:
            continue
        xs, ys = np.meshgrid(np.arange(xmin, xmax), np.arange(ymin, ymax))
        # barycentric coords
        d = (tri[1, 1] - tri[2, 1]) * (tri[0, 0] - tri[2, 0]) + (
            tri[2, 0] - tri[1, 0]
        ) * (tri[0, 1] - tri[2, 1])
        if abs(d) < 1e-12:
            continue
        l0 = ((tri[1, 1] - tri[2, 1]) * (xs - tri[2, 0]) + (tri[2, 0] - tri[1, 0]) * (ys - tri[2, 1])) / d
        l1 = ((tri[2, 1] - tri[0, 1]) * (xs - tri[2, 0]) + (tri[0, 0] - tri[2, 0]) * (ys - tri[2, 1])) / d
        l2 = 1.0 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        # perspective-correct interpolation in 1/z
        iz = l0 / z[i0] + l1 / z[i1] + l2 / z[i2]
        zpix = 1.0 / np.maximum(iz, 1e-12)
        closer = inside & (zpix < zbuf[ymin:ymax, xmin:xmax])
        if not closer.any():
            continue
        if tex is not None and len(uvs) > 1:
            u0, u1, u2 = uvs[fuv[fi, 0]], uvs[fuv[fi, 1]], uvs[fuv[fi, 2]]
            u = (l0 * u0[0] / z[i0] + l1 * u1[0] / z[i1] + l2 * u2[0] / z[i2]) * zpix
            v = (l0 * u0[1] / z[i0] + l1 * u1[1] / z[i1] + l2 * u2[1] / z[i2]) * zpix
            th, tw = tex.shape[:2]
            ui = np.clip((u * (tw - 1)).astype(int), 0, tw - 1)
            vi = np.clip(((1 - v) * (th - 1)).astype(int), 0, th - 1)
            color = tex[vi, ui]
        else:
            color = np.ones((*xs.shape, 3), np.float32) * 0.7
        color = color * shade_f[fi]
        region_img = img[ymin:ymax, xmin:xmax]
        region_z = zbuf[ymin:ymax, xmin:xmax]
        region_img[closer] = color[closer]
        region_z[closer] = zpix[closer]

    out = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    if return_depth:
        depth = np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)
        return out, depth
    return out


class MeshTestbed:
    """Testbed-surface renderer backed by the mesh rasterizer.

    Drop-in for ``nerf.testbed.Testbed`` wherever the tracker/viz render
    through ``render_nerf_view`` (Shade and Depth modes, exact-intrinsics
    override, alpha from the z-buffer). Purpose: EXACT reference renders of
    a mesh object so tracker robustness can be measured with zero
    NeRF-reconstruction error in the loop (tests/test_robustness.py), and
    mesh-world pipelines can run without training an NGP first. Assumes the
    identity NerfTransform (pose_sfm_to_nerf with default parameters), which
    it inverts to recover the SfM-space w2c pose from the NeRF-space camera
    matrix it is handed."""

    def __init__(self, mesh: dict):
        from pixtrack_tpu.nerf.testbed import RenderMode, _AABB
        from types import SimpleNamespace

        self.mesh = mesh
        self.render_mode = RenderMode.Shade
        self.render_aabb = _AABB()
        self.background_color = [1.0, 1.0, 1.0, 0.0]
        self.snap_to_pixel_centers = True
        self.fov_axis = 0
        self.exposure = 0.0
        self.shall_train = False
        self.nerf = SimpleNamespace(
            sharpen=0.0, render_with_camera_distortion=False,
            rendering_min_transmittance=1e-7,
        )
        self._fov_deg = 50.0
        self.override_intrinsics = None
        self._camera = np.eye(4)
        self.n_coarse = 0  # accepted for Testbed parity; unused
        self.n_fine = 0

    @property
    def fov(self) -> float:
        return self._fov_deg

    @fov.setter
    def fov(self, deg: float) -> None:
        self._fov_deg = float(deg)

    def set_nerf_camera_matrix(self, m) -> None:
        cam = np.eye(4)
        cam[:3, :4] = np.asarray(m, np.float64)[:3, :4]
        self._camera = cam

    def render(self, width: int, height: int, spp: int = 1,
               linear: bool = True, seed: int = 0) -> np.ndarray:
        from pixtrack_tpu.geometry.nerf_transform import NerfTransform
        from pixtrack_tpu.nerf.testbed import RenderMode

        n2s = NerfTransform.identity()
        c2w_sfm = n2s.pose_nerf_to_sfm(self._camera)
        R = c2w_sfm[:3, :3].T
        t = -R @ c2w_sfm[:3, 3]
        T_w2c = Pose.from_Rt(R.astype(np.float32), t.astype(np.float32))

        if self.override_intrinsics is not None:
            fx, fy, cx, cy = self.override_intrinsics
        else:
            half = np.deg2rad(self._fov_deg) / 2.0
            fx = fy = (width / 2.0) / np.tan(half)
            cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
        camera = Camera.pinhole(fx, fy, cx, cy, width, height)

        img, depth = render_mesh(
            self.mesh, T_w2c, camera,
            background=tuple(self.background_color[:3]), return_depth=True,
        )
        alpha = (depth > 0).astype(np.float32)
        if self.render_mode == RenderMode.Depth:
            return np.concatenate(
                [np.repeat(depth[..., None], 3, axis=-1), alpha[..., None]],
                axis=-1,
            ).astype(np.float32)
        rgba = np.concatenate(
            [img.astype(np.float32) / 255.0, alpha[..., None]], axis=-1
        )
        return rgba


def create_scene_from_mesh(
    obj_path,
    image_size: int = 512,
    focal: float = 450.0,
    subdiv: int = 1,
    out_dir: Optional[Path] = None,
    max_keypoints: int = 1024,
):
    """obj pipeline stage 1 (create_sfm_from_obj role): render the icosphere
    rig, detect/match/triangulate against the renderer's GT poses."""
    from pixtrack_tpu.pipelines.assets import reconstruct_from_posed_views
    from pixtrack_tpu.sfm import colmap_io

    mesh = load_obj(obj_path)
    poses = look_at_rig_for_mesh(mesh["vertices"], subdiv=subdiv)
    cam = Camera.pinhole(
        focal, focal, (image_size - 1) / 2, (image_size - 1) / 2,
        image_size, image_size,
    )
    cam_rec = colmap_io.CameraRecord(
        1, "PINHOLE", image_size, image_size,
        np.array([focal, focal, image_size / 2, image_size / 2]),
    )
    images, pose_map, names = {}, {}, {}
    for i, T in enumerate(poses):
        img = render_mesh(mesh, T, cam, background=(1, 1, 1))
        images[i + 1] = img
        pose_map[i + 1] = T
        names[i + 1] = f"mesh_{i:04d}.png"
        if out_dir is not None:
            import cv2

            Path(out_dir).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(
                str(Path(out_dir) / names[i + 1]),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            )
    scene = reconstruct_from_posed_views(
        images, pose_map, cam_rec, names=names,
        max_keypoints=max_keypoints, nms_radius=2,
    )
    return scene, images
