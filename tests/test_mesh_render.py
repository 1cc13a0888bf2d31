"""Tests for the mesh renderer + obj pipeline (PyTorch3D-role replacement)."""

import numpy as np
import pytest

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.mapping.mesh_render import (
    create_scene_from_mesh,
    icosphere_directions,
    load_obj,
    look_at_rig_for_mesh,
    render_mesh,
)


def make_cube_obj(tmp_path, size=0.2):
    """A textured cube OBJ + MTL + checkerboard texture."""
    import cv2
    import scipy.ndimage as ndi

    # aperiodic texture ATLAS: smoothed random colors, one distinct 64x64
    # tile per cube face (a single shared texture makes opposite faces
    # identical — SfM then locks onto 180-degree-apart false matches that
    # are internally consistent; a checkerboard is ambiguous the same way)
    rng = np.random.default_rng(3)
    tex = rng.uniform(0, 255, (128, 192, 3))
    tex = ndi.gaussian_filter(tex, (2, 2, 0))
    tex = ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "tex.png"), tex)
    (tmp_path / "cube.mtl").write_text(
        "newmtl m\nmap_Kd tex.png\n"
    )
    s = size
    verts = [
        (-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s),
        (-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s),
    ]
    faces = [  # quads (v indices, 1-based)
        (1, 2, 3, 4), (5, 8, 7, 6), (1, 5, 6, 2),
        (2, 6, 7, 3), (3, 7, 8, 4), (5, 1, 4, 8),
    ]
    # atlas tiles: 3 cols x 2 rows; face k -> tile (k % 3, k // 3)
    uvs = []
    for k in range(6):
        cx0, cy0 = (k % 3) / 3.0, (k // 3) / 2.0
        cx1, cy1 = cx0 + 1 / 3.0, cy0 + 0.5
        uvs += [(cx0, cy0), (cx1, cy0), (cx1, cy1), (cx0, cy1)]
    lines = ["mtllib cube.mtl", "usemtl m"]
    for v in verts:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    for u in uvs:
        lines.append(f"vt {u[0]} {u[1]}")
    for fk, f in enumerate(faces):
        lines.append(
            "f " + " ".join(f"{vi}/{4*fk+k+1}" for k, vi in enumerate(f))
        )
    p = tmp_path / "cube.obj"
    p.write_text("\n".join(lines) + "\n")
    return p


class TestMeshRender:
    def test_load_obj(self, tmp_path):
        p = make_cube_obj(tmp_path)
        mesh = load_obj(p)
        assert mesh["vertices"].shape == (8, 3)
        assert len(mesh["faces"]) == 12  # 6 quads fan-triangulated
        assert mesh["texture"] is not None

    def test_icosphere_rig(self):
        dirs = icosphere_directions(1)
        assert len(dirs) >= 12
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-9)
        verts = np.random.default_rng(0).normal(size=(10, 3)) * 0.1
        poses = look_at_rig_for_mesh(verts)
        # every camera sees the centroid in front of it
        centroid = verts.mean(axis=0)
        import jax.numpy as jnp

        for T in poses[:5]:
            pc = np.asarray(T.transform(jnp.asarray(centroid[None], jnp.float32)))
            assert pc[0, 2] > 0

    def test_render_cube(self, tmp_path):
        p = make_cube_obj(tmp_path)
        mesh = load_obj(p)
        cam = Camera.pinhole(200.0, 200.0, 63.5, 63.5, 128, 128)
        T = look_at_rig_for_mesh(mesh["vertices"])[0]
        img = render_mesh(mesh, T, cam, background=(1, 1, 1))
        assert img.shape == (128, 128, 3)
        # object covers the center; background at corners
        assert img[64, 64].sum() < 3 * 250  # not background
        assert img[2, 2].sum() > 3 * 250    # background
        # the checkerboard texture shows variation on the object
        center_patch = img[44:84, 44:84].astype(float)
        assert center_patch.std() > 10

    def test_create_scene_from_mesh(self, tmp_path):
        p = make_cube_obj(tmp_path)
        scene, images = create_scene_from_mesh(
            p, image_size=160, focal=260.0, subdiv=0, max_keypoints=512
        )
        assert len(scene.images) >= 12
        assert len(scene.point_ids) > 10, f"{len(scene.point_ids)} points"
        # triangulated points should lie near the cube surface (|max coord| ~ s)
        m = np.abs(scene.xyz).max(axis=1)
        assert abs(np.median(m) - 0.2) < 0.03, f"median {np.median(m)}"
        assert np.median(np.abs(m - 0.2)) < 0.06, f"spread {np.median(np.abs(m-0.2))}"
