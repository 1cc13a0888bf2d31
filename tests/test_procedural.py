"""Procedural mesh/texture generators (mapping/procedural.py) — the scene
family behind the second benchmark world and the descriptor training banks."""

import numpy as np
import pytest

from pixtrack_tpu.geometry import Camera
from pixtrack_tpu.mapping.mesh_render import load_obj, render_mesh
from pixtrack_tpu.mapping.procedural import (
    MESH_MAKERS,
    TEXTURE_STYLES,
    procedural_texture,
    texture_atlas,
)

from synthetic_world import look_at_w2c


class TestTextures:
    def test_all_styles_valid(self):
        for st in TEXTURE_STYLES:
            t = procedural_texture(3, (48, 64), st)
            assert t.shape == (48, 64, 3)
            assert t.dtype == np.float32
            assert t.min() >= 0.0 and t.max() <= 1.0
            assert t.std() > 0.02, f"{st} texture is flat"

    def test_styles_differ_by_seed(self):
        a = procedural_texture(1, (32, 32), "voronoi")
        b = procedural_texture(2, (32, 32), "voronoi")
        assert np.abs(a - b).mean() > 0.05

    def test_atlas_rects_inside_unit_square(self):
        atlas, rects = texture_atlas(7, seed=5, tile=32)
        assert atlas.shape[0] % 32 == 0 and atlas.shape[1] % 32 == 0
        assert len(rects) == 7
        for (u0, v0, u1, v1) in rects:
            assert 0.0 <= u0 < u1 <= 1.0
            assert 0.0 <= v0 < v1 <= 1.0


class TestMeshes:
    @pytest.mark.parametrize("name", sorted(MESH_MAKERS))
    def test_mesh_renders_textured(self, tmp_path, name):
        path = MESH_MAKERS[name](tmp_path, seed=4, size=0.3, tile=32)
        mesh = load_obj(path)
        assert mesh["texture"] is not None
        V = mesh["vertices"]
        assert len(mesh["faces"]) >= 12
        cam = Camera.pinhole(140.0, 140.0, 63.5, 63.5, 128, 128)
        center = V.mean(axis=0)
        radius = np.linalg.norm(V - center, axis=1).max()
        T = look_at_w2c(center + radius * 2.8 * np.array([0.5, 0.5, 0.7]),
                        target=center)
        img, depth = render_mesh(mesh, T, cam, return_depth=True,
                                 background=(0, 0, 0))
        cover = float((np.asarray(depth) > 0).mean())
        assert 0.05 < cover < 0.9, cover
        # textured: the object region is not a flat color
        obj = np.asarray(img)[np.asarray(depth) > 0]
        assert obj.std() > 10.0

    def test_house_is_asymmetric(self, tmp_path):
        """The bench object must have no 180-degree rotational symmetry:
        vertex sets under z-axis flips differ (chimney offset + roof)."""
        from pixtrack_tpu.mapping.procedural import make_house_obj

        mesh = load_obj(make_house_obj(tmp_path, seed=0))
        V = mesh["vertices"] - mesh["vertices"].mean(0)
        Rz = np.diag([-1.0, -1.0, 1.0])
        Vr = V @ Rz.T
        # chamfer distance between V and rotated V stays large
        d = np.linalg.norm(V[:, None] - Vr[None], axis=-1).min(1).mean()
        assert d > 0.01 * np.linalg.norm(V, axis=1).max()
