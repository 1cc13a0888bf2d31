"""Tests for the native C++ COLMAP parser (build + parity + speed)."""

import time

import numpy as np
import pytest

from pixtrack_tpu.native import (
    ensure_built,
    fast_read_images_bin,
    fast_read_points3D_bin,
    native_available,
)
from pixtrack_tpu.sfm import colmap_io

from test_sfm import make_synthetic_model


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("model")
    cams, imgs, pts = make_synthetic_model(rng, n_images=20, n_points=500)
    colmap_io.write_model(cams, imgs, pts, d, ".bin")
    return d, imgs, pts


class TestNative:
    def test_builds(self):
        assert ensure_built(), "g++ build of libcolmap_fast.so failed"

    def test_points_parity(self, model_dir):
        d, imgs, pts = model_dir
        if not native_available():
            pytest.skip("native lib unavailable")
        native = fast_read_points3D_bin(d / "points3D.bin")
        python = colmap_io.read_points3D_bin(d / "points3D.bin")
        assert set(native) == set(python)
        for pid in python:
            np.testing.assert_allclose(native[pid].xyz, python[pid].xyz)
            np.testing.assert_array_equal(
                native[pid].image_ids, python[pid].image_ids
            )
            np.testing.assert_array_equal(
                native[pid].point2D_idxs, python[pid].point2D_idxs
            )
            assert native[pid].error == pytest.approx(python[pid].error)

    def test_images_parity(self, model_dir):
        d, imgs, pts = model_dir
        if not native_available():
            pytest.skip("native lib unavailable")
        native = fast_read_images_bin(d / "images.bin")
        python = colmap_io.read_images_bin(d / "images.bin")
        assert set(native) == set(python)
        for iid in python:
            assert native[iid].name == python[iid].name
            np.testing.assert_allclose(native[iid].qvec, python[iid].qvec)
            np.testing.assert_allclose(native[iid].xys, python[iid].xys)
            np.testing.assert_array_equal(
                native[iid].point3D_ids, python[iid].point3D_ids
            )

    def test_read_model_uses_native(self, model_dir):
        d, imgs, pts = model_dir
        cams, images, points = colmap_io.read_model(d)
        assert len(images) == len(imgs)
        assert len(points) == len(pts)

    def test_speed_on_larger_model(self, tmp_path):
        if not native_available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(1)
        cams, imgs, pts = make_synthetic_model(rng, n_images=60, n_points=5000)
        colmap_io.write_model(cams, imgs, pts, tmp_path, ".bin")
        t0 = time.perf_counter()
        colmap_io.read_points3D_bin(tmp_path / "points3D.bin")
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        fast_read_points3D_bin(tmp_path / "points3D.bin")
        t_c = time.perf_counter() - t0
        # native should never be slower; typically it is several times faster
        assert t_c < t_py * 1.5, f"native {t_c:.4f}s vs python {t_py:.4f}s"
