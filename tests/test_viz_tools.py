"""Folder-level viz tools: merge, blend, axes-from-pkl, video, multi-object."""

import os
import pickle

import cv2
import numpy as np
import pytest

from pixtrack_tpu.viz.tools import (
    add_pose_axes_to_folder,
    blend_render_and_query_folders,
    make_video_from_folder,
    merge_image_folders,
    render_overlays_multi,
)


@pytest.fixture()
def folders(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for i in range(3):
        ia = np.zeros((32, 32, 3), np.uint8); ia[8:16, 8:16] = (200, 0, 0)
        ib = np.zeros((32, 32, 3), np.uint8); ib[12:20, 12:20] = (0, 200, 0)
        cv2.imwrite(str(a / f"f_{i:03d}.png"), ia[..., ::-1])
        cv2.imwrite(str(b / f"f_{i:03d}.png"), ib[..., ::-1])
    return str(a), str(b), tmp_path


def test_merge_max(folders):
    a, b, tmp = folders
    out = merge_image_folders([a, b], str(tmp / "m"), mode="max")
    assert len(out) == 3
    img = cv2.imread(out[0])[..., ::-1]
    assert img[10, 10, 0] > 150 and img[14, 14, 1] > 150  # both patches kept


def test_blend_folders(folders):
    a, b, tmp = folders
    out = blend_render_and_query_folders(a, b, str(tmp / "bl"), alpha=0.5)
    img = cv2.imread(out[0])[..., ::-1]
    # render patch blended at 50% where render nonzero; query-only elsewhere
    assert 80 < img[10, 10, 0] < 130
    assert img[18, 18, 1] > 150


def test_axes_and_video_and_multi(folders, tmp_path):
    a, b, tmp = folders
    # synthetic poses.pkl matching the tracker output contract
    rec = {
        "T_refined": np.eye(4, dtype=np.float32),
        "camera": {
            "size": np.array([32.0, 32.0]), "f": np.array([40.0, 40.0]),
            "c": np.array([15.5, 15.5]), "k": np.array([0.0]),
        },
    }
    rec["T_refined"][2, 3] = 2.0  # object in front of the camera
    poses = {f"f_{i:03d}.png": dict(rec) for i in range(3)}
    pkl = tmp_path / "poses.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(poses, f)

    out = add_pose_axes_to_folder(str(pkl), a, str(tmp / "ax"), length=0.3)
    assert len(out) == 3
    img = cv2.imread(out[0])
    assert img is not None and (img.sum(axis=-1) > 0).sum() > 10

    make_video_from_folder(a, str(tmp_path / "out.mp4"), fps=5)
    assert os.path.getsize(tmp_path / "out.mp4") > 0

    def render_fn(rec):
        img = np.zeros((32, 32, 3), np.uint8)
        img[4:10, 4:10] = (0, 0, 220)
        return img

    outs = render_overlays_multi(
        [str(pkl), str(pkl)], [render_fn, render_fn], a, str(tmp / "mo")
    )
    assert len(outs) == 3
    img = cv2.imread(outs[0])[..., ::-1]
    assert img[6, 6, 2] > 100
