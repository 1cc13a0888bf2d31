"""Tests for the config system, frame IO, CLI plumbing, and SuperPoint arch."""

import json
import os

import numpy as np
import pytest


class TestConfig:
    def test_shell_config_parse(self, tmp_path):
        from pixtrack_tpu.utils.config import ObjectConfig

        sh = tmp_path / "premier_protein.sh"
        sh.write_text(
            "export OBJECT=premier_protein\n"
            "export OBJECT_PATH=/data/objects/premier_protein\n"
            "export OBJ_AABB='[[0.3,0.3,0.3],[0.7,0.7,0.7]]'\n"
            "export UPRIGHT_REF_IMG=mapping/IMG_001.png\n"
            "export OBJ_CENTER='(0.1, 0.2, 0.3)'\n"
            "export OBJECT_ID=2\n"
        )
        cfg = ObjectConfig.from_shell_config(sh)
        assert cfg.name == "premier_protein"
        assert cfg.aabb == [[0.3, 0.3, 0.3], [0.7, 0.7, 0.7]]
        assert cfg.upright_ref_img == "mapping/IMG_001.png"
        assert cfg.object_center == [0.1, 0.2, 0.3]
        assert cfg.object_id == 2

    def test_yaml_roundtrip(self, tmp_path):
        from pixtrack_tpu.utils.config import (
            ObjectConfig,
            RunConfig,
            load_config,
            save_config,
        )

        obj = ObjectConfig(name="demo", aabb=[[0] * 3, [1] * 3])
        run = RunConfig(num_iters=77, reference_scale=0.3)
        save_config(obj, run, tmp_path / "cfg.yaml")
        obj2, run2 = load_config(tmp_path / "cfg.yaml")
        assert obj2.name == "demo"
        assert run2.num_iters == 77
        assert run2.reference_scale == 0.3

    def test_config_builds_components(self):
        from pixtrack_tpu.utils.config import RunConfig

        run = RunConfig(num_iters=10, cold_multiscale=[4, 1])
        tc = run.tracker_config()
        ac = run.align_config()
        ex = run.make_extractor()
        assert ac.num_iters == 10
        assert tc.cold_multiscale == (4, 1)
        assert ex.scales == (1, 4, 16)


class TestFrameIO:
    def test_image_iterators(self, tmp_path, rng):
        import cv2

        for i in range(3):
            img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / f"f{i:03d}.png"), img)
        from pixtrack_tpu.utils.io import ImageIterator, ImagePathIterator

        lazy = list(ImagePathIterator(tmp_path))
        pre = list(ImageIterator(tmp_path, max_frames=2))
        assert len(lazy) == 3 and len(pre) == 2
        assert lazy[0][1].shape == (16, 16, 3)

    def test_parse_frame_range(self):
        from pixtrack_tpu.utils.io import parse_frame_range

        video, r = parse_frame_range("7/:20", 100)
        assert video == "7" and list(r) == list(range(20))
        video, r = parse_frame_range("5:8", 100)
        assert video is None and list(r) == [5, 6, 7]

    def test_ycb_iterator(self, tmp_path, rng):
        """Synthetic YCB-Video layout fixture."""
        import cv2
        from scipy.io import savemat

        folder = tmp_path / "data" / "0007"
        folder.mkdir(parents=True)
        K = np.array([[1066.8, 0, 312.9], [0, 1067.5, 241.3], [0, 0, 1]])
        for i in range(3):
            img = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(folder / f"{i:06d}-color.png"), img)
            if i == 2:
                # last frame: the tracked object is absent -> iterator skips
                pose = np.zeros((3, 4, 1))
                pose[:, :3, 0] = np.eye(3)
                pose[:, 3, 0] = [0, 0, 1.0]
                cls = np.array([[5]])
            else:
                pose = np.zeros((3, 4, 2))
                pose[:, :3, 0] = np.eye(3)
                pose[:, 3, 0] = [0, 0, 1.0]
                pose[:, :3, 1] = np.eye(3)
                pose[:, 3, 1] = [0.1, 0, 0.8]
                cls = np.array([[5], [2]])
            savemat(
                str(folder / f"{i:06d}-meta.mat"),
                {
                    "poses": pose,
                    "cls_indexes": cls,
                    "intrinsic_matrix": K,
                },
            )
        from pixtrack_tpu.utils.io import YCBVideoIterator

        it = YCBVideoIterator(tmp_path, "7", "003_cracker_box")
        assert len(it) == 3  # three on-disk frames...
        frames = list(it)
        assert len(frames) == 2  # ...but the object appears in only two
        path, image, T, cam = frames[0]
        assert image.shape == (480, 640, 3)
        # cracker_box is class 2 -> second pose slot
        np.testing.assert_allclose(np.asarray(T.t), [0.1, 0, 0.8], atol=1e-6)
        assert float(cam.f[0]) == pytest.approx(1066.8)

        # frame selection mirrors the reference's '--query 7/:20' protocol
        sel = YCBVideoIterator(tmp_path, 7, 2, frames=range(1, 2))
        picked = list(sel)
        assert len(picked) == 1
        assert picked[0][0].endswith("000001-color.png")


class TestCLI:
    def test_demo_subcommand(self, tmp_path, capsys):
        from pixtrack_tpu.pipelines.cli import main

        main(["demo", "--frames", "3", "--out_dir", str(tmp_path)])
        out = capsys.readouterr().out
        stats = json.loads(out[out.index("{"):])
        assert stats["n_frames"] == 3
        assert stats["success_10cm10deg"] >= 2 / 3
        assert (tmp_path / "poses.pkl").exists()

    def test_sfm_from_obj_subcommand(self, tmp_path, capsys):
        """The obj_pipeline.sh stage-1 CLI (create_sfm_from_obj role) must
        SAVE the triangulated model to ref_sfm and the renders to the
        mapping dir (regression: it used to drop the SceneModel on the
        floor and crash on the returned tuple)."""
        from pixtrack_tpu.pipelines.assets import layout
        from pixtrack_tpu.pipelines.cli import main
        from pixtrack_tpu.sfm.scene import SceneModel
        from test_mesh_render import make_cube_obj

        obj = make_cube_obj(tmp_path)
        obj_dir = tmp_path / "object"
        main(["sfm-from-obj", "--object_path", str(obj_dir),
              "--obj", str(obj), "--image_size", "128", "--subdiv", "0"])
        assert "mesh SfM: 12 views" in capsys.readouterr().out
        paths = layout(obj_dir)
        scene = SceneModel.load(paths["ref_sfm"])
        assert len(scene.images) == 12
        assert len(scene.points3D) > 30
        assert len(list(paths["mapping"].glob("mesh_*.png"))) == 12

    def test_convert_images_subcommand(self, tmp_path, capsys):
        """convert-images covers the Convert_HEIC_to_PNG notebook role:
        non-HEIC conversion works out of the box; HEIC decode is gated on
        an optional decoder with a clear error."""
        import pytest
        from PIL import Image

        from pixtrack_tpu.pipelines.cli import main
        from pixtrack_tpu.utils.image_convert import (
            _enable_heif_if_possible,
            convert_images,
        )

        src = tmp_path / "src"
        src.mkdir()
        arr = (np.linspace(0, 255, 24 * 32 * 3) % 256).astype(np.uint8)
        Image.fromarray(arr.reshape(24, 32, 3)).save(src / "a.jpg")
        Image.fromarray(arr.reshape(24, 32, 3)).save(src / "b.jpg")
        out = tmp_path / "out"
        main(["convert-images", str(src), str(out)])
        assert "converted 2 images" in capsys.readouterr().out
        png = Image.open(out / "a.png")
        assert png.size == (32, 24)

        # HEIC path: no decoder in this image -> must fail loudly, not skip
        if _enable_heif_if_possible() is None:
            (src / "c.heic").write_bytes(b"\x00\x00\x00\x18ftypheic")
            with pytest.raises(RuntimeError, match="no HEIF decoder"):
                convert_images(src, out, exts=["heic"])

    def test_eval_subcommand(self, tmp_path, capsys):
        import pickle

        from pixtrack_tpu.pipelines.cli import main

        T = np.eye(4)
        poses = {
            "a.png": {"T_refined": T, "gt_pose": T},
            "b.png": {"T_refined": T, "gt_pose": T},
        }
        with open(tmp_path / "poses.pkl", "wb") as f:
            pickle.dump(poses, f)
        main(["eval", "--poses", str(tmp_path / "poses.pkl")])
        out = json.loads(capsys.readouterr().out)
        assert out["mean_t"] == 0.0
        assert out["acc_3cm3deg"] == 1.0


class TestSuperPointArch:
    def test_shapes_and_extraction(self, rng):
        import jax

        from pixtrack_tpu.mapping.superpoint import (
            extract_superpoint,
            init_superpoint,
        )

        model, params = init_superpoint(jax.random.PRNGKey(0), 64, 64)
        img = rng.uniform(size=(64, 64)).astype(np.float32)
        kp, scores, desc = extract_superpoint(
            params, img, max_keypoints=128, threshold=0.0
        )
        assert kp.shape[1] == 2
        assert desc.shape[1] == 256
        norms = np.linalg.norm(desc, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
