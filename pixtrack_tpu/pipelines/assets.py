"""Asset-creation pipeline orchestration.

The reference drives this through four shell stages (images_pipeline.sh:1-4):
  1. run_reconstruction.py  (SfM + featuremetric refinement)
  2. train_ingp_nerf.sh     (colmap2ingp + instant-ngp training)
  3. create_nerf_dataset_and_sfm.py (NeRF re-renders + triangulation)
  4. augment_sfm.py         (rotation augmentation)
Here each stage is a function over the same artifact layout
(<object_path>/pixtrack/..., SURVEY.md §2.4), composed by the CLI.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.mapping.augment import augment_scene
from pixtrack_tpu.mapping.detector import detect_and_describe
from pixtrack_tpu.mapping.matcher import (
    epipolar_filter,
    exhaustive_pairs,
    match_descriptors,
)
from pixtrack_tpu.mapping.nerf_dataset import (
    compute_nerf_transform,
    estimate_aabb_from_scene,
    write_transforms_json,
)
from pixtrack_tpu.mapping.triangulate import triangulate_scene
from pixtrack_tpu.sfm import colmap_io, feature_store
from pixtrack_tpu.sfm.database import create_db_from_scene
from pixtrack_tpu.sfm.scene import SceneModel


def layout(object_path) -> Dict[str, Path]:
    """The reference artifact layout under <object_path>/pixtrack."""
    root = Path(object_path) / "pixtrack"
    return {
        "root": root,
        "mapping": root / "pixsfm" / "dataset" / "mapping",
        "transforms": root / "pixsfm" / "dataset" / "transforms.json",
        "nerf2sfm": root / "pixsfm" / "dataset" / "nerf2sfm.pkl",
        "ref_sfm": root / "pixsfm" / "outputs" / "ref",
        "snapshot": root / "instant-ngp" / "snapshots" / "weights.msgpack",
        "nerf_sfm_dir": root / "nerf_sfm",
        "nerf_sfm_mapping": root / "nerf_sfm" / "mapping",
        "nerf_sfm": root / "nerf_sfm" / "ref",
        "features": root / "nerf_sfm" / "features.h5",
        "matches": root / "nerf_sfm" / "matches.h5",
        "aug_sfm": root / "aug_nerf_sfm" / "aug_sfm",
        "aug_db": root / "aug_nerf_sfm" / "aug_sfm" / "database.db",
    }


def detect_match_views(
    images: Dict[int, np.ndarray],
    poses: Dict[int, Pose],
    camera: Camera,
    max_keypoints: int = 1024,
    nms_radius: int = 2,
    features_h5: Optional[Path] = None,
    matches_h5: Optional[Path] = None,
    names: Optional[Dict[int, str]] = None,
):
    """Detect + describe + exhaustively match a set of posed views; returns
    (keypoints, matches) dicts (corner-convention keypoints)."""
    kps, descs = {}, {}
    for iid, img in images.items():
        kp, sc, d = detect_and_describe(
            img, max_keypoints=max_keypoints, nms_radius=nms_radius
        )
        kps[iid] = kp + 0.5
        descs[iid] = d
        if features_h5 is not None and names:
            feature_store.write_features(
                features_h5, names[iid], kps[iid], d, sc,
                image_size=(img.shape[1], img.shape[0]),
            )
    K = np.asarray(camera.K(), np.float64)
    matches = {}
    for (a, b) in exhaustive_pairs(sorted(images.keys())):
        m0, s0 = match_descriptors(descs[a], descs[b])
        Tab = poses[b] @ poses[a].inv()
        m0 = epipolar_filter(
            kps[a] - 0.5, kps[b] - 0.5, m0, K, K,
            np.asarray(Tab.R, np.float64), np.asarray(Tab.t, np.float64),
        )
        matches[(a, b)] = m0
        if matches_h5 is not None and names:
            feature_store.write_matches(matches_h5, names[a], names[b], m0, s0)
    return kps, matches


def reconstruct_from_posed_views(
    images: Dict[int, np.ndarray],
    poses: Dict[int, Pose],
    camera_rec: colmap_io.CameraRecord,
    names: Optional[Dict[int, str]] = None,
    out_dir: Optional[Path] = None,
    **detect_kw,
) -> SceneModel:
    """Triangulation-based reconstruction against known poses (the pipeline's
    post-first-stage mode: NeRF re-renders and mesh renders always have
    poses; reference create_nerf_dataset_and_sfm.py:80-106)."""
    camera = Camera.from_colmap(
        camera_rec.model, camera_rec.params, camera_rec.width, camera_rec.height
    )
    names = names or {iid: f"view_{iid:04d}.png" for iid in images}
    kps, matches = detect_match_views(
        images, poses, camera, names=names, **detect_kw
    )
    image_meta = {}
    for iid, T in poses.items():
        q, t = T.to_quat_t()
        image_meta[iid] = {
            "name": names[iid],
            "qvec": np.asarray(q),
            "tvec": np.asarray(t),
            "camera_id": camera_rec.camera_id,
        }
    scene = triangulate_scene(
        image_meta, kps, matches, {camera_rec.camera_id: camera_rec}
    )
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        scene.save(out_dir)
    return scene


def build_nerf_assets(scene: SceneModel, object_path, aabb_scale: int = 4):
    """Stage 2 prep: compute the NeRF transform, write transforms.json +
    nerf2sfm.pkl, estimate the grid-space AABB."""
    paths = layout(object_path)
    tf = compute_nerf_transform(scene)
    paths["transforms"].parent.mkdir(parents=True, exist_ok=True)
    write_transforms_json(scene, tf, paths["transforms"], aabb_scale=aabb_scale)
    tf.save(paths["nerf2sfm"])
    aabb = estimate_aabb_from_scene(scene, tf)
    return tf, aabb


def train_nerf_asset(object_path, n_steps: int = 10000, downscale: int = 1,
                     batch_rays: int = 1 << 14, save_every: int = 0,
                     resume: bool = False, verbose: bool = False,
                     devices: int = 0, tp: int = 1,
                     n_coarse: int = 64, n_fine: int = 32):
    """Stage 2: train the hash-grid NeRF on transforms.json and snapshot it
    (train_ingp_nerf.sh role).

    ``save_every`` > 0 checkpoints the snapshot every that many steps (the
    run survives crashes/preemption — remote-TPU trainings are long);
    ``resume`` warm-starts from an existing snapshot and trains the full
    ``n_steps`` on top of it.

    ``devices`` > 1 runs the SAME production loop over a (dp, tp) device
    mesh: rays shard over dp=devices/tp, each hash-table level over tp
    (parallel/mesh.py; no reference counterpart — the reference is
    single-GPU, SURVEY.md §5.8). devices=0 means single default device."""
    from pixtrack_tpu.nerf.dataset import NerfDataset
    from pixtrack_tpu.nerf.snapshot import load_snapshot, save_snapshot
    from pixtrack_tpu.nerf.train import TrainConfig, train

    mesh = None
    if devices and devices > 1:
        from pixtrack_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices, tp=tp)

    paths = layout(object_path)
    if not paths["transforms"].exists():
        # colmap2ingp role: the reference's train_ingp_nerf.sh:1 converts the
        # SfM model to transforms.json + nerf2sfm.pkl before training; do the
        # same when the conversion hasn't been run separately
        build_nerf_assets(SceneModel.load(paths["ref_sfm"]), object_path)
    ds = NerfDataset.from_transforms(paths["transforms"], downscale=downscale)
    scene = SceneModel.load(paths["ref_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = estimate_aabb_from_scene(scene, tf)
    if resume and paths["snapshot"].exists():
        field, params, _ = load_snapshot(paths["snapshot"])
    else:
        import jax

        from pixtrack_tpu.nerf.field import init_field

        field, params = init_field(jax.random.PRNGKey(1))
    paths["snapshot"].parent.mkdir(parents=True, exist_ok=True)

    # the callback fires on log_every boundaries, so a save_every below it
    # would otherwise never checkpoint
    log_every = min(500, save_every) if save_every else 500

    def checkpoint(done, loss, p):
        if verbose:
            print(f"  nerf train step {done}: loss {loss:.5f}", flush=True)
        if save_every and done % save_every < log_every:
            save_snapshot(paths["snapshot"], field, p,
                          extra={"aabb": aabb, "steps_done": done})
    field, params, info = train(
        ds, aabb=aabb, field=field, params=params,
        cfg=TrainConfig(n_steps=n_steps, batch_rays=batch_rays,
                        n_coarse=n_coarse, n_fine=n_fine,
                        log_every=log_every),
        callback=checkpoint if (save_every or verbose) else None,
        mesh=mesh,
    )
    save_snapshot(paths["snapshot"], field, params, extra={"aabb": aabb})
    return field, params, info


def create_nerf_sfm(object_path, spp: int = 2, max_keypoints: int = 1024):
    """Stage 3: re-render every training view from the trained NeRF, detect/
    match on the renders, triangulate against the reference poses
    (create_nerf_dataset_and_sfm.py role)."""
    import cv2

    from pixtrack_tpu.nerf.testbed import initialize_testbed
    from pixtrack_tpu.tracking.render_bridge import render_nerf_view

    paths = layout(object_path)
    scene = SceneModel.load(paths["ref_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = estimate_aabb_from_scene(scene, tf)
    testbed = initialize_testbed(paths["snapshot"], aabb=aabb)
    paths["nerf_sfm_mapping"].mkdir(parents=True, exist_ok=True)

    images, poses, names = {}, {}, {}
    cam_id = next(iter(scene.cameras))
    camera = scene.camera(cam_id)
    for iid in scene.image_ids:
        iid = int(iid)
        T = scene.pose_w2c(iid)
        img = render_nerf_view(testbed, tf, T, camera, spp=spp)
        name = scene.images[iid].name
        cv2.imwrite(
            str(paths["nerf_sfm_mapping"] / name),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        )
        images[iid] = img
        poses[iid] = T
        names[iid] = name
    cam_rec = scene.cameras[cam_id]
    nerf_scene = reconstruct_from_posed_views(
        images, poses, cam_rec, names=names, out_dir=paths["nerf_sfm"],
        max_keypoints=max_keypoints,
        features_h5=paths["features"], matches_h5=paths["matches"],
    )
    return nerf_scene


def augment_assets(object_path, angles=tuple(range(30, 360, 30))):
    """Stage 4: rotation augmentation -> aug_sfm + database.db + covis.pkl
    (augment_sfm.py role)."""
    paths = layout(object_path)
    src = paths["nerf_sfm"] if paths["nerf_sfm"].exists() else paths["ref_sfm"]
    scene = SceneModel.load(src)
    aug = augment_scene(scene, angles=angles)
    paths["aug_sfm"].mkdir(parents=True, exist_ok=True)
    aug.save(paths["aug_sfm"])
    create_db_from_scene(aug, paths["aug_db"]).close()
    aug.save_covisibility(paths["aug_sfm"] / "covis.pkl")
    # query-list stub for reference-layout parity (augment_sfm.py:87-88)
    (paths["aug_sfm"].parent / "query_with_intrinsics.txt").touch()
    return aug
