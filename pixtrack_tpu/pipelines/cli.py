"""pixtrack-tpu CLI: one entry point for the full pipeline.

Subcommands replace the reference's shell-script zoo (images_pipeline.sh,
obj_pipeline.sh, train_ingp_nerf.sh, run_inference.sh, run_ycb_inference.sh
+ per-script argparse CLIs):

  reconstruct    — unposed incremental SfM from raw images
  sfm-from-obj   — textured mesh -> posed renders -> SfM (obj pipeline)
  extract-frames — video -> frame folder
  train-nerf     — train the hash-grid NeRF on transforms.json
  nerf-sfm       — re-render training views from the NeRF + re-triangulate
  augment        — rotation-augment the SfM model (aug_sfm + db + covis)
  bundle-adjust  — refine an SfM model (joint BA)
  track          — run the flagship tracker on a query folder
  track-ycb      — YCB-Video evaluation run
  visualize      — render pose overlays from poses.pkl
  eval           — trajectory metrics from poses.pkl (+ optional GT)
  demo           — synthetic end-to-end smoke run (no external data needed)
  bench          — run the repo benchmark
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _cmd_train_nerf(args):
    from pixtrack_tpu.pipelines.assets import train_nerf_asset

    field, params, info = train_nerf_asset(
        args.object_path, n_steps=args.n_steps, downscale=args.downscale,
        batch_rays=args.batch_rays,
        n_coarse=args.n_coarse, n_fine=args.n_fine,
        save_every=args.save_every, resume=args.resume, verbose=True,
        devices=args.devices, tp=args.tp,
    )
    print(json.dumps({"seconds": info["seconds"], "history": info["history"]}))


def _cmd_nerf_sfm(args):
    from pixtrack_tpu.pipelines.assets import create_nerf_sfm

    scene = create_nerf_sfm(args.object_path, spp=args.spp)
    print(scene)


def _cmd_augment(args):
    from pixtrack_tpu.pipelines.assets import augment_assets

    aug = augment_assets(args.object_path)
    print(aug)


def _cmd_track(args):
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.nerf_dataset import estimate_aabb_from_scene
    from pixtrack_tpu.nerf.testbed import initialize_testbed
    from pixtrack_tpu.pipelines.assets import layout
    from pixtrack_tpu.sfm.scene import SceneModel
    from pixtrack_tpu.tracking import PixTrackTracker
    from pixtrack_tpu.utils.config import ObjectConfig, RunConfig, load_config
    from pixtrack_tpu.utils.io import ImageIterator

    if args.config:
        obj_cfg, run_cfg = load_config(args.config)
    else:
        obj_cfg, run_cfg = ObjectConfig(), RunConfig()
    if args.object_path:
        obj_cfg.object_path = args.object_path

    paths = layout(obj_cfg.object_path)
    scene = SceneModel.load(paths["aug_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = obj_cfg.aabb or estimate_aabb_from_scene(scene, tf)
    # tighten=True: one-time occupied-bounds sweep so every per-frame
    # reference render concentrates its sample budget on the object
    testbed = initialize_testbed(paths["snapshot"], aabb=aabb, tighten=True)

    tracker = PixTrackTracker(
        scene,
        run_cfg.make_extractor(),
        testbed,
        tf,
        run_cfg.tracker_config(obj_cfg),
        align_cfg=run_cfg.align_config(),
        eval_path=args.out_dir,
    )
    frames = ImageIterator(args.query, max_frames=args.frames)
    tracker.run(frames, max_frames=args.frames)
    tracker.save_poses()
    print(json.dumps(tracker.stats))


def _cmd_track_batch(args):
    """Track several videos at once, sharded over the device mesh (dp axis).

    Each timestep refines every video's current frame in ONE sharded device
    program (parallel/video.py); per-video pose chains stay independent.
    Cold start is the upright reference pose per video (r9 relocalization
    semantics) — queries should begin near the mapped object like the
    reference's own protocol."""
    import pickle

    from pixtrack_tpu.geometry import Pose
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.nerf_dataset import estimate_aabb_from_scene
    from pixtrack_tpu.nerf.testbed import initialize_testbed
    from pixtrack_tpu.parallel.mesh import make_mesh
    from pixtrack_tpu.parallel.video import (
        make_production_video_tracker,
        track_video_batch,
    )
    from pixtrack_tpu.pipelines.assets import layout
    from pixtrack_tpu.sfm.scene import SceneModel
    from pixtrack_tpu.tracking.refiner import infer_camera_from_image
    from pixtrack_tpu.utils.config import ObjectConfig, RunConfig, load_config
    from pixtrack_tpu.utils.io import ImageIterator

    if args.config:
        obj_cfg, run_cfg = load_config(args.config)
    else:
        obj_cfg, run_cfg = ObjectConfig(), RunConfig()
    if args.object_path:
        obj_cfg.object_path = args.object_path

    paths = layout(obj_cfg.object_path)
    scene = SceneModel.load(paths["aug_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = obj_cfg.aabb or estimate_aabb_from_scene(scene, tf)
    testbed = initialize_testbed(paths["snapshot"], aabb=aabb)

    videos = [list(ImageIterator(q, max_frames=args.frames))
              for q in args.query]
    assert videos and all(videos), "every --query dir needs frames"
    camera = infer_camera_from_image(videos[0][0][1])

    mesh = make_mesh(args.devices if args.devices > 1 else None, tp=1)
    run = make_production_video_tracker(
        mesh, testbed, tf, run_cfg.make_extractor(), scene, camera,
        reference_scale=run_cfg.reference_scale,
        align_cfg=run_cfg.align_config(),
    )

    # lockstep batch: pad shorter videos by repeating their last frame
    T_len = max(len(v) for v in videos)
    batch = np.stack([
        np.stack([np.asarray(v[min(k, len(v) - 1)][1], np.float32) / 255.0
                  for k in range(T_len)])
        for v in videos
    ])
    ref_name = obj_cfg.upright_ref_img or scene.names[0]
    T0 = scene.pose_w2c(scene.name2id[ref_name])
    B = len(videos)
    R0 = np.tile(np.asarray(T0.R, np.float32), (B, 1, 1))
    t0 = np.tile(np.asarray(T0.t, np.float32), (B, 1))

    out = track_video_batch(run, R0, t0, batch)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for b, (qdir, vid) in enumerate(zip(args.query, videos)):
        poses = {}
        for k, (name, _) in enumerate(vid):
            T = Pose.from_Rt(out["R"][k, b], out["t"][k, b])
            poses[str(name).split("/")[-1]] = {
                "success": bool(np.isfinite(out["cost"][k, b])),
                "T_refined": np.asarray(T.to_4x4()),
                "cost": float(out["cost"][k, b]),
                "query_path": str(name),
            }
        with open(out_dir / f"poses_{b:02d}.pkl", "wb") as f:
            pickle.dump(poses, f)
    print(json.dumps({
        "n_videos": B,
        "n_frames": int(T_len),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "mean_cost_final": float(np.mean(out["cost"][-1])),
    }))


def _cmd_track_ycb(args):
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.nerf_dataset import estimate_aabb_from_scene
    from pixtrack_tpu.nerf.testbed import initialize_testbed
    from pixtrack_tpu.pipelines.assets import layout
    from pixtrack_tpu.sfm.scene import SceneModel
    from pixtrack_tpu.tracking.tracker_ycb import YCBTracker, ycb_tracker_config
    from pixtrack_tpu.utils.config import RunConfig
    from pixtrack_tpu.utils.io import YCBVideoIterator, parse_frame_range

    paths = layout(args.object_path)
    scene = SceneModel.load(paths["aug_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = estimate_aabb_from_scene(scene, tf)
    testbed = initialize_testbed(paths["snapshot"], aabb=aabb, tighten=True)
    run_cfg = RunConfig()
    video, frame_range = parse_frame_range(args.query, 10000)
    it = YCBVideoIterator(args.ycb_root, video, args.object_name, frame_range)
    tracker = YCBTracker(
        scene, run_cfg.make_extractor(), testbed, tf,
        ycb_tracker_config(), align_cfg=run_cfg.align_config(),
        eval_path=args.out_dir,
    )
    tracker.run(it)
    tracker.save_poses()
    print(json.dumps(tracker.summary()))


def _cmd_visualize(args):
    from pixtrack_tpu.geometry.nerf_transform import NerfTransform
    from pixtrack_tpu.mapping.nerf_dataset import estimate_aabb_from_scene
    from pixtrack_tpu.nerf.testbed import initialize_testbed
    from pixtrack_tpu.pipelines.assets import layout
    from pixtrack_tpu.sfm.scene import SceneModel
    from pixtrack_tpu.viz.overlay import render_pose_overlays, write_video

    paths = layout(args.object_path)
    scene = SceneModel.load(paths["aug_sfm"])
    tf = NerfTransform.load(paths["nerf2sfm"])
    aabb = estimate_aabb_from_scene(scene, tf)
    testbed = initialize_testbed(paths["snapshot"], aabb=aabb)
    written = render_pose_overlays(
        args.poses, scene, testbed, tf, args.out_dir,
        object_center=np.asarray(scene.xyz).mean(axis=0),
    )
    if args.video:
        write_video(written, Path(args.out_dir) / "overlay.mp4", fps=30)
    print(f"wrote {len(written)} overlays to {args.out_dir}")


def _cmd_eval(args):
    import pickle

    from pixtrack_tpu.eval.metrics import evaluate_trajectory

    with open(args.poses, "rb") as f:
        poses = pickle.load(f)
    est, gt = [], []
    for rec in poses.values():
        if "gt_pose" not in rec:
            continue
        est.append((rec["T_refined"][:3, :3], rec["T_refined"][:3, 3]))
        gt.append((rec["gt_pose"][:3, :3], rec["gt_pose"][:3, 3]))
    if not est:
        print(json.dumps({"error": "poses.pkl has no gt_pose entries"}))
        return
    out = evaluate_trajectory(est, gt)
    print(json.dumps(out, indent=2))


def _cmd_demo(args):
    """Synthetic end-to-end smoke run: world -> track -> eval -> overlays."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))
    import jax.numpy as jnp

    from synthetic_world import build_world

    from pixtrack_tpu.align.lm import AlignConfig
    from pixtrack_tpu.eval.metrics import evaluate_trajectory
    from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
    from pixtrack_tpu.geometry import Pose
    from pixtrack_tpu.tracking import PixTrackTracker, TrackerConfig

    scene, testbed, nerf2sfm, camera, gt, frames = build_world(
        res=128, n_frames=args.frames or 6
    )
    tracker = PixTrackTracker(
        scene, FeatureExtractor(HandcraftedExtractor(), resize=None),
        testbed, nerf2sfm,
        TrackerConfig(reference_scale=1.0, cold_multiscale=(1,),
                      covis_threshold=10, cost_threshold_min=0.05,
                      refine_rounds=2),
        align_cfg=AlignConfig(num_iters=60, robust_c=1.0),
        eval_path=args.out_dir,
    )
    tracker.camera = camera
    tracker.run(frames)
    if args.out_dir:
        tracker.save_poses()
    est, gtl = [], []
    for i, (name, _) in enumerate(frames):
        T = np.asarray(tracker.pose_history[name]["T_refined"])
        est.append((T[:3, :3], T[:3, 3]))
        gtl.append((np.asarray(gt[i].R), np.asarray(gt[i].t)))
    print(json.dumps(evaluate_trajectory(est, gtl), indent=2))


def _cmd_bench(args):
    import runpy

    runpy.run_path(str(Path(__file__).resolve().parents[2] / "bench.py"),
                   run_name="__main__")


def _cmd_reconstruct(args):
    """Unposed SfM from raw images (the run_reconstruction.py role:
    reference scripts/run_reconstruction.py:39-61)."""
    import shutil

    import numpy as np

    from pixtrack_tpu.mapping.incremental import incremental_sfm
    from pixtrack_tpu.pipelines.assets import layout
    from pixtrack_tpu.sfm import colmap_io
    from pixtrack_tpu.tracking.refiner import infer_camera_from_image
    from pixtrack_tpu.utils.io import _list_images, _read_rgb

    paths = layout(args.object_path)
    mapping = paths["mapping"]
    mapping.mkdir(parents=True, exist_ok=True)
    if args.images and str(args.images) != str(mapping):
        for p in _list_images(args.images):
            shutil.copy(p, mapping)
    files = _list_images(mapping)
    images = {i + 1: _read_rgb(f) for i, f in enumerate(files)}
    names = {i + 1: Path(f).name for i, f in enumerate(files)}
    h, w = next(iter(images.values())).shape[:2]
    cam = infer_camera_from_image((h, w))
    cam_rec = colmap_io.CameraRecord(
        1, "SIMPLE_RADIAL", w, h,
        np.array([float(cam.f[0]), w / 2.0, h / 2.0, 0.0]),
    )
    # learned detector/descriptor (the SuperPoint-weights role).
    # `auto` keeps the classical Harris+patch stack: the shipped InfoNCE
    # dense descriptor (`--detector dense`) WINS raw matching on the
    # held-out mesh gate (2x recall at +12pt precision,
    # assets/dense_descriptor_eval.json) and lands inside the arc-rig
    # rotation gate (0.879 deg vs gate 0.92), but its denser high-recall
    # track graph measurably regresses camera CENTERS on that rig (0.459
    # vs 0.065 median center frac) — the classical stack stays default
    # until the learned one wins end-to-end, not just at matching.
    detector = None
    match_kw = dict(min_score=0.5, ratio=0.98)
    if args.detector == "dense":
        from pixtrack_tpu.mapping import default_descriptor

        detector = default_descriptor()
        if detector is None:
            raise SystemExit(
                "no dense-descriptor checkpoint (assets/dense_descriptor"
                ".npz or PIXTRACK_DENSE_DESCRIPTOR_WEIGHTS); train one "
                "with scripts_dev/train_dense_descriptor.py or use "
                "--detector harris"
            )
        match_kw = dict(detector.match_kw)
    elif args.detector != "harris":
        from pixtrack_tpu.mapping import default_detector

        detector = default_detector()
        if detector is None and args.detector == "superpoint":
            raise SystemExit(
                "no SuperPoint checkpoint (assets/superpoint.npz or "
                "PIXTRACK_SUPERPOINT_WEIGHTS); train one with "
                "scripts_dev/train_superpoint_run.py or use "
                "--detector harris"
            )
    # featuremetric KA on by default: the reference pipeline always runs
    # PixSfM's keypoint adjustment (run_reconstruction.py:52-61)
    matcher = None
    if args.matcher != "nn":
        from pixtrack_tpu.mapping import default_matcher

        matcher = default_matcher()
        if matcher is None and args.matcher == "learned":
            raise SystemExit(
                "no attention-matcher checkpoint (assets/matcher.npz or "
                "PIXTRACK_MATCHER_WEIGHTS); train one with "
                "mapping/train_matcher.py or use --matcher nn"
            )
        # the learned matcher is bound to the descriptor space it was
        # trained on; a detector with a different descriptor dim can't
        # feed it (e.g. SuperPoint 256-d vs Harris-patch 845-d)
        det_dim = getattr(detector, "desc_dim", 845)
        if matcher is not None and getattr(matcher, "desc_dim", det_dim) != det_dim:
            if args.matcher == "learned":
                raise SystemExit(
                    f"attention matcher was trained on "
                    f"{matcher.desc_dim}-d descriptors but the selected "
                    f"detector produces {det_dim}-d; retrain or change "
                    f"--detector"
                )
            matcher = None
    # the accuracy-gate-proven mapper configuration (tests/
    # test_incremental_sfm): relaxed score/ratio + NMS scaled to image
    # size. The old CLI defaults (matcher min_score 0.6/ratio 0.95,
    # nms_radius 4 at any size) starved matches on small captures — the
    # fast e2e smoke measured 6/10 registered / 18 points at 160 px where
    # this config reconstructs the full ring.
    nms = 1 if max(h, w) <= 320 else (2 if max(h, w) <= 768 else 4)
    scene = incremental_sfm(
        images, cam_rec, names=names,
        verbose=args.verbose,
        max_keypoints=args.max_keypoints,
        nms_radius=nms,
        match_kw=match_kw,
        featuremetric_ka=not args.no_featuremetric,
        # final featuremetric BA polish (pixsfm BA role); rounds=2 is the
        # measured optimum on the arc rig (0.915 -> 0.837 deg)
        featuremetric_ba_rounds=0 if args.no_featuremetric else 2,
        matcher=matcher, detector=detector,
    )
    paths["ref_sfm"].mkdir(parents=True, exist_ok=True)
    scene.save(paths["ref_sfm"])
    print(f"reconstructed {len(scene.images)}/{len(images)} images, "
          f"{len(scene.points3D)} points -> {paths['ref_sfm']}")


def _cmd_sfm_from_obj(args):
    """Textured-mesh -> posed renders -> SfM (the create_sfm_from_obj role,
    reference scripts/create_sfm_from_obj.py; obj_pipeline.sh step 1)."""
    from pixtrack_tpu.mapping.mesh_render import create_scene_from_mesh
    from pixtrack_tpu.pipelines.assets import layout

    paths = layout(args.object_path)
    # renders go to the mapping dir (the reference copies mapping pngs into
    # pixsfm/dataset/mapping, run_reconstruction.py:76-84); the triangulated
    # model is SAVED to ref_sfm so train-nerf/nerf-sfm/augment can load it
    scene, _images = create_scene_from_mesh(
        args.obj, out_dir=paths["mapping"], image_size=args.image_size,
        subdiv=args.subdiv,
    )
    paths["ref_sfm"].mkdir(parents=True, exist_ok=True)
    scene.save(paths["ref_sfm"])
    print(f"mesh SfM: {len(scene.images)} views, {len(scene.points3D)} "
          f"points -> {paths['ref_sfm']}")


def _cmd_extract_frames(args):
    """Video -> frame folder (colmap2ingp's ffmpeg role, cv2-based)."""
    import cv2

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % args.every == 0:
            cv2.imwrite(str(out / f"frame_{saved:05d}.png"), frame)
            saved += 1
        i += 1
    cap.release()
    print(f"extracted {saved} frames -> {out}")


def _cmd_convert_images(args):
    """Batch image conversion (Convert_HEIC_to_PNG.ipynb's role)."""
    from pixtrack_tpu.utils.image_convert import convert_images

    n = convert_images(
        args.src_dir, args.out_dir, to=args.to,
        exts=args.ext if args.ext else None,
    )
    print(f"converted {n} images -> {args.out_dir} ({args.to})")


def _cmd_bundle_adjust(args):
    """Refine an SfM model in place (COLMAP bundle_adjuster role)."""
    from pixtrack_tpu.mapping.bundle import bundle_adjust_scene
    from pixtrack_tpu.sfm.scene import SceneModel

    scene = SceneModel.load(args.model)
    refined = bundle_adjust_scene(scene, iters=args.iters)
    out = Path(args.out or args.model)
    out.mkdir(parents=True, exist_ok=True)
    refined.save(out)
    print(f"bundle-adjusted {len(scene.images)} images -> {out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="pixtrack-tpu", description=__doc__)
    p.add_argument(
        "--platform",
        choices=["tpu", "cpu"],
        help="force the JAX platform (default: environment's, usually TPU)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("train-nerf", help="train the hash-grid NeRF")
    s.add_argument("--object_path", required=True)
    s.add_argument("--n_steps", type=int, default=10000)
    s.add_argument("--downscale", type=int, default=1)
    s.add_argument("--batch_rays", type=int, default=1 << 14)
    s.add_argument("--save_every", type=int, default=1000,
                   help="checkpoint the snapshot every N steps (0 = off)")
    s.add_argument("--n_coarse", type=int, default=64,
                   help="stratified samples per ray")
    s.add_argument("--n_fine", type=int, default=32,
                   help="importance samples per ray (0 disables fine pass)")
    s.add_argument("--resume", action="store_true",
                   help="warm-start from an existing snapshot")
    s.add_argument("--devices", type=int, default=0,
                   help="train over an N-device (dp, tp) mesh (0/1 = single "
                        "device; rays shard over dp, hash levels over tp)")
    s.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width of the mesh (divides --devices)")
    s.set_defaults(fn=_cmd_train_nerf)

    s = sub.add_parser("nerf-sfm", help="NeRF re-render + triangulation")
    s.add_argument("--object_path", required=True)
    s.add_argument("--spp", type=int, default=2)
    s.set_defaults(fn=_cmd_nerf_sfm)

    s = sub.add_parser("augment", help="rotation-augment the SfM model")
    s.add_argument("--object_path", required=True)
    s.set_defaults(fn=_cmd_augment)

    s = sub.add_parser("track", help="track a query image folder")
    s.add_argument("--object_path")
    s.add_argument("--config")
    s.add_argument("--query", required=True)
    s.add_argument("--out_dir", default="out")
    s.add_argument("--frames", type=int)
    s.set_defaults(fn=_cmd_track)

    s = sub.add_parser(
        "track-batch",
        help="track several videos at once over the device mesh (dp)",
    )
    s.add_argument("--object_path", required=True)
    s.add_argument("--query", nargs="+", required=True,
                   help="one frames dir per video")
    s.add_argument("--config")
    s.add_argument("--out_dir", default="out_batch")
    s.add_argument("--frames", type=int, default=None)
    s.add_argument("--devices", type=int, default=0,
                   help="mesh size (0 = all available devices)")
    s.set_defaults(fn=_cmd_track_batch)

    s = sub.add_parser("track-ycb", help="YCB-Video evaluation")
    s.add_argument("--object_path", required=True)
    s.add_argument("--ycb_root", required=True)
    s.add_argument("--object_name", default="003_cracker_box")
    s.add_argument("--query", default="0000/:")
    s.add_argument("--out_dir", default="out_ycb")
    s.set_defaults(fn=_cmd_track_ycb)

    s = sub.add_parser("visualize", help="render pose overlays")
    s.add_argument("--object_path", required=True)
    s.add_argument("--poses", required=True)
    s.add_argument("--out_dir", default="results")
    s.add_argument("--video", action="store_true")
    s.set_defaults(fn=_cmd_visualize)

    s = sub.add_parser("eval", help="trajectory metrics from poses.pkl")
    s.add_argument("--poses", required=True)
    s.set_defaults(fn=_cmd_eval)

    s = sub.add_parser("demo", help="synthetic end-to-end smoke run")
    s.add_argument("--frames", type=int, default=6)
    s.add_argument("--out_dir")
    s.set_defaults(fn=_cmd_demo)

    s = sub.add_parser("bench", help="run the benchmark")
    s.set_defaults(fn=_cmd_bench)

    s = sub.add_parser("reconstruct",
                       help="unposed SfM from raw images (run_reconstruction)")
    s.add_argument("--object_path", required=True)
    s.add_argument("--images", help="source image folder (copied to mapping/)")
    s.add_argument("--verbose", action="store_true")
    s.add_argument("--no-featuremetric", action="store_true",
                   help="skip featuremetric keypoint adjustment (pixsfm KA)")
    s.add_argument("--max_keypoints", type=int, default=1024,
                   help="detector budget per image (hloc superpoint_max role)")
    s.add_argument("--matcher", choices=("auto", "nn", "learned"),
                   default="auto",
                   help="pair matcher: trained attention matcher if its "
                        "checkpoint ships (auto), mutual-NN+ratio (nn), or "
                        "require the learned one (learned)")
    s.add_argument("--detector",
                   choices=("auto", "harris", "superpoint", "dense"),
                   default="auto",
                   help="keypoint detector: trained SuperPoint if its "
                        "checkpoint ships (auto), multi-scale Harris "
                        "(harris), require SuperPoint (superpoint), or "
                        "Harris keypoints + the shipped InfoNCE dense "
                        "descriptor (dense)")
    s.set_defaults(fn=_cmd_reconstruct)

    s = sub.add_parser("sfm-from-obj",
                       help="textured mesh -> posed renders -> SfM")
    s.add_argument("--object_path", required=True)
    s.add_argument("--obj", required=True)
    s.add_argument("--subdiv", type=int, default=1)
    s.add_argument("--image_size", type=int, default=512)
    s.set_defaults(fn=_cmd_sfm_from_obj)

    s = sub.add_parser("extract-frames", help="video -> frame folder")
    s.add_argument("--video", required=True)
    s.add_argument("--out_dir", required=True)
    s.add_argument("--every", type=int, default=1)
    s.set_defaults(fn=_cmd_extract_frames)

    s = sub.add_parser(
        "convert-images",
        help="batch-convert images (HEIC->PNG notebook role)",
    )
    s.add_argument("src_dir")
    s.add_argument("out_dir")
    s.add_argument("--to", default="png", help="target format (default png)")
    s.add_argument(
        "--ext", nargs="*", default=None,
        help="restrict source extensions (e.g. --ext heic jpg)",
    )
    s.set_defaults(fn=_cmd_convert_images)

    s = sub.add_parser("bundle-adjust", help="refine an SfM model (BA)")
    s.add_argument("--model", required=True)
    s.add_argument("--out")
    s.add_argument("--iters", type=int, default=20)
    s.set_defaults(fn=_cmd_bundle_adjust)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
