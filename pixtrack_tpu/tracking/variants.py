"""Tracker lineage: the reference's evolution steps as first-class variants.

The reference keeps its tracker history in-tree (SURVEY §2.1):

- r1 — fixed single reference image
  (pixtrack/deprecated_trackers/pixloc_tracker_r1.py:18-105);
- r2 — covisibility-based reference selection, K=2
  (deprecated_trackers/pixloc_tracker_r2.py:12-61);
- r3 — r2 + in-plane **roll tracking**: the query image is rotated by the
  negative tracked roll before optimization and the refined pose is
  re-rotated after, so the optimizer always sees an upright object
  (deprecated_trackers/pixloc_tracker_r3.py:13-79; the emitted
  ``tracked_roll``/``tracked_center`` are consumed by the visualizer,
  run_vis_on_poses.py:315-320);
- r5 — static SfM reference images (no NeRF) (pixloc_tracker_r5.py:29-155);
- r6 — + NeRF-rendered reference view at the reference's own SfM pose;
- r7 — + debug tracker, preloaded frames, ``reference_scale``;
- r8 — + dynamic-reference feature cache and cold-start multiscale [4, 1]
  (r8 == r9 minus depth masking);
- r9 — the flagship (``PixTrackTracker``, tracking/tracker.py).

Here the lineage is expressed over ONE engine: ``StaticRefTracker`` serves
r1/r2/r5 (disk reference images at their SfM poses), a render-at-db-pose
option serves r6/r7, config presets serve r8, and ``RollTracker`` adds the
r3 mechanism on top of any of them. No semantics are duplicated.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.tracking.refiner import ReferenceFeatures, RefineResult
from pixtrack_tpu.tracking.tracker import PixTrackTracker, TrackerConfig


# ---------------------------------------------------------------------------
# In-plane roll machinery (reference r3:53-79 + pose_utils.py:136-144)
# ---------------------------------------------------------------------------

def rotate_image(image: np.ndarray, angle_deg: float,
                 center: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """Rotate image content counter-clockwise by ``angle_deg`` about
    ``center`` (default: image center), same-size output (the
    pose_utils.rotate_image role)."""
    import cv2

    h, w = image.shape[:2]
    if center is None:
        center = ((w - 1) / 2.0, (h - 1) / 2.0)
    M = cv2.getRotationMatrix2D(tuple(float(c) for c in center), float(angle_deg), 1.0)
    return cv2.warpAffine(image, M, (w, h), flags=cv2.INTER_LINEAR)


def _rz(angle_rad: float) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def roll_of_pose(T_w2c: Pose, up_world=(0.0, 0.0, 1.0)) -> float:
    """In-plane roll of the object in the image: angle (rad, CCW-positive in
    image coords with y down) between the projected world up-axis and image
    'up' (-y). 0 when the object appears upright."""
    u_c = np.asarray(T_w2c.R) @ np.asarray(up_world, np.float64)
    # image-plane direction of the up axis (x right, y down in pixels)
    return float(np.arctan2(u_c[0], -u_c[1]))


def pre_opt_rotation(T_w2c: Pose, image_angle_rad: float) -> Pose:
    """Pose seen by the optimizer when the query image has been rotated by
    ``image_angle_rad`` (cv2 convention: positive = content turns CCW on a
    y-down display) about the principal point.

    cv2's coordinate map is p' - c = [[cos a, sin a], [-sin a, cos a]](p - c);
    with the pinhole model p - c = f/z (x, y) that equals a camera-frame
    rotation x_cam' = Rz(-a) x_cam, so R' = Rz(-a) R, t' = Rz(-a) t.
    (Pinned numerically by test_variants roll round-trip.)
    """
    Rz = _rz(-image_angle_rad)
    return Pose.from_Rt(
        (Rz @ np.asarray(T_w2c.R)).astype(np.float32),
        (Rz @ np.asarray(T_w2c.t)).astype(np.float32),
    )


def post_opt_rotation(T_w2c_rot: Pose, image_angle_rad: float) -> Pose:
    """Inverse of :func:`pre_opt_rotation`: recover the true-image pose from
    the pose refined against the rotated query."""
    return pre_opt_rotation(T_w2c_rot, -image_angle_rad)


# ---------------------------------------------------------------------------
# Static / db-pose reference tracker (r1 / r2 / r5 / r6 / r7)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StaticRefConfig(TrackerConfig):
    """r1/r2/r5-era options on top of the shared TrackerConfig."""

    images_dir: Optional[str] = None   # mapping images root (disk refs)
    fixed_reference: bool = False      # r1: never re-select
    render_at_db_pose: bool = False    # r6/r7: NeRF render at the ref's pose
    # precomputed reference_features.h5 (the refiners:175-198 read_features
    # path): when set, per-reference features load from disk instead of
    # being extracted from images/renders
    features_h5: Optional[str] = None


class StaticRefTracker(PixTrackTracker):
    """Reference features come from the reference image itself — either the
    stored mapping image (r5: disk) or a NeRF render at the reference's own
    SfM pose (r6/r7) — instead of a render at the current estimate (r8/r9).

    Per-reference features are extracted once and memoized; masking is off
    (pre-r9 semantics) unless explicitly enabled.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if not isinstance(self.config, StaticRefConfig):
            raise TypeError("StaticRefTracker requires a StaticRefConfig")
        self._static_refs: Dict[int, ReferenceFeatures] = {}
        if self.config.features_h5:
            from pixtrack_tpu.tracking.feature_io import load_reference_features

            self._static_refs.update(
                load_reference_features(self.config.features_h5)
            )

    # -- reference features -------------------------------------------------
    def _load_reference_image(self, ref_id: int) -> np.ndarray:
        from pixtrack_tpu.utils.io import _read_rgb

        name = self.scene.images[int(ref_id)].name
        return _read_rgb(os.path.join(self.config.images_dir, name))

    def static_reference(self, ref_id: int) -> ReferenceFeatures:
        ref = self._static_refs.get(int(ref_id))
        if ref is not None:
            return ref
        pose = self.scene.pose_w2c(int(ref_id))
        if self.config.render_at_db_pose:
            img, cam, alpha = self.get_reference_image(pose)
        else:
            img = self._load_reference_image(ref_id)
            cam = self.scene.camera_for_image(int(ref_id))
            if self.config.reference_scale != 1.0:
                import cv2

                s = self.config.reference_scale
                img = cv2.resize(img, None, fx=s, fy=s)
                cam = cam.scale(s)
            alpha = None
        ref = self.refiner.extract_reference_features(
            [int(ref_id)], pose, img, cam, ref_alpha=alpha
        )
        self._static_refs[int(ref_id)] = ref
        return ref

    # -- overridden engine hooks --------------------------------------------
    def update_reference_ids(self) -> List[int]:
        if self.config.fixed_reference:
            return self.reference_ids
        # covis-based geodesic selection (r2:12-61), K = num_refs
        saved, self.cache_hit = self.cache_hit, False
        try:
            return super().update_reference_ids()
        finally:
            self.cache_hit = saved

    def refine(self, query) -> bool:
        query_path, query_image = query
        query_image = np.asarray(query_image)

        if self.cold_start:
            multiscale = self.config.cold_multiscale
            self.relocalize(query)
            self.cold_start = False
        else:
            multiscale = self.config.steady_multiscale
            if self.config.mask_always or (self.success and self.config.use_mask):
                mask = self.get_mask(self.pose)
                query_image = (query_image * mask[..., None]).astype(query_image.dtype)

        self.update_reference_ids()
        results: Dict[int, RefineResult] = {}
        for ref_id in self.reference_ids:
            ref = self.static_reference(ref_id)
            results[ref_id] = self.refiner.refine(
                query_image, self.camera, self.pose, ref, multiscale=multiscale
            )
        best_id = min(results, key=lambda k: results[k].cost)
        best = results[best_id]
        self.reference_ids = [best_id] + [i for i in self.reference_ids if i != best_id]
        return self._finish_frame(query_path, best)

    def _finish_frame(self, query_path, best: RefineResult) -> bool:
        """Shared bookkeeping tail of refine() (threshold, history, trace)."""
        if self.cost_threshold is None and np.isfinite(best.cost):
            self.cost_threshold = max(
                best.cost * self.config.cost_threshold_factor,
                self.config.cost_threshold_min,
            )
        success = best.success and best.cost <= (self.cost_threshold or np.inf)
        if success:
            self.pose = best.T_refined
        self.success = success
        name = os.path.basename(str(query_path))
        self.pose_history[name] = {
            "success": success,
            "T_init": np.asarray(best.T_init.to_4x4()),
            "T_refined": np.asarray(best.T_refined.to_4x4()),
            "camera": {
                "size": np.asarray(self.camera.size),
                "f": np.asarray(self.camera.f),
                "c": np.asarray(self.camera.c),
                "k": np.asarray(self.camera.k),
            },
            "cost": best.cost,
            "reference_ids": list(self.reference_ids),
            "query_path": str(query_path),
        }
        self.trace.append(
            {
                "frame": name,
                "cost": best.cost,
                "num_iters": best.num_iters,
                "num_valid": best.num_valid,
                "cache_hit": self.cache_hit,
                "success": success,
            }
        )
        if hasattr(self, "pbar"):
            self.pbar.set_description(
                f"Cost: {best.cost:.4f}, Relocalizations: {self.relocalization_count}"
            )
        return success


class RollTracker(StaticRefTracker):
    """r3: tracks the object's in-plane roll explicitly. Each frame the query
    is rotated by -tracked_roll about tracked_center so the optimizer sees an
    upright object (matching the upright reference set); the refined pose is
    rotated back and the roll re-estimated from it (r3:53-79)."""

    def __init__(self, *args, up_world=(0.0, 0.0, 1.0), **kwargs):
        super().__init__(*args, **kwargs)
        self.up_world = np.asarray(up_world, np.float64)
        self.tracked_roll = 0.0   # radians
        self.tracked_center: Optional[Tuple[float, float]] = None

    def relocalize(self, query) -> None:
        super().relocalize(query)
        self.tracked_roll = roll_of_pose(self.pose, self.up_world)

    def refine(self, query) -> bool:
        query_path, query_image = query
        query_image = np.asarray(query_image)
        if self.cold_start:
            self.relocalize(query)
            self.cold_start = False
            multiscale = self.config.cold_multiscale
        else:
            multiscale = self.config.steady_multiscale

        roll = self.tracked_roll
        c = np.asarray(self.camera.c)
        self.tracked_center = (float(c[0]), float(c[1]))
        # rotate the query so the object appears upright; the optimizer works
        # in the rotated frame
        q_rot = rotate_image(query_image, np.rad2deg(roll), self.tracked_center)
        T_rot = pre_opt_rotation(self.pose, roll)

        self.update_reference_ids()
        results: Dict[int, RefineResult] = {}
        for ref_id in self.reference_ids:
            ref = self.static_reference(ref_id)
            results[ref_id] = self.refiner.refine(
                q_rot, self.camera, T_rot, ref, multiscale=multiscale
            )
        best_id = min(results, key=lambda k: results[k].cost)
        best = results[best_id]

        # un-rotate the refined pose back into the true image frame
        best.T_refined = post_opt_rotation(best.T_refined, roll)
        best.T_init = self.pose
        ok = self._finish_frame(query_path, best)
        if ok:
            self.tracked_roll = roll_of_pose(self.pose, self.up_world)
        self.pose_history[os.path.basename(str(query_path))].update(
            {"tracked_roll": self.tracked_roll, "tracked_center": self.tracked_center}
        )
        return ok


# ---------------------------------------------------------------------------
# Named lineage presets
# ---------------------------------------------------------------------------

def _static_cfg(**kw) -> StaticRefConfig:
    base = dict(use_mask=False, cold_multiscale=(1,), steady_multiscale=(1,),
                reference_scale=1.0)
    base.update(kw)
    return StaticRefConfig(**base)


def make_tracker_r1(scene, extractor, images_dir, **kw):
    """Fixed single reference (r1:18-105)."""
    cfg = _static_cfg(images_dir=images_dir, fixed_reference=True, num_refs=1)
    return StaticRefTracker(scene, extractor, testbed=None, nerf2sfm=None,
                            config=cfg, **kw)


def make_tracker_r2(scene, extractor, images_dir, **kw):
    """Covisibility reference selection, K=2 (r2:12-61)."""
    cfg = _static_cfg(images_dir=images_dir, num_refs=2)
    return StaticRefTracker(scene, extractor, testbed=None, nerf2sfm=None,
                            config=cfg, **kw)


def make_tracker_r3(scene, extractor, images_dir, up_world=(0.0, 0.0, 1.0), **kw):
    """r2 + in-plane roll tracking (r3:13-79)."""
    cfg = _static_cfg(images_dir=images_dir, num_refs=2)
    return RollTracker(scene, extractor, testbed=None, nerf2sfm=None,
                       config=cfg, up_world=up_world, **kw)


def make_tracker_r5(scene, extractor, images_dir, **kw):
    """Static SfM reference images, K=1 (r5:29-155)."""
    cfg = _static_cfg(images_dir=images_dir, num_refs=1)
    return StaticRefTracker(scene, extractor, testbed=None, nerf2sfm=None,
                            config=cfg, **kw)


def make_tracker_r6(scene, extractor, testbed, nerf2sfm, **kw):
    """NeRF-rendered reference at the reference's own SfM pose (r6)."""
    cfg = _static_cfg(render_at_db_pose=True, num_refs=1)
    return StaticRefTracker(scene, extractor, testbed=testbed,
                            nerf2sfm=nerf2sfm, config=cfg, **kw)


def make_tracker_r7(scene, extractor, testbed, nerf2sfm, reference_scale=0.5, **kw):
    """r6 + reference_scale (+ debug trace, always on here) (r7)."""
    cfg = _static_cfg(render_at_db_pose=True, num_refs=1,
                      reference_scale=reference_scale)
    return StaticRefTracker(scene, extractor, testbed=testbed,
                            nerf2sfm=nerf2sfm, config=cfg, **kw)


def make_tracker_r8(scene, extractor, testbed, nerf2sfm, **kw):
    """Dynamic-reference cache + cold multiscale [4,1]; no depth masking
    (r8 == r9 minus the mask)."""
    cfg = TrackerConfig(use_mask=False)
    return PixTrackTracker(scene, extractor, testbed=testbed,
                           nerf2sfm=nerf2sfm, config=cfg, **kw)
