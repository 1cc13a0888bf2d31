"""PixTrackTracker: the flagship NeRF-referenced feature-metric tracker.

Full r9 semantics (reference pixtrack/pose_trackers/pixloc_tracker_r9.py):
- cold start: multiscale [4, 1] from the upright reference pose (r9:218-221);
- steady state: multiscale [1]; NeRF depth render -> erode/dilate object mask
  multiplied into the query (r9:222-225, 207-214);
- dynamic reference views: NeRF render at the current pose with a
  reference_scale-scaled model camera; features cached and reused while the
  pose stays within a geodesic threshold of the cached render pose
  (r9:145-205, THRESH default 0 == render fresh on rotation change);
- reference image-set selection: geodesic-nearest among covisible (> N
  shared points) neighbors of the current reference (r9:120-143);
- best-of-K refine, success gated by the optimizer's status AND an adaptive
  cost threshold fixed at 110% of the first frame's best cost (r9:255-268);
- failure -> relocalize to the upright reference pose and retry (base loop).

The host-side loop stays thin; renders, feature extraction, masking, and the
LM refine are each single jitted device programs.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.align.lm import AlignConfig
from pixtrack_tpu.features.extractor import FeatureExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.geometry.nerf_transform import NerfTransform
from pixtrack_tpu.geometry.rotation import geodesic_distance
from pixtrack_tpu.nerf.testbed import Testbed
from pixtrack_tpu.sfm.scene import SceneModel
from pixtrack_tpu.tracking.base import PoseTracker
from pixtrack_tpu.tracking.mask import depth_to_object_mask
from pixtrack_tpu.tracking.refiner import (
    ReferenceFeatures,
    ReferenceSet,
    Refiner,
    RefineResult,
    infer_camera_from_image,
)
from pixtrack_tpu.tracking.render_bridge import render_nerf_view


@dataclasses.dataclass
class TrackerConfig:
    upright_ref_img: Optional[str] = None  # None -> first image
    reference_scale: float = 0.5        # r9:81 (YCB uses 0.3)
    covis_threshold: int = 50           # N, r9:131
    num_refs: int = 1                   # K, r9:141
    cache_thresh_rad: float = 0.0       # THRESH, r9:171
    cost_threshold_factor: float = 1.1  # r9:260
    # Floor for the adaptive threshold: if the first frame aligns perfectly
    # (cost ~ 0, possible when the start pose equals a reference view) the
    # reference rule would gate out every later frame. 0.0 = reference-exact.
    cost_threshold_min: float = 0.0
    cold_multiscale: Tuple[int, ...] = (4, 1)
    steady_multiscale: Tuple[int, ...] = (1,)
    use_mask: bool = True
    mask_always: bool = False           # YCB masks every frame (ycb:249-250)
    # "splat": project the SfM cloud + on-device morphology (gather-free,
    # ~1000x cheaper than a depth render; see mask.splat_object_mask).
    # "nerf_depth": reference-exact NeRF depth render (r9:207-214).
    mask_mode: str = "splat"
    mask_kernel: int = 5
    mask_erode_iters: int = 1
    mask_dilate_iters: int = 5
    render_spp: int = 1
    # coarse-only tracking renders (96 uniform samples): the two-pass
    # importance sampler costs ~15x a plain eval on TPU and the extracted
    # features don't benefit; viz keeps the quality path
    fast_render: bool = True
    max_cache_entries: int = 64
    # Rounds of (render reference at current estimate -> refine) per frame.
    # 1 == reference behavior (render at the previous pose only). More rounds
    # contract the view-dependent feature bias toward the true pose (~0.75x
    # per round measured on the synthetic world) at one extra render each.
    refine_rounds: int = 1
    # Constant-velocity pose extrapolation in the fused steady-state path
    # (tracking/fused.py): initialize frame k at (T_{k-1} T_{k-2}^{-1}) T_{k-1}
    # instead of T_{k-1} (r9 behavior); auto-disabled around failures/
    # relocalizations. Default OFF: measured on the bench orbit (v5e r2) it
    # does NOT raise FPS (LM iters/frame 63.7 vs 58.8 — the while_loop was
    # not the closed-loop bottleneck) and the doubled estimate noise in the
    # extrapolation (init err = motion + 2e_k - e_{k-1}) cost one frame
    # (19/20 success, 47 deg excursion). Useful only for high inter-frame
    # motion where init error dominates the basin, so kept as an option.
    motion_model: bool = False
    # Translation damping of the extrapolation: t_init = t_{k-1} +
    # vel_t_damp * (t_extrap - t_{k-1}). Full extrapolation (1.0) makes any
    # pose error the aligner cannot observe (depth along the view axis on a
    # low-texture silhouette) grow GEOMETRICALLY — measured on the bench
    # orbit: t error 0.019 -> 0.039 -> 0.077 -> 0.19 -> 0.35 -> 0.59 -> 1.66
    # over six frames, both extractors. At 0.5 the homogeneous error
    # recurrence has roots {1, 0.5}: persistent but non-amplifying, so even
    # weak depth corrections keep it bounded. Rotation extrapolates fully
    # (well-observed; the LM corrects it every frame).
    vel_t_damp: float = 0.5
    # Fused-path reference renders evaluate only a statically-sized window
    # around the cloud's projection (tracking/fused.py::_render_ref): rays
    # outside the silhouette composite to the thresholded black anyway, and
    # the reference render dominates the closed-loop frame cost.
    ref_crop: bool = True


class PixTrackTracker(PoseTracker):
    def __init__(
        self,
        scene: SceneModel,
        extractor: FeatureExtractor,
        testbed: Testbed,
        nerf2sfm: NerfTransform,
        config: TrackerConfig = TrackerConfig(),
        align_cfg: AlignConfig = AlignConfig(),
        eval_path: Optional[str] = None,
        covis: Optional[dict] = None,
    ):
        self.scene = scene
        self.config = config
        self.testbed = testbed
        if config.fast_render and testbed is not None:
            testbed.n_coarse, testbed.n_fine = 96, 0
        self.nerf2sfm = nerf2sfm
        self.eval_path = eval_path
        self.refiner = Refiner(scene, extractor, align_cfg)

        # covisibility (name-keyed dict, cached like covis.pkl r9:66-72)
        self.covis = covis if covis is not None else scene.covisibility_dict()

        ref_name = config.upright_ref_img or scene.names[0]
        self.reference_ids: List[int] = [scene.name2id[ref_name]]

        self.cold_start = True
        self.success = True
        self.cache_hit = False
        self.pose: Optional[Pose] = None
        self.camera: Optional[Camera] = None
        self.cost_threshold: Optional[float] = None
        self.relocalization_count = 0
        self.hits = 0
        self.misses = 0

        # dynamic reference feature cache: list of (R 3x3, ReferenceSet)
        self._cache: List[Tuple[np.ndarray, ReferenceSet]] = []
        self._current_ref: Optional[ReferenceSet] = None

        self.pose_history: Dict[str, dict] = {}
        self.trace: List[dict] = []

    # ------------------------------------------------------------- helpers ----
    def get_query_camera(self, query_image) -> Camera:
        return infer_camera_from_image(query_image)

    def relocalize(self, query) -> None:
        query_path, query_image = query
        if self.camera is None:
            self.camera = self.get_query_camera(query_image)
        # reset to the upright reference pose (r9:95-106)
        self.pose = self.scene.pose_w2c(self.reference_ids[0])
        self.relocalization_count += 1

    def update_reference_ids(self) -> List[int]:
        if self.cache_hit:
            return self.reference_ids
        R_qry = np.asarray(self.pose.R)
        curr = self.reference_ids[0]
        curr_name = self.scene.images[int(curr)].name

        cand_names = [curr_name] + [
            n
            for n, c in self.covis.get(curr_name, {}).items()
            if c > self.config.covis_threshold
        ]
        cand_ids = np.array([self.scene.name2id[n] for n in cand_names])
        ks = [self.scene._imgidx[int(i)] for i in cand_ids]
        from pixtrack_tpu.geometry.rotation import quat_to_rotmat

        R_refs = np.asarray(quat_to_rotmat(jnp.asarray(self.scene.qvecs[ks], jnp.float32)))
        dists = np.asarray(
            geodesic_distance(jnp.asarray(R_qry)[None], jnp.asarray(R_refs))
        )
        order = np.argsort(dists)
        self.reference_ids = [int(cand_ids[i]) for i in order[: self.config.num_refs]]
        return self.reference_ids

    def get_reference_image(self, pose: Pose):
        cam_id = self.scene.images[int(self.reference_ids[0])].camera_id
        ref_camera = self.scene.camera(cam_id).scale(self.config.reference_scale)
        img, alpha = render_nerf_view(
            self.testbed, self.nerf2sfm, pose, ref_camera,
            spp=self.config.render_spp, return_alpha=True,
        )
        return img, ref_camera, alpha

    def _create_reference(self, pose: Pose) -> ReferenceSet:
        img, ref_camera, alpha = self.get_reference_image(pose)
        return self.refiner.extract_reference_set(
            self.reference_ids, pose, img, ref_camera, ref_alpha=alpha
        )

    def get_dynamic_reference(self, pose: Pose) -> ReferenceSet:
        """Cache lookup by rotation geodesic distance (r9:162-205)."""
        R_now = np.asarray(pose.R)
        if self._cache:
            Rs = np.stack([r for r, _ in self._cache])
            dists = np.asarray(
                geodesic_distance(jnp.asarray(R_now)[None], jnp.asarray(Rs))
            )
            best = int(np.argmin(dists))
            if dists[best] <= self.config.cache_thresh_rad:
                self.hits += 1
                self.cache_hit = True
                self._current_ref = self._cache[best][1]
                self.reference_ids = list(self._current_ref.ref_ids)
                return self._current_ref
        # miss: render a fresh reference at the current pose
        self.cache_hit = False
        self.update_reference_ids()
        ref = self._create_reference(pose)
        self._cache.append((R_now, ref))
        if len(self._cache) > self.config.max_cache_entries:
            self._cache.pop(0)
        self.misses += 1
        self.cache_hit = True  # matches r9:203 (suppresses re-selection)
        self._current_ref = ref
        return ref

    def get_mask(self, pose: Pose) -> np.ndarray:
        if self.config.mask_mode == "splat":
            if not hasattr(self, "_mask_p3d"):
                self._mask_p3d = jnp.asarray(self.scene.xyz.astype(np.float32))
            from pixtrack_tpu.tracking.mask import splat_object_mask

            m = splat_object_mask(
                pose, self.camera, self._mask_p3d,
                (int(float(self.camera.height)), int(float(self.camera.width))),
                dilate_iters=self.config.mask_dilate_iters,
            )
            return np.asarray(m)
        depth = render_nerf_view(
            self.testbed, self.nerf2sfm, pose, self.camera,
            spp=1, depth=True,
        )
        m = depth_to_object_mask(
            jnp.asarray(depth),
            size=self.config.mask_kernel,
            erode_iters=self.config.mask_erode_iters,
            dilate_iters=self.config.mask_dilate_iters,
        )
        return np.asarray(m)

    # -------------------------------------------------------------- refine ----
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

        refset = self.get_dynamic_reference(self.pose)

        # best-of-K: each db reference selects its own 3D points, observed
        # in the one shared dynamic render; best refine by cost (r9:235-263)
        results: Dict[int, RefineResult] = {}
        for ref_id in self.reference_ids:
            res = self.refiner.refine(
                query_image, self.camera, self.pose, refset.for_ref(ref_id),
                multiscale=multiscale,
            )
            results[ref_id] = res

        best_id = min(results, key=lambda k: results[k].cost)
        best = results[best_id]

        # optional extra render-refine rounds anchored at the new estimate
        for _ in range(self.config.refine_rounds - 1):
            if not best.success:
                break
            ref2 = self._create_reference(best.T_refined)
            nxt = self.refiner.refine(
                query_image, self.camera, best.T_refined, ref2.for_ref(best_id),
                multiscale=self.config.steady_multiscale,
            )
            if not nxt.success:
                break
            nxt.T_init = best.T_init
            best = nxt

        if self.cost_threshold is None and np.isfinite(best.cost):
            self.cost_threshold = max(
                best.cost * self.config.cost_threshold_factor,
                self.config.cost_threshold_min,
            )

        success = best.success and best.cost <= (self.cost_threshold or np.inf)
        if success:
            self.pose = best.T_refined
        self.success = success

        best.camera = self.camera
        best.reference_ids = list(self.reference_ids)
        best.query_path = str(query_path)
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
            "reference_ids": best.reference_ids,
            "query_path": best.query_path,
        }
        self.trace.append(
            {
                "frame": name,
                "cost": best.cost,
                "ref_costs": {int(k): float(v.cost) for k, v in results.items()},
                "best_ref": int(best_id),
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

    # ----------------------------------------------------------- fused loop ----
    def run_fused(self, frames, camera: Optional[Camera] = None):
        """Closed-loop tracking with ONE device dispatch per steady frame.

        Same steady-state semantics as run()/refine() but the whole per-frame
        hot path (relocalize-on-failure, mask, reference render, observation,
        query pyramid, LM, success gate) is a single jitted program and the
        pose chain stays on device (see tracking/fused.py for the exact
        semantics and documented deltas). Frame 0 cold-starts through the
        stepwise path. Fills pose_history/trace like run()."""
        from pixtrack_tpu.tracking.fused import run_fused

        return run_fused(self, frames, camera=camera)

    # ------------------------------------------------------------- outputs ----
    def save_poses(self) -> None:
        if self.eval_path is None:
            return
        os.makedirs(self.eval_path, exist_ok=True)
        with open(Path(self.eval_path) / "poses.pkl", "wb") as f:
            pickle.dump(self.pose_history, f)
        with open(Path(self.eval_path) / "trackers.pkl", "wb") as f:
            pickle.dump(self.trace, f)

    @property
    def stats(self) -> dict:
        return {
            "cache_hits": self.hits,
            "cache_misses": self.misses,
            "relocalizations": self.relocalization_count,
            "frames": len(self.pose_history),
        }
