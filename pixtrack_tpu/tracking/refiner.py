"""Refiner: feature-metric pose refinement against reference observations.

The engine role of the reference's ``PoseTrackerRefiner`` + ``Localizer``
(pixtrack/localization/pixloc_pose_refiners.py:121-396,28-118): select 3D
points for the chosen reference images, extract reference descriptors from a
(rendered) reference view, extract the query feature pyramid per image scale,
and run the LM aligner coarse-to-fine.

Structure differences (TPU-first): point sets are packed to a small number of
static shapes so the jitted aligner compiles a handful of times; reference
features live in device arrays keyed by an opaque cache id owned by the
tracker; the multiscale loop re-extracts the query pyramid per image_scale
exactly like the reference (feature_extractor.py:42-45).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.align.lm import AlignConfig, align_pyramid
from pixtrack_tpu.align.observations import build_level_data, observe_points
from pixtrack_tpu.features.extractor import FeatureExtractor
from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.sfm.scene import SceneModel


@dataclasses.dataclass
class RefineResult:
    """Mirrors the reference's per-frame ret dict (r9:263-273, consumed by
    run_vis_on_poses.py:289 and GetMetrics)."""

    success: bool
    T_init: Pose
    T_refined: Pose
    cost: float
    num_valid: int
    num_iters: int
    camera: Optional[Camera] = None
    reference_ids: Optional[Sequence[int]] = None
    query_path: Optional[str] = None
    costs_per_scale: Optional[list] = None


@dataclasses.dataclass
class ReferenceFeatures:
    """Per-reference-set observation pack (the features_dicts payload)."""

    p3d: jax.Array          # (P, 3) packed world points
    mask: jax.Array         # (P,) validity
    feats: Tuple[jax.Array, ...]   # per level (P, C_l)
    weights: Tuple[jax.Array, ...]  # per level (P,)
    valids: Tuple[jax.Array, ...]   # per level (P,)
    pose: Pose              # pose the reference view was rendered at
    ref_ids: Sequence[int]


@dataclasses.dataclass
class ReferenceSet:
    """One dynamic render observed per reference id (r9 features_dicts
    entry: shared render pose + per-db-reference feature dicts)."""

    pose: Pose
    ref_ids: Sequence[int]
    per_ref: Dict[int, ReferenceFeatures]

    def for_ref(self, ref_id: int) -> ReferenceFeatures:
        return self.per_ref[int(ref_id)]


class Refiner:
    def __init__(
        self,
        scene: SceneModel,
        extractor: FeatureExtractor,
        align_cfg: AlignConfig = AlignConfig(),
        min_points_opt: int = 10,      # reference refiners:151-157
        min_track_length: int = 1,
        pad_multiple: int = 1024,
    ):
        self.scene = scene
        self.extractor = extractor
        self.align_cfg = align_cfg
        self.min_points_opt = min_points_opt
        self.min_track_length = min_track_length
        self.pad_multiple = pad_multiple
        self._refine_jit = {}
        self._traced_jit = {}
        # optional DebugTracker observer (reference refiner.tracker,
        # localization/tracker.py): set via attach_tracker()
        self.tracker = None

    def attach_tracker(self, tracker) -> None:
        """Attach a DebugTracker; refinement then records per-iteration
        optimizer traces (and dense maps at debug >= 2)."""
        self.tracker = tracker

    # ---------------------------------------------------------------------
    def select_points(self, ref_ids: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
        idx = self.scene.p3d_indices_for_images(
            ref_ids, min_track_length=self.min_track_length
        )
        xyz, mask = self.scene.pack_points(idx, pad_multiple=self.pad_multiple)
        return jnp.asarray(xyz), jnp.asarray(mask)

    def extract_reference_features(
        self,
        ref_ids: Sequence[int],
        pose_w2c: Pose,
        ref_image: np.ndarray,
        ref_camera: Camera,
        ref_alpha: Optional[np.ndarray] = None,
        interior_erode: int = 7,
    ) -> ReferenceFeatures:
        """Observe the selected 3D points in a (rendered) reference view.

        ``ref_image`` is the NeRF render at ``pose_w2c`` with ``ref_camera``
        (already scaled by reference_scale — the caller owns that, like
        r9:145-152).

        ``ref_alpha``: optional render alpha. Points projecting near the
        object silhouette get their reference descriptors polluted by the
        background edge, which biases cross-view alignment toward reproducing
        the reference view; eroding the alpha and weighting observations by
        the interior mask suppresses that (handcrafted features especially —
        learned features are trained to be view-robust).
        """
        p3d, mask = self.select_points(ref_ids)
        pyr = self.extractor(ref_image)
        interior = self._interior_map(ref_alpha, interior_erode)
        return self._observe_reference(
            pyr, interior, p3d, mask, pose_w2c, ref_camera, list(ref_ids)
        )

    def extract_reference_set(
        self,
        ref_ids: Sequence[int],
        pose_w2c: Pose,
        ref_image: np.ndarray,
        ref_camera: Camera,
        ref_alpha: Optional[np.ndarray] = None,
        interior_erode: int = 7,
    ) -> "ReferenceSet":
        """Per-reference observation packs from ONE rendered view.

        r9's best-of-K loop (r9:235-263) refines against a separate feature
        dict per reference id — each db reference selects its OWN 3D points
        (those with an observation in that image) while all descriptors come
        from the same dynamic NeRF render. The pyramid is extracted once and
        observed K times with per-reference point selections."""
        pyr = self.extractor(ref_image)
        interior = self._interior_map(ref_alpha, interior_erode)
        per_ref = {}
        for rid in ref_ids:
            p3d, mask = self.select_points([rid])
            per_ref[int(rid)] = self._observe_reference(
                pyr, interior, p3d, mask, pose_w2c, ref_camera, [int(rid)]
            )
        return ReferenceSet(
            pose=pose_w2c, ref_ids=[int(r) for r in ref_ids], per_ref=per_ref
        )

    def _interior_map(self, ref_alpha, interior_erode: int):
        if ref_alpha is None or interior_erode <= 0:
            return None
        from pixtrack_tpu.tracking.mask import erode

        return erode(
            (jnp.asarray(ref_alpha) > 0.5).astype(jnp.float32),
            size=interior_erode,
        )

    def _observe_reference(
        self, pyr, interior, p3d, mask, pose_w2c, ref_camera, ref_ids
    ) -> ReferenceFeatures:
        feats, weights, valids = observe_points(pyr, pose_w2c, ref_camera, p3d, mask)
        if interior is not None:
            from pixtrack_tpu.align.interpolate import interpolate_scalar

            # the interior map lives at full reference resolution; sample it
            # at the raw image-space projections for every level
            p2d_img, _ = ref_camera.world2image(pose_w2c, p3d)
            wi, _ = interpolate_scalar(interior, p2d_img)
            weights = tuple(w * wi for w in weights)
        return ReferenceFeatures(
            p3d=p3d, mask=mask, feats=feats, weights=weights, valids=valids,
            pose=pose_w2c, ref_ids=ref_ids,
        )

    # ---------------------------------------------------------------------
    def refine(
        self,
        query_image: np.ndarray,
        camera: Camera,
        T_init: Pose,
        ref_feats: ReferenceFeatures,
        multiscale: Sequence[int] = (1,),
    ) -> RefineResult:
        """Refine T_init against reference features, coarse-to-fine over
        image scales then pyramid levels (reference refiners:200-271)."""
        n_valid_pts = int(np.asarray(ref_feats.mask).sum())
        if n_valid_pts < self.min_points_opt:
            return RefineResult(
                success=False, T_init=T_init, T_refined=T_init,
                cost=float("inf"), num_valid=0, num_iters=0,
            )

        debug = self.tracker is not None and self.tracker.debug >= 1
        T = T_init
        costs = []
        last_state = None
        for image_scale in multiscale:
            pyr = self.extractor(query_image, image_scale=int(image_scale))
            levels = build_level_data(
                pyr, ref_feats.feats, ref_feats.weights, ref_feats.valids,
                ref_feats.p3d, ref_feats.mask,
            )
            if debug:
                final = self._refine_traced(T, levels, camera)
            else:
                final, _ = self._aligned(levels, camera)(T, levels, camera)
            T = final.T
            last_state = final
            costs.append(float(final.cost))
        if debug:
            self.tracker.log_optim_done(T, p3d=ref_feats.p3d, cost=costs[-1])

        ok = bool(np.isfinite(costs[-1])) and int(last_state.num_valid) >= self.min_points_opt
        return RefineResult(
            success=ok,
            T_init=T_init,
            T_refined=T,
            cost=costs[-1],
            num_valid=int(last_state.num_valid),
            num_iters=int(last_state.num_iters),
            costs_per_scale=costs,
        )

    def _aligned(self, levels, camera):
        """Compile cache keyed by the level shapes."""
        key = tuple((ld.fmap.shape, ld.p3d.shape) for ld in levels)
        if key not in self._refine_jit:
            cfg = self.align_cfg

            @jax.jit
            def run(T, levels, camera):
                return align_pyramid(T, levels, camera, cfg)

            self._refine_jit[key] = run
        return self._refine_jit[key]

    def _refine_traced(self, T, levels, camera):
        """Coarse-to-fine with per-iteration traces, feeding the attached
        DebugTracker (align_level_traced per level)."""
        from pixtrack_tpu.align.lm import align_level_traced

        cfg = self.align_cfg
        for li, data in enumerate(reversed(levels)):
            key = (data.fmap.shape, data.p3d.shape)
            if key not in self._traced_jit:
                @jax.jit
                def run(T, data, camera):
                    return align_level_traced(T, data, camera, cfg)

                self._traced_jit[key] = run
            st, trace = self._traced_jit[key](T, data, camera)
            level_idx = len(levels) - 1 - li
            self.tracker.log_optim_iter(level_idx, trace)
            if self.tracker.debug >= 2:
                self.tracker.log_dense(level_idx, data.fmap, data.conf)
            T = st.T
        return st


def infer_camera_from_image(image_or_shape, focal_factor: float = 1.2) -> Camera:
    """COLMAP-style default camera for an un-calibrated query image
    (pycolmap.infer_camera_from_image role, reference r9:108-118):
    SIMPLE_RADIAL with f = 1.2 * max(w, h), principal point at center."""
    if hasattr(image_or_shape, "shape"):
        h, w = image_or_shape.shape[:2]
    else:
        h, w = image_or_shape
    f = focal_factor * max(w, h)
    return Camera.from_colmap(
        "SIMPLE_RADIAL", [f, w / 2.0, h / 2.0, 0.0], w, h
    )
