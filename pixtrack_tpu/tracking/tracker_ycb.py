"""YCB-Video evaluation tracker.

The reference's GT-assisted eval protocol (pixtrack/pose_trackers/
pixloc_tracker_ycb.py): same engine as the flagship tracker but
- frames carry dataset GT poses and calibrated cameras (YCBVideoIterator);
- cold start / relocalization snap to the GT pose (ycb:101-115);
- the object mask is applied on EVERY frame (ycb:249-250);
- reference selection searches the FULL model, not covisibility neighbors
  (ycb:117-130);
- per-frame translation/rotation errors vs GT are recorded and success is
  gated at t < 10 cm AND r < 10 deg (ycb:285,297-303);
- reference_scale defaults to 0.3 (ycb:89).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from pixtrack_tpu.eval.metrics import pose_errors
from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.geometry.rotation import geodesic_distance
from pixtrack_tpu.tracking.tracker import PixTrackTracker, TrackerConfig


def ycb_tracker_config(**overrides) -> TrackerConfig:
    base = dict(
        reference_scale=0.3,
        mask_always=True,
        use_mask=True,
        cold_multiscale=(4, 1),
        steady_multiscale=(1,),
    )
    base.update(overrides)
    return TrackerConfig(**base)


class YCBTracker(PixTrackTracker):
    """Tracker over (path, image, gt_pose, camera) tuples with GT gating."""

    def __init__(self, *args, t_gate: float = 0.10, r_gate_deg: float = 10.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.t_gate = t_gate
        self.r_gate_deg = r_gate_deg
        self.errors: List[dict] = []
        self._gt_pose: Optional[Pose] = None

    # full-model reference search (no covisibility restriction)
    def update_reference_ids(self) -> List[int]:
        if self.cache_hit:
            return self.reference_ids
        import jax.numpy as jnp

        from pixtrack_tpu.geometry.rotation import quat_to_rotmat

        R_qry = np.asarray(self.pose.R)
        R_refs = np.asarray(
            quat_to_rotmat(jnp.asarray(self.scene.qvecs, jnp.float32))
        )
        dists = np.asarray(
            geodesic_distance(jnp.asarray(R_qry)[None], jnp.asarray(R_refs))
        )
        order = np.argsort(dists)
        self.reference_ids = [
            int(self.scene.image_ids[i]) for i in order[: self.config.num_refs]
        ]
        return self.reference_ids

    def relocalize(self, query) -> None:
        # snap to the dataset GT pose (the reference's eval protocol).
        # ``query`` is the 4-tuple from the eval loop, OR the 2-tuple the
        # inherited cold-start path passes (PixTrackTracker.refine strips GT
        # before relocalizing) — in that case the GT stashed by refine() is
        # the current frame's.
        if len(query) == 4:
            _, _, gt_pose, camera = query
            self.camera = camera
            self.pose = gt_pose
        else:
            assert self._gt_pose is not None, "cold start before refine()"
            self.pose = self._gt_pose
        self.relocalization_count += 1

    def refine(self, query) -> bool:
        path, image, gt_pose, camera = query
        self._gt_pose = gt_pose
        if self.camera is None:
            self.camera = camera
        ok = super().refine((path, image))
        rec = self.pose_history[list(self.pose_history)[-1]]
        T = Pose.from_4x4(np.asarray(rec["T_refined"], np.float32))
        r_err, t_err = pose_errors(
            np.asarray(T.R), np.asarray(T.t),
            np.asarray(gt_pose.R), np.asarray(gt_pose.t),
        )
        rec["gt_pose"] = np.asarray(gt_pose.to_4x4())
        rec["t_error"] = t_err
        rec["r_error_deg"] = r_err
        self.errors.append({"frame": rec["query_path"], "t": t_err, "r": r_err})
        gated = ok and t_err < self.t_gate and r_err < self.r_gate_deg
        self.success = gated
        rec["success"] = gated
        return gated

    def summary(self, model_points: Optional[np.ndarray] = None) -> dict:
        from pixtrack_tpu.eval.metrics import evaluate_trajectory

        est, gt = [], []
        for rec in self.pose_history.values():
            Te = rec["T_refined"]
            Tg = rec.get("gt_pose")
            if Tg is None:
                continue
            est.append((Te[:3, :3], Te[:3, 3]))
            gt.append((Tg[:3, :3], Tg[:3, 3]))
        return evaluate_trajectory(
            est, gt, model_points=model_points, add_auc_threshold=0.1
        )
