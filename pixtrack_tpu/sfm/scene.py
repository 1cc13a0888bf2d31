"""SceneModel: an array-first SfM scene container.

Replaces the reference's ``pixloc.pixlib.models.Model3D`` (API inferred from
call sites: ``Model3D(path)``, ``.cameras``, ``.points3D``, ``.name2id``,
``get_p3did_to_dbids`` / ``get_dbid_to_p3dids`` at
pixtrack/localization/pixloc_pose_refiners.py:151,212 and
pixtrack/pose_trackers/pixloc_tracker_r9.py:78,100) and the covisibility
extraction in pixtrack/utils/hloc_utils.py:28-47.

Design: instead of dict-of-objects traversal, everything is packed into flat
numpy arrays at load time (poses, points, observation incidence in CSR form),
so covisibility is one sparse matmul and point selection for the jitted
aligner is vectorized masking + padding to a static shape.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from pixtrack_tpu.geometry import Camera, Pose
from pixtrack_tpu.sfm import colmap_io


class SceneModel:
    """SfM scene with packed arrays and COLMAP-compatible IO."""

    def __init__(self, cameras, images, points3D):
        # raw records (kept for exact round-trip IO)
        self.cameras: Dict[int, colmap_io.CameraRecord] = cameras
        self.images: Dict[int, colmap_io.ImageRecord] = images
        self.points3D: Dict[int, colmap_io.Point3DRecord] = points3D

        # ---- packed image arrays ----
        self.image_ids = np.array(sorted(images.keys()), np.int64)
        self._imgidx = {int(i): k for k, i in enumerate(self.image_ids)}
        n = len(self.image_ids)
        self.qvecs = np.zeros((n, 4))
        self.tvecs = np.zeros((n, 3))
        self.camera_ids = np.zeros(n, np.int64)
        self.names = []
        for k, iid in enumerate(self.image_ids):
            im = images[int(iid)]
            self.qvecs[k] = im.qvec
            self.tvecs[k] = im.tvec
            self.camera_ids[k] = im.camera_id
            self.names.append(im.name)
        self.name2id = {nm: int(i) for nm, i in zip(self.names, self.image_ids)}

        # ---- packed point arrays ----
        self.point_ids = np.array(sorted(points3D.keys()), np.int64)
        self._ptidx = {int(p): k for k, p in enumerate(self.point_ids)}
        m = len(self.point_ids)
        self.xyz = np.zeros((m, 3))
        self.rgb = np.zeros((m, 3), np.uint8)
        self.point_errors = np.zeros(m)
        self.track_lengths = np.zeros(m, np.int64)
        for k, pid in enumerate(self.point_ids):
            p = points3D[int(pid)]
            self.xyz[k] = p.xyz
            self.rgb[k] = p.rgb
            self.point_errors[k] = p.error
            self.track_lengths[k] = len(p.image_ids)

        # ---- observation incidence (images x points), CSR ----
        rows, cols = [], []
        for k, pid in enumerate(self.point_ids):
            p = points3D[int(pid)]
            for iid in p.image_ids:
                ii = self._imgidx.get(int(iid))
                if ii is not None:
                    rows.append(ii)
                    cols.append(k)
        data = np.ones(len(rows), np.int32)
        self.incidence = sp.csr_matrix(
            (data, (rows, cols)), shape=(n, m), dtype=np.int32
        )
        # De-duplicate multi-observations of a point in the same image.
        self.incidence.data = np.minimum(self.incidence.data, 1)

    # ------------------------------------------------------------- loading ----
    @classmethod
    def load(cls, path) -> "SceneModel":
        cams, imgs, pts = colmap_io.read_model(path)
        return cls(cams, imgs, pts)

    def save(self, path, ext: str = ".bin") -> None:
        colmap_io.write_model(self.cameras, self.images, self.points3D, path, ext)

    # --------------------------------------------------------------- poses ----
    def pose_w2c(self, image_id: int) -> Pose:
        k = self._imgidx[int(image_id)]
        return Pose.from_quat_t(
            self.qvecs[k].astype(np.float32), self.tvecs[k].astype(np.float32)
        )

    def poses_w2c(self) -> Pose:
        """All registered image poses as one batched Pose (world-to-camera)."""
        return Pose.from_quat_t(
            self.qvecs.astype(np.float32), self.tvecs.astype(np.float32)
        )

    def camera(self, camera_id: int) -> Camera:
        rec = self.cameras[int(camera_id)]
        return Camera.from_colmap(rec.model, rec.params, rec.width, rec.height)

    def camera_for_image(self, image_id: int) -> Camera:
        return self.camera(self.images[int(image_id)].camera_id)

    # -------------------------------------------------------- observations ----
    def p3d_indices_for_images(
        self, image_ids: Sequence[int], min_track_length: int = 1
    ) -> np.ndarray:
        """Indices (into packed point arrays) of 3D points observed by any of
        ``image_ids`` with track length >= min_track_length.

        This is the selection ``get_p3did_to_dbids`` feeds into the refiner
        (reference pixloc_pose_refiners.py:151-157) expressed as one sparse
        row-slice.
        """
        rows = [self._imgidx[int(i)] for i in image_ids if int(i) in self._imgidx]
        if not rows:
            return np.zeros(0, np.int64)
        seen = np.asarray(
            self.incidence[rows].sum(axis=0)
        ).ravel() > 0
        ok = seen & (self.track_lengths >= min_track_length)
        return np.nonzero(ok)[0].astype(np.int64)

    def images_for_p3d(self, point_id: int) -> np.ndarray:
        """Image ids observing a 3D point (the dbids of get_p3did_to_dbids)."""
        return self.points3D[int(point_id)].image_ids

    # -------------------------------------------------------- covisibility ----
    def covisibility(self) -> sp.csr_matrix:
        """(n_images x n_images) matrix of shared-3D-point counts.

        Replaces hloc_utils.extract_covisibility (reference
        pixtrack/utils/hloc_utils.py:28-47): one sparse I @ I^T instead of a
        python double loop over tracks.
        """
        cov = (self.incidence @ self.incidence.T).tocsr()
        cov.setdiag(0)
        cov.eliminate_zeros()
        return cov

    def covisibility_dict(self, threshold: int = 0) -> Dict[int, Dict[int, int]]:
        """Name-keyed covisibility mapping matching the reference's covis.pkl
        structure ({name: {other_name: count}}, pixloc_tracker_r9.py:66-72)."""
        cov = self.covisibility().tocoo()
        out: Dict[str, Dict[str, int]] = {nm: {} for nm in self.names}
        for i, j, v in zip(cov.row, cov.col, cov.data):
            if v > threshold:
                out[self.names[i]][self.names[j]] = int(v)
        return out

    def save_covisibility(self, path) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.covisibility_dict(), f)

    # ----------------------------------------------------- aligner packing ----
    def pack_points(
        self,
        indices: np.ndarray,
        pad_to: Optional[int] = None,
        pad_multiple: int = 512,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(xyz_padded (P, 3) f32, valid_mask (P,) bool) with static-friendly P.

        Pads to ``pad_to`` (or the next multiple of ``pad_multiple``) so the
        jitted LM aligner sees a small set of distinct shapes and recompiles
        rarely.
        """
        n = len(indices)
        if pad_to is None:
            pad_to = max(pad_multiple, int(np.ceil(n / pad_multiple)) * pad_multiple)
        if n > pad_to:
            # Keep the longest tracks (most reliable points).
            order = np.argsort(-self.track_lengths[indices])
            indices = indices[order[:pad_to]]
            n = pad_to
        xyz = np.zeros((pad_to, 3), np.float32)
        xyz[:n] = self.xyz[indices].astype(np.float32)
        mask = np.zeros(pad_to, bool)
        mask[:n] = True
        return xyz, mask

    # ----------------------------------------------------------- stats ----
    def __repr__(self):
        return (
            f"SceneModel(images={len(self.image_ids)}, "
            f"points={len(self.point_ids)}, cameras={len(self.cameras)})"
        )
