"""Precomputed reference-feature store (``reference_features.h5``).

The reference optionally loads per-reference, per-scale, per-level point
descriptors from an h5 file instead of extracting them from a live render
(PoseTrackerRefiner.read_features, pixtrack/localization/
pixloc_pose_refiners.py:175-198). Same capability here, with an explicit
layout::

    ref_<image_id>/
        p3d      (P, 3)   packed world points
        mask     (P,)     validity
        pose     (4, 4)   w2c pose the features were observed at
        ref_ids  (K,)     contributing reference image ids
        level_<j>/feat    (P, C_j)
        level_<j>/weight  (P,)
        level_<j>/valid   (P,)

Produced offline by :func:`save_reference_features` (e.g. from the asset
pipeline after NeRF-SfM), consumed by the trackers via
``StaticRefConfig.features_h5`` or directly with
:func:`load_reference_features`.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax.numpy as jnp
import numpy as np

from pixtrack_tpu.geometry import Pose
from pixtrack_tpu.tracking.refiner import ReferenceFeatures


def save_reference_features(path, refs: Dict[int, ReferenceFeatures]) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        for rid, rf in refs.items():
            g = f.create_group(f"ref_{int(rid)}")
            g.create_dataset("p3d", data=np.asarray(rf.p3d, np.float32))
            g.create_dataset("mask", data=np.asarray(rf.mask, bool))
            g.create_dataset("pose", data=np.asarray(rf.pose.to_4x4(), np.float64))
            g.create_dataset("ref_ids", data=np.asarray(list(rf.ref_ids), np.int64))
            for j, (ft, w, v) in enumerate(zip(rf.feats, rf.weights, rf.valids)):
                lg = g.create_group(f"level_{j}")
                lg.create_dataset("feat", data=np.asarray(ft, np.float32))
                lg.create_dataset("weight", data=np.asarray(w, np.float32))
                lg.create_dataset("valid", data=np.asarray(v, bool))


def load_reference_features(path, ref_ids: Iterable[int] | None = None
                            ) -> Dict[int, ReferenceFeatures]:
    import h5py

    out: Dict[int, ReferenceFeatures] = {}
    with h5py.File(path, "r") as f:
        names = list(f.keys()) if ref_ids is None else [
            f"ref_{int(r)}" for r in ref_ids
        ]
        for name in names:
            if name not in f:
                continue
            g = f[name]
            rid = int(name.split("_", 1)[1])
            n_levels = sum(1 for k in g.keys() if k.startswith("level_"))
            feats, weights, valids = [], [], []
            for j in range(n_levels):
                lg = g[f"level_{j}"]
                feats.append(jnp.asarray(lg["feat"][()]))
                weights.append(jnp.asarray(lg["weight"][()]))
                valids.append(jnp.asarray(lg["valid"][()]))
            out[rid] = ReferenceFeatures(
                p3d=jnp.asarray(g["p3d"][()]),
                mask=jnp.asarray(g["mask"][()]),
                feats=tuple(feats),
                weights=tuple(weights),
                valids=tuple(valids),
                pose=Pose.from_4x4(jnp.asarray(g["pose"][()], jnp.float32)),
                ref_ids=[int(x) for x in g["ref_ids"][()]],
            )
    return out


def precompute_reference_features(refiner, scene, render_fn, path,
                                  image_ids=None) -> None:
    """Offline producer: observe every reference image's points in a render
    at its own SfM pose and store the result (the artifact the reference's
    ``read_features`` expects to exist, SURVEY.md §2.4)."""
    refs = {}
    ids = scene.image_ids if image_ids is None else image_ids
    for rid in ids:
        pose = scene.pose_w2c(int(rid))
        img, camera, alpha = render_fn(int(rid), pose)
        refs[int(rid)] = refiner.extract_reference_features(
            [int(rid)], pose, img, camera, ref_alpha=alpha
        )
    save_reference_features(path, refs)
