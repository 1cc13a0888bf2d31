"""A/B/C: Harris keypoints + {patch | learned SP head | combined}
descriptors on held-out wide-baseline mesh pairs (the matcher-gate
distribution, tests/test_attention_matcher.py seed 31).

One bank build banks BOTH descriptor sets (concatenated columns); each
variant is a column slice at eval time. Mutual-NN+ratio matching against
depth-verified GT assignments, reported overall and binned by baseline
angle. This isolates VERDICT r2 #3's "learned descriptors" claim from
detection: detection stays with the production multi-scale Harris (which
beats every trained detector head on mesh repeatability).

Diagnosis that motivated "combined": the SP descriptor head (1/8-res,
trained on true 3D correspondences) separates GT pairs from background
globally (gt sim 0.99 vs 0.15) but cannot disambiguate keypoints within
~8 px, so alone it mismatches locally (7/80 on an easy pair vs patch
92/106); patches are locally sharp but fail under viewpoint change.
Concatenation gives coarse context + fine detail.

Usage:
  python scripts_dev/eval_descriptors_ab.py [weights.npz]
Writes assets/descriptor_ab_eval.json (sha-paired to the weights).
"""

import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PATCH_D = 845  # production Harris patch descriptor dim (describe_keypoints)
W_LEARNED = 0.3  # combined weight on the learned block (diag3 sweep)


def main():
    from pixtrack_tpu.mapping.detector import detect_and_describe
    from pixtrack_tpu.mapping.matcher import (
        match_descriptors,
        match_descriptors_gated,
    )
    from pixtrack_tpu.mapping.superpoint import describe_at
    from pixtrack_tpu.mapping.train_matcher import build_mesh_pair_bank
    from pixtrack_tpu.mapping.train_superpoint import load_superpoint_weights

    weights = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "assets" / "superpoint_candidate.npz"
    )
    params = load_superpoint_weights(weights)
    t0 = time.time()

    def both(image, max_keypoints=256, **kw):
        kp, sc, pd = detect_and_describe(image, max_keypoints=max_keypoints,
                                         **kw)
        ld = describe_at(params, image, kp)
        assert pd.shape[1] == PATCH_D
        return kp, sc, np.concatenate([pd, ld], axis=1)

    # cache keyed by the weights sha: the bank embeds learned descriptors,
    # so a stale bank from different weights would corrupt the sha-paired
    # eval provenance
    wsha = hashlib.sha256(weights.read_bytes()).hexdigest()[:16]
    cache = Path(f"/tmp/desc_ab_bank_{wsha}.npz")
    if cache.exists():
        z = np.load(cache)
        bank = {k: z[k] for k in z.files}
    else:
        with tempfile.TemporaryDirectory() as td:
            bank = build_mesh_pair_bank(
                td, n_scenes=2, n_views=14, res=192, max_kp=256,
                min_deg=20.0, max_deg=52.0, seed=31, detector=both,
            )
        np.savez(cache, **bank)
    print(f"bank: {bank['gt'].shape[0]} pairs ({time.time()-t0:.0f}s)",
          flush=True)

    def view(desc, variant):
        p, l = desc[:, :PATCH_D], desc[:, PATCH_D:]
        if variant == "patch":
            return p
        if variant == "learned":
            return l
        return np.concatenate(
            [np.sqrt(1 - W_LEARNED) * p, np.sqrt(W_LEARNED) * l], axis=1
        )

    bins = [(20.0, 32.0), (32.0, 42.0), (42.0, 52.0)]
    results = {}
    variants = ("patch", "learned", "combined",
                "gated_0.3", "gated_0.5", "gated_0.7")
    for variant in variants:
        agg = {"proposed": 0, "correct": 0, "gt_possible": 0}
        per_bin = {f"{int(a)}-{int(b)}": {"proposed": 0, "correct": 0}
                   for a, b in bins}
        for p in range(bank["gt"].shape[0]):
            v0, v1 = bank["valid0"][p], bank["valid1"][p]
            full0 = bank["desc0"][p][v0].astype(np.float32)
            full1 = bank["desc1"][p][v1].astype(np.float32)
            gt = bank["gt"][p][v0]
            if variant.startswith("gated_"):
                tau = float(variant.split("_")[1])
                m, _ = match_descriptors_gated(
                    full0[:, :PATCH_D], full1[:, :PATCH_D],
                    full0[:, PATCH_D:], full1[:, PATCH_D:],
                    gate_threshold=tau,
                )
            else:
                m, _ = match_descriptors(
                    view(full0, variant), view(full1, variant)
                )
            prop = m >= 0
            corr = int((m[prop] == gt[prop]).sum())
            agg["proposed"] += int(prop.sum())
            agg["correct"] += corr
            agg["gt_possible"] += int((gt >= 0).sum())
            ang = float(bank["angle_deg"][p])
            for (a, b) in bins:
                if a <= ang < b:
                    k = f"{int(a)}-{int(b)}"
                    per_bin[k]["proposed"] += int(prop.sum())
                    per_bin[k]["correct"] += corr
        results[variant] = {
            "pairs": int(bank["gt"].shape[0]),
            **agg,
            "precision": round(agg["correct"] / max(agg["proposed"], 1), 4),
            "recall_vs_gt": round(
                agg["correct"] / max(agg["gt_possible"], 1), 4),
            "by_angle": {
                k: {**v, "precision": round(
                    v["correct"] / max(v["proposed"], 1), 4)}
                for k, v in per_bin.items()
            },
        }
        print(f"{variant}: {results[variant]}", flush=True)

    out = {
        "protocol": "harris_kp_mnn_ratio_heldout_mesh_pairs_seed31",
        "weights": weights.name,
        "weights_sha256": hashlib.sha256(
            weights.read_bytes()).hexdigest()[:16],
        "w_learned": W_LEARNED,
        **results,
        "winner": max(
            variants,
            key=lambda v: (
                results[v]["precision"] >= results["patch"]["precision"] - 0.02,
                results[v]["correct"],
            ),
        ),
        "seconds": round(time.time() - t0, 1),
    }
    path = REPO / "assets" / "descriptor_ab_eval.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
