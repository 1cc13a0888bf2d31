"""Production SuperPoint dense-distillation run (round-4 recipe).

Protocol identical to train_superpoint_run.py (candidate/promoted
separation, synthetic + mesh deployment gates, incumbent comparison,
sha256-paired eval records), but training uses the dense soft-target
distillation + true-correspondence descriptor recipe
(mapping/train_superpoint_dense.py) — the answer to the r3 failure where
hard per-cell labels left mesh repeatability at 0.33 vs Harris 0.604.

Usage:
  # 1. build the bank on CPU (TPU stays free):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu SPD_BANK_ONLY=1 \
      python scripts_dev/train_superpoint_dense_run.py
  # 2. train + gate (TPU):
  nohup python scripts_dev/train_superpoint_dense_run.py > /tmp/spd.log 2>&1 &

Env knobs: SPD_STEPS, SPD_BANK (npz path), SPD_BANK_ONLY, SPD_REGATE,
SPD_NOTE (freeform provenance, carried into the eval record; an existing
candidate eval's note is preserved unless overridden).
"""

import hashlib
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_STEPS = int(os.environ.get("SPD_STEPS", "4000"))
SAVE_EVERY = 250
BANK_PATH = os.environ.get("SPD_BANK", "/tmp/spd_dense_bank.npz")


def sha256(path: Path) -> str:
    return hashlib.sha256(path.read_bytes()).hexdigest()[:16]


def main():
    import jax

    from pixtrack_tpu.mapping.train_superpoint import (
        load_superpoint_weights,
        mesh_repeatability,
        repeatability,
        save_superpoint_weights,
    )
    from pixtrack_tpu.mapping.train_superpoint_dense import (
        SPDenseConfig,
        build_dense_pair_bank,
        train_superpoint_dense,
    )

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    cand = REPO / "assets" / "superpoint_candidate.npz"
    cand_eval = REPO / "assets" / "superpoint_candidate_eval.json"
    promoted = REPO / "assets" / "superpoint.npz"

    # provenance note: explicit env wins, else carry forward the previous
    # candidate eval's note (ADVICE r3: reruns must not clobber rationale)
    note = os.environ.get("SPD_NOTE")
    if note is None and cand_eval.exists():
        try:
            note = json.loads(cand_eval.read_text()).get("note")
        except Exception:
            note = None

    bank_path = Path(BANK_PATH)
    if not bank_path.exists():
        print(f"building dense pair bank -> {bank_path}", flush=True)
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            bank = build_dense_pair_bank(td, verbose=True)
        np.savez(bank_path, **bank)
        print(f"bank built in {time.time()-t0:.0f}s: "
              f"{bank['images'].shape[0]} images, "
              f"{bank['pairs'].shape[0]} pairs", flush=True)
    else:
        data = np.load(bank_path)
        bank = {k: data[k] for k in
                ("images", "votes", "pairs", "corr", "corr_valid")}
        print(f"loaded bank {bank_path}: {bank['images'].shape[0]} images, "
              f"{bank['pairs'].shape[0]} pairs", flush=True)
    if os.environ.get("SPD_BANK_ONLY") == "1":
        return

    if os.environ.get("SPD_REGATE") == "1":
        assert cand.exists(), cand
        info = {"history": [(0, float("nan"))]}
        train_s = 0.0
        print(f"re-gating existing candidate {sha256(cand)}", flush=True)
    else:
        cfg = SPDenseConfig(n_steps=N_STEPS)

        def checkpoint(step, loss, params):
            print(f"step {step}: loss {loss:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
            if step % SAVE_EVERY == 0:
                save_superpoint_weights(cand, params)

        model, params, info = train_superpoint_dense(
            cfg, bank, callback=checkpoint
        )
        save_superpoint_weights(cand, params)
        train_s = time.time() - t0
        print(f"trained {N_STEPS} steps in {train_s:.0f}s, "
              f"final loss {info['history'][-1][1]:.4f}", flush=True)

    # ---- acceptance gates (same two as train_superpoint_run.py) ----------
    params = load_superpoint_weights(cand)
    rep_sp, n_sp = repeatability(params, detector="superpoint")
    rep_h, _ = repeatability(None, detector="harris")
    fires = int(sum(n_sp))
    gate_syn = bool(fires > 200 and rep_sp >= 0.6 and rep_sp >= rep_h - 0.05)
    mrep_sp, mn_sp = mesh_repeatability(params, detector="superpoint")
    mrep_h, mn_h = mesh_repeatability(None, detector="harris")
    mfire = float(np.median(mn_sp))
    gate_mesh = bool(
        mrep_sp >= mrep_h - 0.05 and mfire >= 0.5 * float(np.median(mn_h))
    )
    print(f"mesh gate: sp rep {mrep_sp:.3f} ({mn_sp}) vs harris "
          f"{mrep_h:.3f} ({mn_h}) -> {gate_mesh}", flush=True)
    accepted = gate_syn and gate_mesh
    incumbent_rep = None
    if accepted and promoted.exists():
        inc = load_superpoint_weights(promoted)
        incumbent_rep, _ = mesh_repeatability(inc, detector="superpoint")
        accepted = mrep_sp >= incumbent_rep
        print(f"incumbent mesh repeatability {incumbent_rep:.3f} -> "
              f"candidate {'replaces' if accepted else 'loses to'} it",
              flush=True)
    print(f"repeatability: superpoint {rep_sp:.3f} ({fires} kps) "
          f"vs harris {rep_h:.3f}; gates syn={gate_syn} mesh={gate_mesh} "
          f"-> accepted={accepted}", flush=True)

    out = {
        "recipe": "dense_distillation_r4",
        "steps": N_STEPS,
        "final_loss": round(float(info["history"][-1][1]), 4),
        "train_seconds": round(train_s, 1),
        "repeatability_superpoint": round(float(rep_sp), 3),
        "repeatability_harris": round(float(rep_h), 3),
        "keypoints_fired": fires,
        "mesh_repeatability_superpoint": round(float(mrep_sp), 3),
        "mesh_repeatability_harris": round(float(mrep_h), 3),
        "mesh_keypoints_fired_median": mfire,
        "mesh_keypoints_harris_median": float(np.median(mn_h)),
        "accepted": accepted,
        "weights_sha256": sha256(cand),
    }
    if note:
        out["note"] = note
    if incumbent_rep is not None:
        out["incumbent_mesh_repeatability"] = round(float(incumbent_rep), 3)
    eval_path = REPO / "assets" / (
        "superpoint_eval.json" if accepted else "superpoint_candidate_eval.json"
    )
    with open(eval_path, "w") as f:
        json.dump(out, f, indent=1)
    if accepted:
        cand.rename(promoted)
        print("promoted to assets/superpoint.npz", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
