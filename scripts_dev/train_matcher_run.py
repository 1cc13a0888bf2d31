"""Production attention-matcher training run (VERDICT r2 #3).

r2's 5-scene/370-pair attempt overfit scene textures and lost to mutual-NN
on held-out pairs (assets/negative/matcher_meshbank_r2_eval.json). This run
scales the deployment-distribution bank (40 scenes / ~2100 pairs via
scripts_dev/build_matcher_bank.py) and trains with keypoint-frame rotation +
descriptor-noise augmentation on the TPU (device-resident bank, scan-chunked
steps — see train_matcher_on_bank(scan_chunk=...)).

Acceptance gate (mirrors tests/test_attention_matcher.py::TestTrainedMatcher
but on a DIFFERENT eval seed, so the shipped test stays untouched held-out
data): on fresh-seed wide-baseline mesh pairs the matcher must produce MORE
correct matches than mutual-NN+ratio at >= NN precision. On acceptance the
checkpoint + eval record (with weights sha256) land in assets/; a rejected
run only writes assets/matcher_candidate*.

Usage:
    nohup python scripts_dev/train_matcher_run.py > /tmp/matcher_run.log 2>&1 &
Env: MATCHER_BANK (default /tmp/matcher_bank/train.npz), MT_STEPS (8000).
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

BANK = Path(os.environ.get("MATCHER_BANK", "/tmp/matcher_bank/train.npz"))
N_STEPS = int(os.environ.get("MT_STEPS", "8000"))
# scan-chunked dispatch size on TPU; a 50-step chunk produced a program big
# enough to kill the remote compile helper (broken pipe) — default smaller
SCAN_CHUNK = int(os.environ.get("MT_SCAN", "10"))
EVAL_SEED = 777  # runner-private; the shipped test gates on seed 31


def sha256(path: Path) -> str:
    return hashlib.sha256(path.read_bytes()).hexdigest()[:16]


def evaluate(lm, bank, max_pairs=64):
    """correct/proposed counts for mutual-NN+ratio vs the learned matcher,
    binned by baseline angle (the negative record's protocol)."""
    from pixtrack_tpu.mapping.matcher import match_descriptors

    res = 192
    bins = [(8, 25), (25, 40), (40, 52)]
    out = {}
    ang = bank["angle_deg"]
    for lo, hi in bins:
        sel = np.nonzero((ang >= lo) & (ang < hi))[0][:max_pairs]
        nn_c = nn_p = at_c = at_p = 0
        for p in sel:
            v0, v1 = bank["valid0"][p], bank["valid1"][p]
            n0, n1 = int(v0.sum()), int(v1.sum())
            d0 = bank["desc0"][p][:n0].astype(np.float32)
            d1 = bank["desc1"][p][:n1].astype(np.float32)
            k0 = (bank["kpn0"][p][:n0] + 1) / 2 * (res - 1)
            k1 = (bank["kpn1"][p][:n1] + 1) / 2 * (res - 1)
            gt = bank["gt"][p][:n0]

            def prf(m0):
                m0 = np.asarray(m0)[:n0]
                prop = int((m0 >= 0).sum())
                corr = int(((m0 == gt) & (gt >= 0) & (m0 >= 0)).sum())
                return corr, prop

            c0, p0 = prf(match_descriptors(d0, d1, min_score=0.5,
                                           ratio=0.98)[0])
            c1, p1 = prf(lm(d0, k0, (res, res), d1, k1, (res, res))[0])
            nn_c += c0; nn_p += p0; at_c += c1; at_p += p1
        out[f"{lo}-{hi}deg"] = {
            "pairs": len(sel),
            "nn_correct": nn_c, "at_correct": at_c,
            "prec_nn": round(nn_c / max(nn_p, 1), 3),
            "prec_at": round(at_c / max(at_p, 1), 3),
            "rec_nn": round(nn_c / max(int((bank["gt"][sel] >= 0).sum()), 1), 3),
            "rec_at": round(at_c / max(int((bank["gt"][sel] >= 0).sum()), 1), 3),
        }
    tot = {k: sum(out[b][k] for b in out)
           for k in ("nn_correct", "at_correct")}
    prec_nn = sum(out[b]["prec_nn"] * out[b]["pairs"] for b in out) / max(
        sum(out[b]["pairs"] for b in out), 1)
    prec_at = sum(out[b]["prec_at"] * out[b]["pairs"] for b in out) / max(
        sum(out[b]["pairs"] for b in out), 1)
    out["total"] = {**tot, "prec_nn": round(prec_nn, 3),
                    "prec_at": round(prec_at, 3)}
    return out


def main():
    import tempfile

    import jax

    from pixtrack_tpu.mapping.attention_matcher import (
        LearnedMatcher,
        MatcherConfig,
        load_matcher_weights,
        save_matcher_weights,
    )
    from pixtrack_tpu.mapping.train_matcher import (
        MatcherTrainConfig,
        build_mesh_pair_bank,
        train_matcher_on_bank,
    )

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    cand = REPO / "assets" / "matcher_candidate.npz"
    promoted = REPO / "assets" / "matcher.npz"

    bank = dict(np.load(BANK))
    print(f"bank: {bank['gt'].shape[0]} pairs", flush=True)

    mcfg = MatcherConfig(desc_dim=bank["desc0"].shape[-1])
    on_tpu = jax.default_backend() != "cpu"
    cfg = MatcherTrainConfig(n_steps=N_STEPS, batch=8, lr=2e-4,
                             log_every=200, seed=2)

    def checkpoint(step, loss, params):
        print(f"step {step}: loss {loss:.4f} ({time.time()-t0:.0f}s)",
              flush=True)
        if step % 1000 < (max(SCAN_CHUNK, 1) if on_tpu else 1):
            save_matcher_weights(cand, params, mcfg)

    model, params, info = train_matcher_on_bank(
        bank, cfg, mcfg, callback=checkpoint,
        scan_chunk=SCAN_CHUNK if on_tpu else 0,
    )
    save_matcher_weights(cand, params, mcfg)
    train_s = time.time() - t0
    print(f"trained {N_STEPS} steps in {train_s:.0f}s, "
          f"holdout NLL {info['holdout_nll']:.3f}", flush=True)

    # ---- acceptance gate on a fresh-seed eval bank --------------------------
    model, params, mcfg2 = load_matcher_weights(cand)
    lm = LearnedMatcher(model, params, min_score=0.1)
    with tempfile.TemporaryDirectory() as td:
        ebank = build_mesh_pair_bank(td, n_scenes=2, n_views=12, res=192,
                                     max_kp=256, min_deg=8.0, max_deg=52.0,
                                     seed=EVAL_SEED)
    ev = evaluate(lm, ebank)
    tot = ev["total"]
    accepted = bool(tot["at_correct"] > tot["nn_correct"]
                    and tot["prec_at"] >= tot["prec_nn"])
    # never replace a better incumbent
    if accepted and promoted.exists():
        im, ip, _ = load_matcher_weights(promoted)
        inc = evaluate(LearnedMatcher(im, ip, min_score=0.1), ebank)["total"]
        accepted = tot["at_correct"] >= inc["at_correct"]
        print(f"incumbent correct {inc['at_correct']} -> candidate "
              f"{'replaces' if accepted else 'loses to'} it", flush=True)

    out = {
        "steps": N_STEPS,
        "train_seconds": round(train_s, 1),
        "train_pairs": int(bank["gt"].shape[0]),
        "holdout_nll": round(info["holdout_nll"], 3),
        "eval_seed": EVAL_SEED,
        "eval": ev,
        "accepted": accepted,
        "weights_sha256": sha256(cand),
    }
    eval_path = REPO / "assets" / (
        "matcher_eval.json" if accepted else "matcher_candidate_eval.json"
    )
    with open(eval_path, "w") as f:
        json.dump(out, f, indent=1)
    if accepted:
        cand.rename(promoted)
        print("promoted to assets/matcher.npz", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
