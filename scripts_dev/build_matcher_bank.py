"""Build a large mesh-pair training bank for the attention matcher.

r2's negative result (assets/negative/matcher_meshbank_r2_eval.json) was
trained on 5 scenes / 370 pairs and overfit scene textures; VERDICT r2 #3
calls for orders-more texture diversity. This script renders N procedural
cube scenes (distinct smoothed-noise face textures per seed) on the SfM
capture-rig geometry and banks depth-verified GT assignments over real
detected keypoints (build_mesh_pair_bank) to an .npz.

Run on CPU (JAX_PLATFORMS=cpu) — the rasterizer is numpy and the TPU is
better spent training. Usage:
    JAX_PLATFORMS=cpu python scripts_dev/build_matcher_bank.py \
        /tmp/matcher_bank/train.npz --scenes 40 --views 14 --seed 1
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--views", type=int, default=14)
    ap.add_argument("--res", type=int, default=192)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--min-deg", type=float, default=8.0)
    ap.add_argument("--max-deg", type=float, default=52.0)
    ap.add_argument("--rich", action="store_true",
                    help="diverse texture families (mapping/textures.py) "
                         "instead of the legacy blurred-noise family")
    ap.add_argument("--detector", choices=["harris", "superpoint"],
                    default="harris",
                    help="bank descriptors from the given detector "
                         "(superpoint requires assets/superpoint.npz)")
    args = ap.parse_args()

    from pixtrack_tpu.mapping.train_matcher import build_mesh_pair_bank

    detector = None
    if args.detector == "superpoint":
        from pixtrack_tpu.mapping import default_detector

        detector = default_detector()
        assert detector is not None, "no assets/superpoint.npz shipped"

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        bank = build_mesh_pair_bank(
            td,
            n_scenes=args.scenes,
            n_views=args.views,
            res=args.res,
            max_kp=256,
            min_deg=args.min_deg,
            max_deg=args.max_deg,
            seed=args.seed,
            verbose=True,
            rich_textures=args.rich,
            detector=detector,
        )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    # descriptors in f16: halves the bank footprint with no measurable
    # effect (they are unit-norm patch values; training renormalizes)
    np.savez(
        out,
        **{
            k: (v.astype(np.float16) if k.startswith("desc") else v)
            for k, v in bank.items()
        },
    )
    print(
        f"bank: {bank['gt'].shape[0]} pairs from {args.scenes} scenes "
        f"in {time.time() - t0:.0f}s -> {out} "
        f"({out.stat().st_size / 1e6:.0f} MB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
