"""Production basin-training run: train the UNet through the unrolled
aligner on TPU, save weights, and benchmark against the handcrafted
pyramid on the held-out nuisance-alignment suite.

Usage: nohup python scripts_dev/train_basin_run.py > /tmp/basin_run.log 2>&1 &
Writes assets/unet_basin.npz + assets/unet_basin_eval.json.
"""

import json
import time
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parents[1]


def main():
    from pixtrack_tpu.align.lm import AlignConfig
    from pixtrack_tpu.features import FeatureExtractor, HandcraftedExtractor
    from pixtrack_tpu.features.evaluate import FeatureEvalConfig, evaluate_extractor
    from pixtrack_tpu.features.train import save_unet_weights
    from pixtrack_tpu.features.train_basin import (
        BasinTrainConfig,
        train_basin_features,
    )

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    cfg = BasinTrainConfig(
        n_steps=2000, batch=2, n_perturb=4, size=192, tex_size=256,
        n_points=512, k_steps=5, scan_steps=False, log_every=50,
    )
    model, params, info = train_basin_features(
        cfg, seed=0,
        callback=lambda i, l: print(
            f"step {i} loss {l:.4f} t={time.time()-t0:.0f}s", flush=True
        ),
    )
    out = REPO / "assets" / "unet_basin.npz"
    save_unet_weights(out, params)
    print(f"saved {out} after {time.time()-t0:.0f}s", flush=True)

    # held-out benchmark: trained UNet vs handcrafted, production aligner
    ecfg = FeatureEvalConfig(n_scenes=12, n_perturb=4)
    acfg = AlignConfig(num_iters=100, robust_c=1.0)

    unet_ex = FeatureExtractor(model, params=params, resize=None)
    hand_ex = FeatureExtractor(HandcraftedExtractor(), resize=None)

    res = {}
    for name, ex in (("unet_basin", unet_ex), ("handcrafted", hand_ex)):
        t1 = time.time()
        res[name] = evaluate_extractor(lambda img, ex=ex: ex(img), ecfg, acfg)
        res[name]["eval_seconds"] = round(time.time() - t1, 1)
        print(name, json.dumps(res[name]), flush=True)

    res["train"] = {"history": info["history"][-10:],
                    "seconds": info["seconds"]}
    with open(REPO / "assets" / "unet_basin_eval.json", "w") as f:
        json.dump(res, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
