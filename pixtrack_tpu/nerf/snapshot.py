"""NeRF snapshot persistence.

Two formats:
- ``.npz`` (native): flax params flattened + field/render metadata. Fast,
  zero-copy mmap-able.
- ``.msgpack`` (interop-shaped): same content encoded with msgpack, filling
  the role of instant-ngp's weights.msgpack artifact in the reference asset
  layout (train_ingp_nerf.sh:2-14, loaded at ingp_utils.py:33). Note: this is
  NOT byte-compatible with tiny-cuda-nn's internal layout (which is tied to
  its fused-kernel memory order); it is our own schema under the same file
  extension so pipeline paths carry over.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

from pixtrack_tpu.nerf.field import NGPField


_FIELD_KEYS = (
    "n_levels", "features_per_level", "log2_table_size",
    "base_res", "max_res", "hidden", "geo_features",
)


def _field_meta(field: NGPField) -> dict:
    return {k: int(getattr(field, k)) for k in _FIELD_KEYS}


def save_snapshot(path, field: NGPField, params, extra: dict | None = None) -> None:
    path = Path(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    meta = {
        "format": "pixtrack-tpu-nerf-v1",
        "field": _field_meta(field),
        "extra": extra or {},
        "keys": [jax.tree_util.keystr(kp) for kp, _ in flat],
    }
    arrays = {f"arr_{i}": np.asarray(v) for i, (_, v) in enumerate(flat)}
    if path.suffix == ".msgpack":
        payload = {
            "meta": meta,
            "arrays": [
                {
                    "dtype": str(a.dtype),
                    "shape": list(a.shape),
                    "data": a.tobytes(),
                }
                for a in arrays.values()
            ],
        }
        path.write_bytes(msgpack.packb(payload, use_bin_type=True))
    else:
        np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_snapshot(path) -> Tuple[NGPField, dict, dict]:
    """Returns (field, params, extra)."""
    path = Path(path)
    if path.suffix == ".msgpack":
        payload = msgpack.unpackb(path.read_bytes(), raw=False)
        meta = payload["meta"]
        arrays = [
            np.frombuffer(a["data"], dtype=a["dtype"]).reshape(a["shape"])
            for a in payload["arrays"]
        ]
    else:
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        arrays = [data[f"arr_{i}"] for i in range(len(meta["keys"]))]
    field = NGPField(**meta["field"])
    # rebuild the params tree from key paths
    params: dict = {}
    for keystr, arr in zip(meta["keys"], arrays):
        # keystr like "['params']['encoding']['table']"
        keys = [k.strip("'") for k in keystr.strip("[]").split("][")]
        d = params
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = jnp.asarray(arr)
    return field, params, meta.get("extra", {})
