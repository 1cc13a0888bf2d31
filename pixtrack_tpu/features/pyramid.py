"""Feature pyramid container shared by extractors and the aligner."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax


@flax.struct.dataclass
class FeaturePyramid:
    """Multi-level dense feature maps for one image.

    Levels are ordered fine -> coarse (level 0 = highest resolution), matching
    the reference model contract (pixloc UNet ``scales`` attr,
    feature_extractor.py:50-58); the aligner iterates coarse -> fine.

    Fields:
      levels:       tuple of (H_l, W_l, C_l) arrays (NHWC single image).
      scales:       tuple of (sx, sy) multipliers mapping *original image*
                    pixel coords to this level's feature coords
                    (p_feat = p_img * scale).
      confidences:  optional tuple of (H_l, W_l) maps in [0, 1].
    """

    levels: Tuple[jax.Array, ...]
    scales: Tuple[Tuple[float, float], ...] = flax.struct.field(pytree_node=False)
    confidences: Optional[Tuple[jax.Array, ...]] = None

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def level_dims(self):
        return tuple(f.shape[-1] for f in self.levels)
