"""pixtrack-tpu: TPU-native 6-DoF object-pose tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
GiantAI/pixtrack (see SURVEY.md): feature-metric 6-DoF pose tracking against
an SfM point model with NeRF-rendered reference views, plus the offline asset
pipeline (SfM reconstruction, hash-grid NeRF training, NeRF-SfM augmentation),
YCB-Video evaluation, and visualization.

Subpackages
-----------
- ``geometry``: SE(3) poses, cameras, coordinate transforms (JAX pytrees).
- ``sfm``:      COLMAP-compatible model IO, scene containers, covisibility.
- ``features``: CNN feature-pyramid extractors (Flax UNet + handcrafted).
- ``align``:    feature-metric Levenberg-Marquardt pose alignment core.
- ``nerf``:     instant-ngp-equivalent hash-grid NeRF (train + render).
- ``tracking``: per-frame pose trackers (r9 / YCB semantics).
- ``mapping``:  asset-creation pipeline (detect/match/triangulate/augment).
- ``eval``:     ADD / ADD-S metrics and trajectory evaluation.
- ``viz``:      pose-overlay rendering.
- ``parallel``: device-mesh sharding helpers.
- ``utils``:    config system, IO iterators, misc.
"""

__version__ = "0.1.0"
