"""Instant-ngp-equivalent NeRF: hash-grid field, volume rendering, training,
snapshotting, and a Testbed-shaped facade for the tracker."""

from pixtrack_tpu.nerf.field import NGPField, init_field
from pixtrack_tpu.nerf.render import RenderConfig, render_rays, render_image
from pixtrack_tpu.nerf.testbed import Testbed, RenderMode, initialize_testbed

__all__ = [
    "NGPField",
    "init_field",
    "RenderConfig",
    "render_rays",
    "render_image",
    "Testbed",
    "RenderMode",
    "initialize_testbed",
]
