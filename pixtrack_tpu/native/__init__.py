"""Native (C++) runtime components with ctypes bindings.

Built on demand with g++ (no pybind11 in this environment); every consumer
falls back to the pure-Python implementation when the shared library is
unavailable.
"""

from pixtrack_tpu.native.binding import (
    ensure_built,
    fast_read_images_bin,
    fast_read_points3D_bin,
    native_available,
)

__all__ = [
    "ensure_built",
    "native_available",
    "fast_read_points3D_bin",
    "fast_read_images_bin",
]
