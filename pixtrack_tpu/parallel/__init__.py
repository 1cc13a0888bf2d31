"""Device-mesh sharding for multi-chip scale-out."""

from pixtrack_tpu.parallel.mesh import (
    make_mesh,
    shard_field_params,
    sharded_nerf_train_step,
)

__all__ = ["make_mesh", "shard_field_params", "sharded_nerf_train_step"]
