"""Utilities: typed configuration, frame IO, profiling."""

from pixtrack_tpu.utils.config import ObjectConfig, RunConfig, load_config

__all__ = ["ObjectConfig", "RunConfig", "load_config"]
