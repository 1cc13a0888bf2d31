"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware (one chip) is reserved for bench.py; unit tests exercise
sharding logic on a forced multi-device CPU platform so multi-chip code paths
compile and execute without real chips.

Note: a site hook registers the TPU PJRT plugin in every interpreter and wins
over the JAX_PLATFORMS env var, so we must override through jax.config after
import (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE on the persistent compile cache: enabling
# jax_compilation_cache_dir cut repeat runs ~36% (test_align 53s -> 34s)
# but XLA:CPU AOT reload spams machine-feature-mismatch errors
# ("+prefer-no-scatter ... could lead to SIGILL") on this host, so it is
# NOT enabled; set JAX_COMPILATION_CACHE_DIR manually for local loops.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
