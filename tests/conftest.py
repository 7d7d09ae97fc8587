"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (mirrors the driver's dryrun_multichip environment).

Note: JAX_PLATFORMS env alone is ignored when the axon TPU plugin is
present, so we force the platform via jax.config before anything else
touches jax. A persistent compilation cache keeps reruns fast.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
