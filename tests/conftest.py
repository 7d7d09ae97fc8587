"""Test config.

* Default platform: whatever is available (TPU when present — this box has
  one CPU core, so XLA:CPU compiles of the big kernel graphs are far slower
  than the tunneled TPU path; numeric tests prefer the accelerator).
* The cpu platform always exposes 8 virtual devices so multi-chip sharding
  tests (tests/test_parallel.py) run anywhere, mirroring the driver's
  dryrun_multichip environment.
* A persistent compilation cache keeps reruns fast.
* Set TACHYON_TEST_CPU=1 to force everything onto cpu.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

from tachyon_tpu.base.cache import enable_persistent_cache

if os.environ.get("TACHYON_TEST_CPU"):
    jax.config.update("jax_platforms", "cpu")
    # cpu AOT entries embed the compile host's CPU features — caches are
    # machine-scoped so entries from another host can't poison this one
    enable_persistent_cache("cpu")
else:
    enable_persistent_cache("tpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8
    return devs
