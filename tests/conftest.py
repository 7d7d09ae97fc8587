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

# The CPU fallback host has one core and XLA:CPU AOT cache entries don't
# reliably reload (tuning features like +prefer-no-gather fail the loader's
# host-feature check), so every heavy graph recompiles every run.  Big
# kernel shapes belong on the TPU path; on the forced-CPU fallback the
# slow-marked tests are skipped unless TACHYON_RUN_SLOW=1 opts back in.
_SKIP_SLOW = (
    os.environ.get("TACHYON_TEST_CPU")
    and not os.environ.get("TACHYON_RUN_SLOW")
    and (os.cpu_count() or 1) <= 4
)


def pytest_collection_modifyitems(config, items):
    if not _SKIP_SLOW:
        return
    marker = pytest.mark.skip(
        reason="slow kernel compile; skipped on constrained CPU fallback "
        "(TACHYON_RUN_SLOW=1 overrides)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(marker)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8
    return devs
