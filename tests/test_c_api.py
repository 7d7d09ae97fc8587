"""C ABI smoke test: builds libtachyon_tpu_c.so + the pure-C driver and
runs it (reference pattern: tachyon/c/ unittests exercising the extern-C
surface from outside the core).

The C binary embeds its own Python+JAX runtime, so it runs as a
subprocess on the CPU platform (the accelerator stays free for the main
test process).
"""
import os
import subprocess

import pytest

C_DIR = os.path.join(os.path.dirname(__file__), "..", "tachyon_tpu", "c")


@pytest.mark.slow
def test_c_api_end_to_end():
    r = subprocess.run(["make", "-C", C_DIR], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(C_DIR, "..", ".."))
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("TACHYON_TEST_CPU", None)
    r = subprocess.run(
        [os.path.join(C_DIR, "test_capi")],
        capture_output=True, text=True, env=env, timeout=2400,
    )
    assert r.returncode == 0, f"stdout={r.stdout} stderr={r.stderr}"
    assert "OK" in r.stdout
