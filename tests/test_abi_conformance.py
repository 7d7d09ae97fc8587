"""Executable ABI conformance for the Rust and Node bindings.

The image has no rustc/node-gyp, so the binding CODE can't run — instead
this test extracts every `tachyon_tpu_*` symbol the rs crate
(rs/src/lib.rs) and Node addon (node/src/addon.c) declare and drives
libtachyon_tpu_c.so through those exact byte layouts with ctypes
(tests/abi_driver.py), run as a subprocess because the library embeds its
own CPython+JAX runtime (reference pattern: tachyon/c unittests exercising
the extern-C surface from outside the core)."""
import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
C_DIR = os.path.join(ROOT, "tachyon_tpu", "c")


def declared_symbols():
    rs = open(os.path.join(ROOT, "tachyon_tpu", "rs", "src", "lib.rs")).read()
    node = open(os.path.join(ROOT, "tachyon_tpu", "node", "src", "addon.c")).read()
    syms = set(re.findall(r"\b(tachyon_tpu_[a-z0-9_]+)\s*\(", rs))
    syms |= set(re.findall(r"\b(tachyon_tpu_[a-z0-9_]+)\s*\(", node))
    return sorted(syms)


def test_bindings_declare_expected_surface():
    syms = declared_symbols()
    # both bindings must cover the full data-path surface of c/api.h
    api = open(os.path.join(C_DIR, "api.h")).read()
    exported = set(re.findall(r"\b(tachyon_tpu_[a-z0-9_]+)\s*\(", api))
    assert set(syms) <= exported, set(syms) - exported
    for required in ("tachyon_tpu_bn254_g1_msm", "tachyon_tpu_bn254_fft",
                     "tachyon_tpu_bn254_groth16_prove",
                     "tachyon_tpu_halo2_bn254_prove"):
        assert required in syms


@pytest.mark.slow
def test_abi_drive_shared_library():
    r = subprocess.run(["make", "-C", C_DIR], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("TACHYON_TEST_CPU", None)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tests", "abi_driver.py"),
         os.path.join(C_DIR, "libtachyon_tpu_c.so")] + declared_symbols(),
        capture_output=True, text=True, env=env, timeout=2400,
    )
    assert r.returncode == 0, f"stdout={r.stdout} stderr={r.stderr}"
    assert "ABI_OK" in r.stdout
