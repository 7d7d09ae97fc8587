"""Machine-scoped XLA persistent-compilation-cache directories.

XLA:CPU AOT cache entries embed the *compile-time* CPU feature set
(+avx512…, +prefer-no-gather); loading an entry produced on a different
machine fails ("Machine type used for XLA:CPU compilation doesn't match…")
or, worse, deserializes into code that segfaults.  Round 4's multichip
dryrun regression was exactly this: `.jax_cache_cpu` written on the
bench host poisoned the driver host.

Fix: key every cache directory on a fingerprint of the executing machine
(CPU flags + core count), so hosts with different feature sets never share
AOT artifacts.  This mirrors the reference's per-toolchain bazel output
trees (reference: .bazelrc config split per machine config).
"""
from __future__ import annotations

import hashlib
import os


def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set + core count."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    ncpu = os.cpu_count() or 0
    return hashlib.sha256(f"{feats}|{ncpu}".encode()).hexdigest()[:12]


def cache_dir(tag: str, root: str = "/root/repo") -> str:
    """Per-(tag, machine) persistent cache dir, e.g. tag='cpu'/'tpu'.

    Only CPU caches are machine-scoped: the poisoning is specific to
    XLA:CPU AOT results (which embed host CPU features).  TPU executables
    are compiled for the chip, not the host, so the 'tpu' tag keeps the
    historical shared dir and its warm entries.
    """
    if tag == "tpu":
        return os.path.join(root, ".jax_cache")
    return os.path.join(root, f".jax_cache_{tag}_{machine_fingerprint()}")


def enable_persistent_cache(tag: str, root: str = "/root/repo") -> str:
    """Point jax's persistent compilation cache at the machine-scoped dir."""
    import jax

    d = cache_dir(tag, root)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
