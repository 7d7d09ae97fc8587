"""Shared benchmark harness (analog of the reference's benchmark/ layer:
*_config.cc flag parsing + *_runner.h timing + simple_reporter.cc tables;
reference: benchmark/msm/msm_benchmark.cc etc.).

Every benchmark times a jitted callable after one warmup/compile run and
prints one JSON line per (kernel, size):
  {"metric": ..., "value": best_seconds, "unit": "s", "vs_baseline": x}
"""
from __future__ import annotations

import json
import sys
import time


def setup_jax():
    import jax

    from tachyon_tpu.base.cache import enable_persistent_cache

    tag = "cpu_bench" if jax.config.jax_platforms == "cpu" else "tpu"
    enable_persistent_cache(tag)
    return jax


def _sync(out):
    """block_until_ready can return before completion under the axon TPU
    tunnel; fetching (part of) one output leaf to host is the reliable
    barrier — PJRT literal transfer waits for the producing computation."""
    import numpy as np
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])


def time_fn(fn, *args, iters: int = 3):
    """(compile_seconds, best_run_seconds)"""
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return compile_s, best


def report(metric: str, seconds: float, baseline: float | None,
           compile_s: float | None = None):
    print(json.dumps({
        "metric": metric,
        "value": seconds,
        "unit": "s",
        "vs_baseline": (baseline / seconds) if baseline else None,
    }))
    if compile_s is not None:
        print(f"# {metric}: compile={compile_s:.1f}s", file=sys.stderr)
