"""Tracing/profiling hooks (analog of the reference's Perfetto profiler).

The reference wires Perfetto track events through every hot path with a
fixed category taxonomy (reference: tachyon/base/profiler.h:12-52 —
categories Utils / Subtask / MSM / ProofGeneration / ProofVerification /
EvaluationDomain; TRACE_EVENT macros e.g. pippenger.h:82,
zk/plonk/halo2/prover.h:71).  The TPU-native equivalent is the JAX
profiler: `Profiler` wraps jax.profiler trace start/stop (output loadable
in TensorBoard/XProf/Perfetto), and `trace_event(category, name)` is a
combined host-span + device-annotation context manager
(jax.profiler.TraceAnnotation names XLA ops launched inside the scope).

Tracing is zero-cost when no Profiler is active: the context managers
short-circuit on a module flag.
"""
from __future__ import annotations

import contextlib
import time

# category taxonomy mirrored from the reference (profiler.h:12-23)
CATEGORY_UTILS = "Utils"
CATEGORY_SUBTASK = "Subtask"
CATEGORY_MSM = "MSM"
CATEGORY_NTT = "EvaluationDomain"
CATEGORY_PROOF_GENERATION = "ProofGeneration"
CATEGORY_PROOF_VERIFICATION = "ProofVerification"

_active = False
_events: list[tuple[str, str, float, float]] = []


class Profiler:
    """Starts a jax.profiler trace; writes to `trace_dir`
    (reference: base/profiler.h Profiler writing /tmp/tachyon.perfetto-trace;
    CLI flag --trace_path in vendors/circom/prover_main.cc:211)."""

    def __init__(self, trace_dir: str = "/tmp/tachyon_tpu_trace"):
        self.trace_dir = trace_dir
        self._started = False

    def start(self):
        global _active
        import jax

        jax.profiler.start_trace(self.trace_dir)
        self._started = True
        _active = True

    def stop(self):
        global _active
        if self._started:
            import jax

            jax.profiler.stop_trace()
            self._started = False
        _active = False

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False


@contextlib.contextmanager
def trace_event(category: str, name: str):
    """Host span + device annotation, recorded only while a Profiler (or
    collect_events) is active."""
    if not _active:
        yield
        return
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(f"{category}/{name}"):
        yield
    _events.append((category, name, t0, time.perf_counter()))


@contextlib.contextmanager
def collect_events():
    """Lightweight host-side event collection without a jax trace (used by
    tests and the CLI's --trace_path-less timing summary).  Yields the list
    that accumulates (category, name, t_start, t_end) tuples."""
    global _active
    prev = _active
    _active = True
    _events.clear()
    try:
        yield _events
    finally:
        _active = prev
