"""Regression: VLOG must actually emit to stderr when verbosity > 0
(reference behavior: glog VLOG(1/2) progress + challenge logging,
tachyon/zk/plonk/halo2/prover.h:127-134)."""
import io
import sys


def test_vlog_emits_and_gates(monkeypatch):
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stderr", buf)
    from tachyon_tpu.base import log

    log.set_vlog_level(0)   # drop any pre-existing handler
    log.set_vlog_level(2)   # handler binds the patched stderr
    try:
        log.vlog(1, "challenge %s", "beta")
        assert "challenge beta" in buf.getvalue()
        log.vlog(3, "too-verbose")
        assert "too-verbose" not in buf.getvalue()
        assert log.vlog_is_on(2) and not log.vlog_is_on(3)
        log.set_vlog_level(0)
        log.vlog(1, "disabled")
        assert "disabled" not in buf.getvalue()
    finally:
        log.set_vlog_level(0)
