"""glog-style logging/check helpers (reference: tachyon/base/logging.h —
LOG/VLOG/CHECK/CHECK_EQ over glog).

Python's stdlib logger carries the stream; this module adds the two glog
idioms the reference leans on: numbered verbosity (VLOG(1/2) progress and
challenge logging, e.g. zk/plonk/halo2/prover.h:127-134) and CHECK-family
fatal assertions that always fire (unlike `assert` under -O).

Verbosity comes from TACHYON_VLOG (int, default 0) or set_vlog_level().
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("tachyon_tpu")

_vlog_level = int(os.environ.get("TACHYON_VLOG", "0"))


def set_vlog_level(level: int) -> None:
    global _vlog_level
    _vlog_level = int(level)


def vlog_is_on(level: int) -> bool:
    return _vlog_level >= level


def vlog(level: int, msg: str, *args) -> None:
    """VLOG(level) — INFO-stream message gated on the verbosity knob."""
    if _vlog_level >= level:
        logger.info(msg, *args)


class CheckError(AssertionError):
    pass


def check(cond, msg: str = "CHECK failed") -> None:
    if not cond:
        raise CheckError(msg)


def check_eq(a, b, msg: str = "") -> None:
    if a != b:
        raise CheckError(f"CHECK_EQ failed: {a!r} != {b!r} {msg}".rstrip())


def check_ne(a, b, msg: str = "") -> None:
    if a == b:
        raise CheckError(f"CHECK_NE failed: {a!r} == {b!r} {msg}".rstrip())


def check_le(a, b, msg: str = "") -> None:
    if not (a <= b):
        raise CheckError(f"CHECK_LE failed: {a!r} > {b!r} {msg}".rstrip())


def check_lt(a, b, msg: str = "") -> None:
    if not (a < b):
        raise CheckError(f"CHECK_LT failed: {a!r} >= {b!r} {msg}".rstrip())
