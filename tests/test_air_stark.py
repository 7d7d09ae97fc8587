"""Uni-STARK over TwoAdicFRI: fibonacci AIR roundtrip + rejections
(reference pattern: the SP1 baby_bear_poseidon2 uni-stark path,
c/zk/air/sp1/*)."""
import numpy as np
import pytest

# the prove/verify graphs (FRI fold scans + Poseidon2 merkle layers) cost
# ~30 min of XLA:CPU compile on a 1-core host; exercised on the TPU path
pytestmark = pytest.mark.slow

from tachyon_tpu.crypto import poseidon2
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
from tachyon_tpu.fields import presets, extensions
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.zk.air import expressions as ax
from tachyon_tpu.zk.air.stark import UniStark


def _challenger():
    return DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=4)


@pytest.fixture(scope="module")
def stark():
    F = PrimeField(presets.BABY_BEAR)
    pcs = TwoAdicFRIPCS(
        F,
        extensions.baby_bear4(),
        poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=1, num_queries=4, proof_of_work_bits=2),
    )
    air = ax.AirBuilder(width=2, num_public=3)
    a, b = air.local(0), air.local(1)
    an, bn = air.next(0), air.next(1)
    air.assert_zero_first(ax.Sum(a, ax.Negated(ax.Pub(0))))
    air.assert_zero_first(ax.Sum(b, ax.Negated(ax.Pub(1))))
    air.assert_zero_transition(ax.Sum(an, ax.Negated(b)))
    air.assert_zero_transition(ax.Sum(bn, ax.Negated(ax.Sum(a, b))))
    air.assert_zero_last(ax.Sum(b, ax.Negated(ax.Pub(2))))
    return UniStark(pcs, air)


def _fib_trace(n):
    rows = []
    a, b = 0, 1
    for _ in range(n):
        rows.append((a, b))
        a, b = b, a + b
    return np.array(rows, dtype=object), [0, 1, rows[-1][1]]


def test_stark_fibonacci_roundtrip(stark):
    trace, pubs = _fib_trace(8)
    proof = stark.prove(trace, pubs, _challenger())
    assert stark.verify(proof, pubs, _challenger())


def test_stark_wrong_public_rejected(stark):
    trace, pubs = _fib_trace(8)
    proof = stark.prove(trace, pubs, _challenger())
    bad = list(pubs)
    bad[2] = 999
    assert not stark.verify(proof, bad, _challenger())


def test_stark_bad_trace_rejected(stark):
    trace, pubs = _fib_trace(8)
    trace[4] = (trace[4][0], int(trace[4][1]) + 1)  # break transition
    proof = stark.prove(trace, pubs, _challenger())
    assert not stark.verify(proof, pubs, _challenger())
