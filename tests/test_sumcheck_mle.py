"""Sumcheck + MLE tests (reference: crypto/sumcheck, math/polynomials/
multivariate unittest patterns)."""
import numpy as np

from tachyon_tpu.crypto import sumcheck
from tachyon_tpu.fields import presets
from tachyon_tpu.math import mle
from tachyon_tpu.math.field import PrimeField


def _mk(F, rng, k):
    vals = np.array([int(rng.integers(0, F.p)) for _ in range(1 << k)],
                    dtype=object)
    return F.encode(vals), vals


def test_mle_evaluate(rng):
    F = PrimeField(presets.BABY_BEAR)
    k = 3
    table, vals = _mk(F, rng, k)
    # evaluating at a boolean point recovers the table entry
    for idx in [0, 3, 7]:
        point = [F.full((), (idx >> b) & 1) for b in range(k)]
        got = int(F.decode(mle.evaluate(F, table, point)))
        assert got == int(vals[idx])


def test_sumcheck_roundtrip(rng):
    F = PrimeField(presets.BABY_BEAR)
    k = 4
    t1, v1 = _mk(F, rng, k)
    t2, v2 = _mk(F, rng, k)

    transcript = []

    def sampler(evals):
        transcript.append(tuple(evals))
        # toy Fiat-Shamir: hash of the evals
        import hashlib

        h = hashlib.sha256(repr(evals).encode()).digest()
        return int.from_bytes(h, "little") % F.p

    proof, challenges = sumcheck.prove(F, [t1, t2], sampler)
    want = sum(int(a) * int(b) for a, b in zip(v1, v2)) % F.p
    assert proof.claimed_sum == want

    # honest final evals
    pts = [F.full((), c) for c in challenges]
    f1 = int(F.decode(mle.evaluate(F, t1, pts)))
    f2 = int(F.decode(mle.evaluate(F, t2, pts)))

    transcript2 = []

    def sampler2(evals):
        transcript2.append(tuple(evals))
        import hashlib

        h = hashlib.sha256(repr(evals).encode()).digest()
        return int.from_bytes(h, "little") % F.p

    assert sumcheck.verify(F, proof, [f1, f2], sampler2)
    assert transcript == transcript2
    # tampered sum fails
    bad = sumcheck.SumcheckProof(proof.round_evals, (proof.claimed_sum + 1) % F.p)
    assert not sumcheck.verify(F, bad, [f1, f2], sampler2)
