"""Sparse polynomial forms vs exact host-int oracles
(reference: univariate_sparse_polynomial_unittest.cc,
multivariate_polynomial_unittest.cc, linear_combination_unittest.cc)."""
import numpy as np
import pytest

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.sparse import (
    LinearCombination, SparseMultivariate, SparseUnivariate,
)

F = PrimeField(presets.BABY_BEAR)
P = F.p


def enc1(v):
    return F.encode(np.array([v % P], dtype=object))[:, 0]


def dec1(a):
    return int(np.asarray(F.decode(a.reshape(F.L, -1)))[0])


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_sparse_uni_evaluate(rng):
    terms = {0: 5, 3: 17, 1000: 923, (1 << 40) + 3: 12345}
    sp = SparseUnivariate.from_dict(F, terms)
    z = int(rng.integers(2, P))
    expected = sum(c * pow(z, d, P) for d, c in terms.items()) % P
    assert dec1(sp.evaluate(enc1(z))) == expected


def test_sparse_uni_add_sub_mul(rng):
    ta = {0: 3, 2: 7, 9: 11}
    tb = {2: P - 7, 5: 1, 9: 4}
    a = SparseUnivariate.from_dict(F, ta)
    b = SparseUnivariate.from_dict(F, tb)
    s = (a + b).to_dict()
    assert s == {0: 3, 5: 1, 9: 15}  # degree-2 terms cancel
    d = (a - b).to_dict()
    assert d == {0: 3, 2: 14, 5: P - 1, 9: 7}
    m = (a * b).to_dict()
    oracle = {}
    for da, ca in ta.items():
        for db, cb in tb.items():
            oracle[da + db] = (oracle.get(da + db, 0) + ca * cb) % P
    assert m == {k: v for k, v in oracle.items() if v}


def test_sparse_uni_to_dense(rng):
    terms = {1: 2, 4: 9}
    sp = SparseUnivariate.from_dict(F, terms)
    dense = np.asarray(F.decode(sp.to_dense(6)))
    assert [int(v) for v in dense] == [0, 2, 0, 0, 9, 0]


def test_sparse_multivariate_evaluate(rng):
    # 3 + 5*x0^2*x2 + 7*x1^3
    sp = SparseMultivariate.from_terms(
        F, [(3, {}), (5, {0: 2, 2: 1}), (7, {1: 3})])
    xs = [int(v) for v in rng.integers(1, P, 3)]
    expected = (3 + 5 * pow(xs[0], 2, P) * xs[2] + 7 * pow(xs[1], 3, P)) % P
    got = sp.evaluate([enc1(x) for x in xs])
    assert dec1(got) == expected


def test_linear_combination_combine_and_evaluate(rng):
    nv = 4
    n = 1 << nv
    t0 = [int(v) for v in rng.integers(0, P, n)]
    t1 = [int(v) for v in rng.integers(0, P, n)]
    lc = LinearCombination(F, nv)
    i0 = lc.add_mle(F.encode(np.array(t0, dtype=object)))
    i1 = lc.add_mle(F.encode(np.array(t1, dtype=object)))
    lc.add_term(2, [i0, i1])
    lc.add_term(9, [i1])
    # combine: sum over hypercube
    expected = sum((2 * a * b + 9 * b) % P for a, b in zip(t0, t1)) % P
    assert dec1(lc.combine()) == expected
    # evaluate at a random point == evaluating each dense MLE there
    pt_ints = [int(v) for v in rng.integers(0, P, nv)]

    def mle_eval(tbl, pt):
        cur = list(tbl)
        for r in pt:
            cur = [(lo + r * (hi - lo)) % P
                   for lo, hi in zip(cur[0::2], cur[1::2])]
        return cur[0]

    e0, e1 = mle_eval(t0, pt_ints), mle_eval(t1, pt_ints)
    expected_pt = (2 * e0 * e1 + 9 * e1) % P
    got = lc.evaluate([enc1(x) for x in pt_ints])
    assert dec1(got) == expected_pt
