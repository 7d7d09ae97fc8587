"""TwoAdicFRI PCS tests.

Mirrors the reference's two_adic_fri_unittest.cc TestProtocol: commit
rounds of random matrices, observe the commitments, sample zeta, open
everything at zeta, then verify with a fresh challenger (asserting the
verifier re-derives the same zeta), plus tamper-rejection cases the
reference covers via proof-byte checks.
"""
import numpy as np
import pytest

from tachyon_tpu.crypto import poseidon2
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
from tachyon_tpu.fields import presets, extensions
from tachyon_tpu.math.field import PrimeField


@pytest.fixture(scope="module")
def pcs():
    F = PrimeField(presets.BABY_BEAR)
    return TwoAdicFRIPCS(
        F,
        extensions.baby_bear4(),
        poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=1, num_queries=3, proof_of_work_bits=2),
    )


def _mats(F, rng, shapes):
    out = []
    for (n, c) in shapes:
        vals = np.array(
            [[rng.integers(0, F.p) for _ in range(c)] for _ in range(n)],
            dtype=object,
        )
        out.append(F.encode(vals))
    return out


def _challenger():
    # SP1 convention: width-16 Poseidon2, duplex rate 8
    # (reference: c/zk/air/sp1/baby_bear_poseidon2_constants.h RATE=8).
    return DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=8)


def _observe_commit(pcs, ch, root):
    root = np.asarray(root)
    for i in range(root.shape[1]):
        ch.observe(int(pcs.F.decode(root[:, i])))


def _run_protocol(pcs, rng, log_degrees_by_round, cols=3):
    """reference: two_adic_fri_unittest.cc TestProtocol."""
    F = pcs.F
    datas = []
    for log_degrees in log_degrees_by_round:
        mats = _mats(F, rng, [(1 << ld, cols) for ld in log_degrees])
        datas.append(pcs.commit(mats))

    p_ch = _challenger()
    for d in datas:
        _observe_commit(pcs, p_ch, d.root())
    zeta = p_ch.sample_ext(pcs.ext.D)
    points = [
        [[zeta]] * len(lds) for lds in log_degrees_by_round
    ]
    opened_values, proof = pcs.create_opening_proof(datas, points, p_ch)
    assert len(opened_values) == len(datas)

    v_ch = _challenger()
    for d in datas:
        _observe_commit(pcs, v_ch, d.root())
    v_zeta = v_ch.sample_ext(pcs.ext.D)
    assert v_zeta == zeta
    dims = [
        [(1 << ld, cols) for ld in lds] for lds in log_degrees_by_round
    ]
    roots = [d.root() for d in datas]
    assert pcs.verify_opening_proof(
        roots, dims, points, opened_values, proof, v_ch
    )
    return roots, dims, points, opened_values, proof


def test_fri_single(pcs, rng):
    _run_protocol(pcs, rng, [[3]])


@pytest.mark.slow
def test_fri_many_equal(pcs, rng):
    _run_protocol(pcs, rng, [[2] * 3])


@pytest.mark.slow
def test_fri_many_different(pcs, rng):
    _run_protocol(pcs, rng, [[3, 4]])


@pytest.mark.slow
def test_fri_many_different_rev(pcs, rng):
    _run_protocol(pcs, rng, [[4, 3]])


@pytest.mark.slow
def test_fri_multiple_rounds(pcs, rng):
    _run_protocol(pcs, rng, [[3], [2]])
    _run_protocol(pcs, rng, [[2, 3], [3]])


@pytest.mark.slow
def test_fri_multi_point(pcs, rng):
    """Trace-style opening: one matrix opened at (zeta, zeta'), another
    round at (zeta) only — the uni-STARK shape."""
    F = pcs.F
    d1 = pcs.commit(_mats(F, rng, [(16, 2)]))
    d2 = pcs.commit(_mats(F, rng, [(8, 1)]))
    ch = _challenger()
    _observe_commit(pcs, ch, d1.root())
    _observe_commit(pcs, ch, d2.root())
    z1 = ch.sample_ext(pcs.ext.D)
    z2 = [(c + 1) % F.p for c in z1]
    points = [[[z1, z2]], [[z1]]]
    ov, proof = pcs.create_opening_proof([d1, d2], points, ch)

    def fresh():
        v = _challenger()
        _observe_commit(pcs, v, d1.root())
        _observe_commit(pcs, v, d2.root())
        v.sample_ext(pcs.ext.D)
        return v

    dims = [[(16, 2)], [(8, 1)]]
    roots = [d1.root(), d2.root()]
    assert pcs.verify_opening_proof(roots, dims, points, ov, proof, fresh())
    # swapped points must fail
    bad_points = [[[z2, z1]], [[z1]]]
    assert not pcs.verify_opening_proof(
        roots, dims, bad_points, ov, proof, fresh()
    )


@pytest.mark.slow
def test_fri_tamper_rejection(pcs, rng):
    roots, dims, points, ov, proof = _run_protocol(pcs, rng, [[3, 2]])

    def fresh():
        v = _challenger()
        for r in roots:
            _observe_commit(pcs, v, r)
        v.sample_ext(pcs.ext.D)
        return v

    # tampered opened value
    bad_ov0 = pcs.ext.add(ov[0][0][0], pcs.ext.ones(ov[0][0][0].shape[2:]))
    bad_ov = ((
        (bad_ov0,),
        ov[0][1],
    ),)
    assert not pcs.verify_opening_proof(
        roots, dims, points, bad_ov, proof, fresh()
    )
    # tampered final eval
    bad = proof._replace(
        final_eval=pcs.ext.add(proof.final_eval, pcs.ext.ones(()))
    )
    assert not pcs.verify_opening_proof(roots, dims, points, ov, bad, fresh())
    # tampered pow witness
    bad = proof._replace(pow_witness=(proof.pow_witness + 1) % pcs.F.p)
    assert not pcs.verify_opening_proof(roots, dims, points, ov, bad, fresh())


def test_fri_get_evaluations_on_domain(pcs, rng):
    """reference: vendors/sp1 get_evaluations_on_domain — the natural-order
    evals on g*H_size recovered from the committed bitrev LDE."""
    from tachyon_tpu.math.ntt import Radix2Domain

    F = pcs.F
    n, c = 8, 2
    mats = _mats(F, rng, [(n, c)])
    data = pcs.commit(mats)
    got = np.asarray(pcs.get_evaluations_on_domain(data, 0, n))
    dom = Radix2Domain(F, n)
    want = np.asarray(dom.coset_fft(dom.ifft(mats[0]), F.spec.generator))
    assert (got == want).all()


def test_fri_opened_values_are_poly_evals(pcs, rng):
    """The claimed opened values must equal exact polynomial evaluation
    (host-int Horner over the interpolant coefficients)."""
    from tachyon_tpu.math.extfield import HostExt
    from tachyon_tpu.math.ntt import Radix2Domain

    F = pcs.F
    hx = HostExt(pcs.ext)
    n, c = 8, 2
    mats = _mats(F, rng, [(n, c)])
    data = pcs.commit(mats)
    ch = _challenger()
    _observe_commit(pcs, ch, data.root())
    zeta = ch.sample_ext(pcs.ext.D)
    ov, _proof = pcs.create_opening_proof([data], [[[zeta]]], ch)

    dom = Radix2Domain(F, n)
    cf = np.asarray(dom.ifft(mats[0]))
    got = np.asarray(ov[0][0][0])
    for col in range(c):
        coeffs = [int(F.decode(cf[:, j, col])) for j in range(n)]
        acc = hx.e(0)
        for coef in reversed(coeffs):
            acc = hx.add(hx.mul(acc, zeta), coef)
        assert [int(F.decode(got[d, :, col])) for d in range(pcs.ext.D)] == acc
