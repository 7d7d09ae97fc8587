"""PLONK end-to-end: keygen -> prove -> verify roundtrip on a small circuit
with a multiplication gate, copy constraints, and a public input
(reference pattern: zk/plonk/examples circuit tests)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.prover import PlonkProver, PlonkVerifier, keygen

N = 8


@pytest.fixture(scope="module")
def setup():
    params = kzg.unsafe_setup(N, tau=0xABCDE)
    cs = ConstraintSystem()
    qm = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    inst = cs.instance_column()
    for col in (a, b, c, inst):
        cs.enable_equality(col)
    # gate: qm * (a*b - c) == 0
    cs.create_gate(
        "mul",
        [
            ex.Product(
                ex.Fixed(qm.index),
                ex.Sum(
                    ex.Product(ex.Advice(a.index), ex.Advice(b.index)),
                    ex.Negated(ex.Advice(c.index)),
                ),
            )
        ],
    )
    # copies: c[0] == a[1]; c[3] == instance[0]
    cs.copy((c, 0), (a, 1))
    cs.copy((c, 3), (inst, 0))

    qm_vals = np.array([1, 1, 1, 1, 0, 0, 0, 0], dtype=object)
    pk = keygen(params, cs, N, [qm_vals])
    return params, cs, pk, (a, b, c, inst)


def _witness():
    a = [2, 6, 4, 5, 0, 0, 0, 0]
    b = [3, 5, 7, 8, 0, 0, 0, 0]
    c = [x * y for x, y in zip(a, b)]
    c[0] = 6  # a[0]*b[0] = 6; also copied to a[1] = 6 OK
    inst = [c[3], 0, 0, 0, 0, 0, 0, 0]
    return (
        [np.array(a, dtype=object), np.array(b, dtype=object),
         np.array(c, dtype=object)],
        [np.array(inst, dtype=object)],
    )


def test_plonk_roundtrip(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    prover = PlonkProver(params, pk)
    proof = prover.prove(advice, instance)
    assert len(proof) > 0
    verifier = PlonkVerifier(params, pk)
    assert verifier.verify(proof, instance)
    # wrong public input fails
    bad_inst = [np.array([99] + [0] * 7, dtype=object)]
    assert not verifier.verify(proof, bad_inst)


def test_plonk_bad_witness_rejected(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    advice[2] = np.array([7, 30, 28, 41, 0, 0, 0, 0], dtype=object)  # break gate
    prover = PlonkProver(params, pk)
    proof = prover.prove(advice, instance)
    verifier = PlonkVerifier(params, pk)
    assert not verifier.verify(proof, instance)


def test_plonk_broken_copy_rejected(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    # violate c[0] == a[1]
    a = list(advice[0])
    a[1] = 7
    b = list(advice[1])
    c = list(advice[2])
    c[1] = 7 * int(b[1])
    advice = [np.array(a, dtype=object), np.array(b, dtype=object),
              np.array(c, dtype=object)]
    prover = PlonkProver(params, pk)
    proof = prover.prove(advice, instance)
    verifier = PlonkVerifier(params, pk)
    assert not verifier.verify(proof, instance)


def test_plonk_gwc_roundtrip(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    proof = PlonkProver(params, pk, pcs="gwc").prove(advice, instance)
    assert PlonkVerifier(params, pk, pcs="gwc").verify(proof, instance)
    # shplonk verifier must reject a gwc proof (different multiopen protocol)
    assert not PlonkVerifier(params, pk, pcs="shplonk").verify(proof, instance)
