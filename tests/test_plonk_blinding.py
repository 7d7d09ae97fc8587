"""ZK blinding: blinded proofs verify, differ across runs, and the masked
identities stay sound (reference: zk/base/blinder.h + halo2 l_last /
l_active_row machinery)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.prover import PlonkProver, PlonkVerifier, keygen

N = 16
T = 4  # blinding factors -> usable rows = 11


@pytest.fixture(scope="module")
def setup():
    params = kzg.unsafe_setup(N, tau=0x77777)
    cs = ConstraintSystem()
    cs.blinding_factors = T
    qm = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    inst = cs.instance_column()
    for col in (a, c, inst):
        cs.enable_equality(col)
    cs.create_gate("mul", [
        ex.Product(
            ex.Fixed(qm.index),
            ex.Sum(
                ex.Product(ex.Advice(a.index), ex.Advice(b.index)),
                ex.Negated(ex.Advice(c.index)),
            ),
        )
    ])
    cs.copy((c, 3), (inst, 0))
    qm_vals = np.array([1] * 4 + [0] * (N - 4), dtype=object)
    pk = keygen(params, cs, N, [qm_vals])
    return params, cs, pk, (a, b, c, inst)


def _witness():
    a = [2, 6, 4, 5] + [0] * (N - 4)
    b = [3, 5, 7, 8] + [0] * (N - 4)
    c = [x * y for x, y in zip(a, b)]
    inst = [c[3]] + [0] * (N - 1)
    return (
        [np.array(a, dtype=object), np.array(b, dtype=object),
         np.array(c, dtype=object)],
        [np.array(inst, dtype=object)],
    )


def test_blinded_roundtrip_and_nondeterminism(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    prover = PlonkProver(params, pk)
    p1 = prover.prove([v.copy() for v in advice], instance)
    p2 = prover.prove([v.copy() for v in advice], instance)
    assert p1 != p2  # fresh blinding every proof
    verifier = PlonkVerifier(params, pk)
    assert verifier.verify(p1, instance)
    assert verifier.verify(p2, instance)


def test_blinded_bad_witness_rejected(setup):
    params, cs, pk, cols = setup
    advice, instance = _witness()
    advice[2] = advice[2].copy()
    advice[2][1] = 31  # break gate on an active row
    proof = PlonkProver(params, pk).prove(advice, instance)
    assert not PlonkVerifier(params, pk).verify(proof, instance)


def test_blinded_lookup(setup_unused=None):
    params = kzg.unsafe_setup(N, tau=0x88888)
    cs = ConstraintSystem()
    cs.blinding_factors = T
    table = cs.fixed_column()
    a = cs.advice_column()
    cs.lookup("range", [(ex.Advice(a.index), ex.Fixed(table.index))])
    table_vals = np.array(list(range(8)) + [0] * (N - 8), dtype=object)
    pk = keygen(params, cs, N, [table_vals])
    u = cs.usable_rows(N)
    adv = [np.array([3, 1, 7, 0, 5, 2, 2, 4, 0, 0, 0] + [0] * (N - u),
                    dtype=object)]
    prover = PlonkProver(params, pk)
    proof = prover.prove(adv, [])
    assert PlonkVerifier(params, pk).verify(proof, [])
    # out-of-table value on an active row is rejected at prep
    bad = [adv[0].copy()]
    bad[0][2] = 9
    with pytest.raises(ValueError):
        prover.prove(bad, [])
