"""Selector compression: disjoint selectors share one fixed column and the
rewritten circuit still proves/verifies (reference:
zk/plonk/constraint_system/selector_compressor.h)."""
import numpy as np

from tachyon_tpu.crypto import kzg
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.prover import PlonkProver, PlonkVerifier, keygen
from tachyon_tpu.zk.plonk.selector import compress_selectors

N = 8
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def test_selector_compression_roundtrip():
    cs = ConstraintSystem()
    q_add = cs.fixed_column()  # selector: rows 0-1
    q_mul = cs.fixed_column()  # selector: rows 2-3 (disjoint)
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    cs.create_gate("add", [
        ex.Product(ex.Fixed(q_add.index),
                   ex.Sum(ex.Sum(ex.Advice(a.index), ex.Advice(b.index)),
                          ex.Negated(ex.Advice(c.index)))),
    ])
    cs.create_gate("mul", [
        ex.Product(ex.Fixed(q_mul.index),
                   ex.Sum(ex.Product(ex.Advice(a.index), ex.Advice(b.index)),
                          ex.Negated(ex.Advice(c.index)))),
    ])
    q_add_vals = np.array([1, 1, 0, 0, 0, 0, 0, 0], dtype=object)
    q_mul_vals = np.array([0, 0, 1, 1, 0, 0, 0, 0], dtype=object)
    fixed = compress_selectors(
        cs, [q_add.index, q_mul.index], [q_add_vals, q_mul_vals], P
    )
    # two selectors fused into ONE combination column
    assert cs.num_fixed == 1
    assert list(fixed[0]) == [1, 1, 2, 2, 0, 0, 0, 0]

    params = kzg.unsafe_setup(N, tau=0x99999)
    pk = keygen(params, cs, N, fixed)
    av = [4, 9, 3, 7, 0, 0, 0, 0]
    bv = [5, 2, 6, 8, 0, 0, 0, 0]
    cv = [9, 11, 18, 56, 0, 0, 0, 0]  # add rows then mul rows
    advice = [np.array(av, dtype=object), np.array(bv, dtype=object),
              np.array(cv, dtype=object)]
    proof = PlonkProver(params, pk).prove(advice, [])
    assert PlonkVerifier(params, pk).verify(proof, [])
    # violating the mul gate on row 3 must fail
    bad = [advice[0], advice[1], advice[2].copy()]
    bad[2][3] = 57
    proof2 = PlonkProver(params, pk).prove(bad, [])
    assert not PlonkVerifier(params, pk).verify(proof2, [])


def test_overlapping_selectors_not_fused():
    cs = ConstraintSystem()
    q1 = cs.fixed_column()
    q2 = cs.fixed_column()
    cs.create_gate("g1", [ex.Fixed(q1.index)])
    cs.create_gate("g2", [ex.Fixed(q2.index)])
    v1 = np.array([1, 1, 0, 0], dtype=object)
    v2 = np.array([0, 1, 1, 0], dtype=object)  # overlaps at row 1
    fixed = compress_selectors(cs, [0, 1], [v1, v2], P)
    assert cs.num_fixed == 2  # cannot share
