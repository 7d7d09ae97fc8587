"""PLONK lookup / shuffle arguments: roundtrips + soundness rejections
(reference pattern: zk/lookup/halo2/*_unittest, zk/shuffle/*_unittest)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk import lookup as lk_mod
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.prover import PlonkProver, PlonkVerifier, keygen

N = 8


def _lookup_setup(lookup_type):
    params = kzg.unsafe_setup(N, tau=0x11111)
    cs = ConstraintSystem()
    cs.lookup_type = lookup_type
    table = cs.fixed_column()
    a = cs.advice_column()
    # every value of column a must appear in the fixed table column
    cs.lookup("range", [(ex.Advice(a.index), ex.Fixed(table.index))])
    table_vals = np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=object)
    pk = keygen(params, cs, N, [table_vals])
    return params, cs, pk


@pytest.mark.parametrize("lookup_type", ["halo2", "log_derivative"])
def test_lookup_roundtrip(lookup_type):
    params, cs, pk = _lookup_setup(lookup_type)
    advice = [np.array([3, 3, 7, 0, 1, 1, 1, 5], dtype=object)]
    proof = PlonkProver(params, pk).prove(advice, [])
    assert PlonkVerifier(params, pk).verify(proof, [])


@pytest.mark.parametrize("lookup_type", ["halo2", "log_derivative"])
def test_lookup_out_of_table_rejected(lookup_type):
    params, cs, pk = _lookup_setup(lookup_type)
    # 9 is not in the table: honest prover refuses (host prep raises)
    advice = [np.array([3, 9, 7, 0, 1, 1, 1, 5], dtype=object)]
    with pytest.raises(ValueError):
        PlonkProver(params, pk).prove(advice, [])


def test_lookup_forged_proof_rejected():
    """a cheating prover that forces the permuted columns through anyway
    (sticks an out-of-table value into S') must fail verification."""
    params, cs, pk = _lookup_setup("halo2")
    advice = [np.array([3, 9, 7, 0, 1, 1, 1, 5], dtype=object)]
    orig = lk_mod.permute_pair

    def forged(a_ints, s_ints):
        a_sorted = np.array(sorted(int(v) for v in a_ints), dtype=object)
        return a_sorted, a_sorted.copy()  # pretend S' == A'

    lk_mod.permute_pair = forged
    try:
        proof = PlonkProver(params, pk).prove(advice, [])
    finally:
        lk_mod.permute_pair = orig
    assert not PlonkVerifier(params, pk).verify(proof, [])


def test_multi_expression_lookup():
    """two-column lookup compressed with theta: (a, b) in (t0, t1)."""
    params = kzg.unsafe_setup(N, tau=0x22222)
    cs = ConstraintSystem()
    t0 = cs.fixed_column()
    t1 = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    cs.lookup("pair", [
        (ex.Advice(a.index), ex.Fixed(t0.index)),
        (ex.Advice(b.index), ex.Fixed(t1.index)),
    ])
    t0_vals = np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=object)
    t1_vals = np.array([0, 1, 4, 9, 16, 25, 36, 49], dtype=object)  # squares
    pk = keygen(params, cs, N, [t0_vals, t1_vals])
    adv = [np.array([2, 5, 2, 0, 7, 1, 1, 3], dtype=object)]
    adv.append(np.array([int(v) ** 2 for v in adv[0]], dtype=object))
    proof = PlonkProver(params, pk).prove(adv, [])
    assert PlonkVerifier(params, pk).verify(proof, [])
    # breaking the pairing must be caught at prep time
    bad = [adv[0], np.array([4, 25, 4, 0, 49, 1, 2, 9], dtype=object)]
    with pytest.raises(ValueError):
        PlonkProver(params, pk).prove(bad, [])


def test_shuffle_roundtrip():
    params = kzg.unsafe_setup(N, tau=0x33333)
    cs = ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column()
    cs.shuffle("perm", [(ex.Advice(a.index), ex.Advice(b.index))])
    pk = keygen(params, cs, N, [])
    a_vals = np.array([5, 1, 9, 2, 2, 8, 0, 4], dtype=object)
    b_vals = np.array([9, 2, 5, 8, 1, 0, 4, 2], dtype=object)  # shuffled a
    proof = PlonkProver(params, pk).prove([a_vals, b_vals], [])
    assert PlonkVerifier(params, pk).verify(proof, [])
    # not a permutation -> proof exists but must not verify
    b_bad = np.array([9, 2, 5, 8, 1, 0, 4, 3], dtype=object)
    proof2 = PlonkProver(params, pk).prove([a_vals, b_bad], [])
    assert not PlonkVerifier(params, pk).verify(proof2, [])


def test_permute_pair_unit():
    a = [3, 1, 3, 2]
    s = [1, 2, 3, 4]
    ap, sp = lk_mod.permute_pair(a, s)
    assert list(ap) == [1, 2, 3, 3]
    # each first occurrence matched in place
    for i in range(len(ap)):
        if i == 0 or ap[i] != ap[i - 1]:
            assert sp[i] == ap[i]
    assert sorted(sp) == sorted(s)


def test_multiplicities_unit():
    m = lk_mod.multiplicities([3, 1, 3, 2], [1, 2, 3, 4])
    assert list(m) == [1, 1, 2, 0]
    m2 = lk_mod.multiplicities([5, 5], [5, 5, 1, 2])  # dup table values
    assert list(m2) == [2, 0, 0, 0]
