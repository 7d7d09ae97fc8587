"""Golden-value tests: the halo2-compatible pipeline vs the reference's
pinned vectors (reference: zk/plonk/examples/*_test_data.h,
circuit_test.h — Configure/Synthesize/LoadVerifyingKey/LoadProvingKey/
CreateProof/VerifyProof), for each example circuit x floor planner.

Everything here is host-exact (python ints) — no device needed; skips when
the read-only reference checkout is absent.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

import halo2_golden as hg
from circuits_halo2 import (
    Fibonacci1Circuit,
    Fibonacci2Circuit,
    Fibonacci3Circuit,
    SimpleCircuit,
    SimpleLookupCircuit,
)

from tachyon_tpu.zk.plonk import halo2
from tachyon_tpu.zk.plonk import stringifier
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.layout import SimpleFloorPlanner, V1FloorPlanner

pytestmark = pytest.mark.skipif(
    not hg.reference_available(), reason="reference checkout not present"
)

# (golden header name, planner tag, circuit factory, domain k)
CASES = {
    "simple": ("simple_circuit", "IsSimpleFloorPlanner",
               lambda: SimpleCircuit(), 4),
    "simple_lookup": ("simple_lookup_circuit", "IsSimpleFloorPlanner",
                      lambda: SimpleLookupCircuit(), 5),
    "fibonacci1": ("fibonacci/fibonacci1_circuit", "IsSimpleFloorPlanner",
                   lambda: Fibonacci1Circuit(), 4),
    "fibonacci2": ("fibonacci/fibonacci2_circuit", "IsSimpleFloorPlanner",
                   lambda: Fibonacci2Circuit(), 4),
    "fibonacci3": ("fibonacci/fibonacci3_circuit", "IsSimpleFloorPlanner",
                   lambda: Fibonacci3Circuit(), 4),
    "simple_v1": ("simple_circuit", "IsV1FloorPlanner",
                  lambda: SimpleCircuit(planner=V1FloorPlanner), 4),
    "simple_lookup_v1": (
        "simple_lookup_circuit", "IsSimpleFloorPlanner",
        lambda: SimpleLookupCircuit(planner=V1FloorPlanner), 5),
    "fibonacci1_v1": ("fibonacci/fibonacci1_circuit", "IsV1FloorPlanner",
                      lambda: Fibonacci1Circuit(planner=V1FloorPlanner), 4),
    "fibonacci2_v1": ("fibonacci/fibonacci2_circuit", "IsV1FloorPlanner",
                      lambda: Fibonacci2Circuit(planner=V1FloorPlanner), 4),
    "fibonacci3_v1": ("fibonacci/fibonacci3_circuit", "IsV1FloorPlanner",
                      lambda: Fibonacci3Circuit(planner=V1FloorPlanner), 4),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    name, planner_tag, factory, k = CASES[request.param]
    golden = hg.load(name, planner_tag)
    pk = halo2.keygen(factory(), k=k)
    return golden, pk, factory


def test_configure_pinned_constraint_system(case):
    golden, pk, factory = case
    cs = ConstraintSystem()
    factory().configure(cs)
    got = stringifier.pinned_constraint_system_str(cs)
    assert got == golden.string("kPinnedConstraintSystem")


def test_assembly_fixed_columns(case):
    golden, pk, _ = case
    want = golden.hex_rows("kAssemblyFixedColumns")
    assert pk.assembly_fixed == (want if want is not None else [])


def test_assembly_permutation_columns(case):
    golden, pk, _ = case
    want = golden.column_keys("kAssemblyPermutationColumns")
    if want is None:
        assert not pk.cs.permutation_columns
        return
    got = [(c.kind, c.index) for c in pk.cs.permutation_columns]
    assert got == want


def test_cycle_store(case):
    golden, pk, _ = case
    store = pk.cycle_store
    want_mapping = golden.labels("kCycleStoreMapping")
    if want_mapping is None:
        return
    assert [
        [tuple(l) for l in row] for row in want_mapping
    ] == store.mapping
    assert [
        [tuple(l) for l in row] for row in golden.labels("kCycleStoreAux")
    ] == store.aux
    assert golden.int_rows("kCycleStoreSizes") == store.sizes


def test_selectors(case):
    golden, pk, _ = case
    want = [[bool(v) for v in row] for row in golden.int_rows("kSelectors")]
    assert pk.selectors == want


def test_fixed_columns_after_compression(case):
    golden, pk, _ = case
    assert pk.fixed_columns == golden.hex_rows("kFixedColumns")


def test_fixed_polys(case):
    golden, pk, _ = case
    assert pk.fixed_polys == golden.hex_rows("kFixedPolys")


def test_l_polys(case):
    golden, pk, _ = case
    assert pk.l_first == golden.hex_list("kLFirst")
    assert pk.l_last == golden.hex_list("kLLast")
    assert pk.l_active_row == golden.hex_list("kLActiveRow")


def test_permutations(case):
    golden, pk, _ = case
    want = golden.hex_rows("kPermutationsColumns")
    if want is None:
        assert not pk.permutations
        return
    assert pk.permutations == want
    assert pk.permutation_polys == golden.hex_rows("kPermutationsPolys")


def test_pinned_vk_and_transcript_repr(case):
    golden, pk, _ = case
    assert pk.pinned_vk == golden.string("kPinnedVerifyingKey")
    assert pk.transcript_repr == golden.hex_int("kTranscriptRepr")


# --- prover goldens (reference: circuit_test.h CreateProofTest) ------------


@pytest.fixture(scope="module")
def proof_case(case):
    golden, pk, factory = case
    prover = halo2.Halo2Prover(pk)
    circuits = [factory(), factory()]
    insts = [c.instance_columns() for c in circuits]
    return golden, pk, prover.create_proof(circuits, insts)


def test_advice_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kAdviceCommitments")
    got = [[cm for cm in cms] for cms in proof.advice_commitments]
    assert got == [[tuple(pt) for pt in grp] for grp in want]


def test_challenges(proof_case):
    golden, pk, proof = proof_case
    assert proof.theta == golden.hex_int("kTheta")
    assert proof.beta == golden.hex_int("kBeta")
    assert proof.gamma == golden.hex_int("kGamma")
    assert proof.y == golden.hex_int("kY")
    assert proof.x == golden.hex_int("kX")


def test_lookup_permuted_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kLookupPermutedCommitments")
    if want is None:
        return
    got = [
        [pt for pair in pairs for pt in pair]
        for pairs in proof.lookup_permuted_commitments
    ]
    assert got == [[tuple(pt) for pt in grp] for grp in want]


def test_permutation_product_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kPermutationProductCommitments")
    if want is None:
        assert proof.permutation_product_commitments == [[], []]
        return
    assert proof.permutation_product_commitments == [
        [tuple(pt) for pt in grp] for grp in want
    ]


def test_lookup_product_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kLookupProductCommitments")
    if want is None:
        return
    assert proof.lookup_product_commitments == [
        [tuple(pt) for pt in grp] for grp in want
    ]


def test_vanishing_commitments(proof_case):
    golden, pk, proof = proof_case
    assert proof.vanishing_random_commitment == (1, 2)
    want = golden.points("kVanishingHPolyCommitments")
    assert proof.h_commitments == [tuple(pt) for pt in want]


def test_evals(proof_case):
    golden, pk, proof = proof_case
    assert proof.advice_evals == golden.hex_rows("kAdviceEvals")
    assert proof.fixed_evals == golden.hex_list("kFixedEvals")
    assert proof.vanishing_random_eval == 1
    want_sigma = golden.hex_list("kCommonPermutationEvals")
    if want_sigma is not None:
        assert proof.common_permutation_evals == want_sigma
    want_pp = golden.hex_rows("kPermutationProductEvals")
    if want_pp is not None:
        assert proof.permutation_product_evals == want_pp
        assert proof.permutation_product_next_evals == golden.hex_rows(
            "kPermutationProductNextEvals")
        assert proof.permutation_product_last_evals == golden.hex_rows(
            "kPermutationProductLastEvals")
    for key, attr in [
        ("kLookupProductEvals", "z_x"),
        ("kLookupProductNextEvals", "z_wx"),
        ("kLookupPermutedInputEvals", "a_x"),
        ("kLookupPermutedInputPrevEvals", "a_prev"),
        ("kLookupPermutedTableEvals", "s_x"),
    ]:
        want = golden.hex_rows(key)
        if want is None:
            continue
        got = [[e[attr] for e in evs] for evs in proof.lookup_evals]
        assert got == want, key
    want_h = golden.hex_int("kHEval")
    if want_h is not None:
        assert proof.h_eval == want_h


def test_proof_bytes(proof_case):
    golden, pk, proof = proof_case
    assert proof.proof == golden.proof_bytes()
