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
    ShuffleCircuit,
    ShuffleAPICircuit,
    MultiLookupCircuit,
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
    "multi_lookup": ("multi_lookup_circuit", "IsSHPlonk",
                     lambda: MultiLookupCircuit(), 5),
    "multi_lookup_gwc": ("multi_lookup_circuit", "IsGWC",
                         lambda: MultiLookupCircuit(), 5),
    "shuffle_api": ("shuffle_api_circuit", "IsSHPlonk",
                    lambda: ShuffleAPICircuit(), 4),
    "shuffle_api_v1": ("shuffle_api_circuit", "IsSHPlonk",
                       lambda: ShuffleAPICircuit(planner=V1FloorPlanner), 4),
    "shuffle": ("shuffle_circuit", "IsSHPlonk",
                lambda: ShuffleCircuit(), 4),
    "shuffle_v1": ("shuffle_circuit", "IsSHPlonk",
                   lambda: ShuffleCircuit(planner=V1FloorPlanner), 4),
}


def _shuffle_circuits(golden, planner):
    """Get2Circuits for the shuffle circuit uses tables 0 AND 1
    (shuffle_circuit_test_data.h:864-871)."""
    import re
    out = []
    for member in ("kOriginalTables", "kShuffledTables"):
        raw = hg._find_member(golden.body, member)
        vals = [int(h, 16) for h in re.findall(r'"(0x[0-9a-fA-F]+)"', raw)]
        W, H = ShuffleCircuit.W, ShuffleCircuit.H
        tables = [
            [[vals[t * W * H + c * H + r] for r in range(H)]
             for c in range(W)]
            for t in range(2)
        ]
        out.append(tables)
    originals, shuffleds = out
    return [
        ShuffleCircuit(originals[i], shuffleds[i], planner=planner)
        for i in range(2)
    ]


# name -> extra keygen kwargs
KEYGEN_KWARGS = {
    "multi_lookup": {"lookup_type": "log_derivative"},
    "multi_lookup_gwc": {"lookup_type": "log_derivative", "pcs": "gwc"},
    "shuffle_api": {"lookup_type": "log_derivative"},
    "shuffle_api_v1": {"lookup_type": "log_derivative"},
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    name, planner_tag, factory, k = CASES[request.param]
    golden = hg.load(name, planner_tag)
    kwargs = KEYGEN_KWARGS.get(request.param, {})
    pk = halo2.keygen(factory(), k=k, **kwargs)
    pk._case_name = name
    return golden, pk, factory


def test_configure_pinned_constraint_system(case):
    golden, pk, factory = case
    want = golden.string("kPinnedConstraintSystem")
    if not want:
        return  # circuit pins no constraint-system string
    cs = ConstraintSystem()
    cs.lookup_type = pk.cs.lookup_type
    factory().configure(cs)
    got = stringifier.pinned_constraint_system_str(cs)
    assert got == want


def test_assembly_fixed_columns(case):
    golden, pk, _ = case
    want = golden.hex_rows("kAssemblyFixedColumns")
    if want is None:
        # not pinned; only fibonacci1/3 truly have no fixed columns
        return
    assert pk.assembly_fixed == want


def test_assembly_permutation_columns(case):
    golden, pk, _ = case
    want = golden.column_keys("kAssemblyPermutationColumns")
    if want is None:
        return  # not pinned for this circuit
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
    if want == []:
        want = [[False] * pk.n for _ in pk.selectors]
    assert pk.selectors == want


def test_fixed_columns_after_compression(case):
    golden, pk, _ = case
    want = golden.hex_rows("kFixedColumns")
    if want is None:
        return
    assert pk.fixed_columns == want


def test_fixed_polys(case):
    golden, pk, _ = case
    want = golden.hex_rows("kFixedPolys")
    if want is None:
        return
    assert pk.fixed_polys == want


def test_l_polys(case):
    golden, pk, _ = case
    if not golden.hex_list("kLFirst"):
        return
    assert pk.l_first == golden.hex_list("kLFirst")
    assert pk.l_last == golden.hex_list("kLLast")
    assert pk.l_active_row == golden.hex_list("kLActiveRow")


def test_permutations(case):
    golden, pk, _ = case
    want = golden.hex_rows("kPermutationsColumns")
    if want is None:
        return  # not pinned for this circuit
    assert pk.permutations == want
    assert pk.permutation_polys == golden.hex_rows("kPermutationsPolys")


def test_pinned_vk_and_transcript_repr(case):
    golden, pk, _ = case
    want = golden.string("kPinnedVerifyingKey")
    if not want:
        return
    assert pk.pinned_vk == want
    assert pk.transcript_repr == golden.hex_int("kTranscriptRepr")


# --- prover goldens (reference: circuit_test.h CreateProofTest) ------------


# shuffle_api pins the non-legacy point encoding
# (shuffle_api_circuit_test.cc:28)
NON_LEGACY = {"shuffle_api_circuit"}


@pytest.fixture(scope="module")
def proof_case(case):
    golden, pk, factory = case
    prover = halo2.Halo2Prover(
        pk, legacy_serialization=pk._case_name not in NON_LEGACY)
    if pk._case_name == "shuffle_circuit":
        planner = type(factory().floor_planner(
            halo2.ConstraintSystem(), pk.n))
        circuits = _shuffle_circuits(golden, planner)
    else:
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


def test_lookup_m_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kLookupMPolyCommitments")
    if want is None:
        return
    assert proof.lookup_m_commitments == [
        [tuple(pt) for pt in grp] for grp in want
    ]


def test_lookup_sum_commitments(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kLookupSumCommitments")
    if want is None:
        return
    assert proof.lookup_product_commitments == [
        [tuple(pt) for pt in grp] for grp in want
    ]


def test_vanishing_commitments(proof_case):
    golden, pk, proof = proof_case
    assert proof.vanishing_random_commitment == (1, 2)
    want = golden.points("kVanishingHPolyCommitments")
    got = [cm if cm is not None else (0, 0) for cm in proof.h_commitments]
    assert got == [tuple(pt) for pt in want]


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
        ("kLookupSumEvals", "z_x"),
        ("kLookupSumNextEvals", "z_wx"),
        ("kLookupMEvals", "m_x"),
    ]:
        want = golden.hex_rows(key)
        if want is None:
            continue
        got = [[e[attr] for e in evs] for evs in proof.lookup_evals]
        assert got == want, key
    want_h = golden.hex_int("kHEval")
    if want_h is not None:
        assert proof.h_eval == want_h


def test_shuffle_commitments_and_evals(proof_case):
    golden, pk, proof = proof_case
    want = golden.points("kShuffleProductCommitments")
    if want is None:
        return
    assert proof.shuffle_product_commitments == [
        [tuple(pt) for pt in grp] for grp in want
    ]
    for key, attr in [("kShuffleProductEvals", "z_x"),
                      ("kShuffleProductNextEvals", "z_wx")]:
        want_e = golden.hex_rows(key)
        if want_e is not None:
            got = [[e[attr] for e in evs] for evs in proof.shuffle_evals]
            assert got == want_e, key


def test_proof_bytes(proof_case):
    golden, pk, proof = proof_case
    assert proof.proof == golden.proof_bytes()


def test_verify_reference_proof(case):
    """our verifier must ACCEPT the reference's pinned proof bytes and
    reject a tampered byte (reference: circuit_test.h VerifyProofTest)."""
    golden, pk, factory = case
    want = golden.proof_bytes()
    if want is None:
        return
    ver = halo2.Halo2Verifier(
        pk, legacy_serialization=pk._case_name not in NON_LEGACY)
    if pk._case_name == "shuffle_circuit":
        insts = [[], []]
    else:
        insts = [factory().instance_columns()] * 2
    assert ver.verify(want, insts)
    bad = bytearray(want)
    bad[len(bad) // 2] ^= 1
    assert not ver.verify(bytes(bad), insts)


def test_proving_key_serialization_roundtrip(tmp_path):
    """save/load the key (Copyable analog) and reprove: proof bytes must
    still match the reference golden (reference: base/buffer/copyable.h
    key serialization role)."""
    golden = hg.load("simple_circuit", "IsSimpleFloorPlanner")
    pk = halo2.keygen(SimpleCircuit(), k=4)
    path = tmp_path / "pk.json"
    halo2.save_proving_key(pk, str(path))
    pk2 = halo2.load_proving_key(str(path))
    circuits = [SimpleCircuit(), SimpleCircuit()]
    insts = [c.instance_columns() for c in circuits]
    proof = halo2.Halo2Prover(pk2).create_proof(circuits, insts)
    assert proof.proof == golden.proof_bytes()


@pytest.mark.slow
def test_device_backend_proof():
    """the JAX-kernel backend (MSM commitments, NTTs, coset evals) under
    the byte-exact pipeline must reproduce the reference's golden proof."""
    from tachyon_tpu.zk.plonk.halo2_device import DeviceBackend

    golden = hg.load("simple_circuit", "IsSimpleFloorPlanner")
    pk = halo2.keygen(SimpleCircuit(), k=4)
    prover = halo2.Halo2Prover(pk, backend=DeviceBackend(pk))
    circuits = [SimpleCircuit(), SimpleCircuit()]
    insts = [c.instance_columns() for c in circuits]
    proof = prover.create_proof(circuits, insts)
    assert proof.proof == golden.proof_bytes()


@pytest.mark.slow
def test_device_backend_lookup_proof():
    """device lookup compress (whole-column expression eval) + device
    opening-proof commits must stay byte-identical to the reference golden
    on a circuit WITH lookups."""
    from tests.circuits_halo2 import SimpleLookupCircuit
    from tachyon_tpu.zk.plonk.halo2_device import DeviceBackend

    golden = hg.load("simple_lookup_circuit", "IsSimpleFloorPlanner")
    pk = halo2.keygen(SimpleLookupCircuit(k=4), k=4)
    prover = halo2.Halo2Prover(pk, backend=DeviceBackend(pk))
    circuits = [SimpleLookupCircuit(k=4), SimpleLookupCircuit(k=4)]
    insts = [c.instance_columns() for c in circuits]
    proof = prover.create_proof(circuits, insts)
    assert proof.proof == golden.proof_bytes()


@pytest.mark.slow
def test_device_keygen_matches_host():
    """keygen(device=True) routes fixed/permutation commitments + IFFTs
    through the device stack; the resulting key must be identical."""
    pk_h = halo2.keygen(SimpleCircuit(), k=4)
    pk_d = halo2.keygen(SimpleCircuit(), k=4, device=True)
    assert pk_h.fixed_commitments == pk_d.fixed_commitments
    assert pk_h.permutation_commitments == pk_d.permutation_commitments
    assert pk_h.fixed_polys == pk_d.fixed_polys
    assert pk_h.transcript_repr == pk_d.transcript_repr
