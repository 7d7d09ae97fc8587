"""PSE vendor flavor: keygen/prove/self-verify with the PSE coset shift
(zeta^2) across both PCS flavors (reference: c/zk/plonk/halo2/
bn254_prover.cc:359-380 Vendor::kPSE x PCS dispatch; vanishing_utils.h:46-61
GetHalo2Zeta — the reference ships no PSE golden example data, so parity is
prove+verify semantics, mirroring its PSE dispatch tests)."""
import pytest

from tachyon_tpu.zk.plonk import halo2
from tests.circuits_halo2 import SimpleCircuit


@pytest.mark.parametrize("pcs", ["shplonk", "gwc"])
def test_pse_prove_verify(pcs):
    pk = halo2.keygen(SimpleCircuit(), k=4, vendor="pse", pcs=pcs)
    assert pk.vendor == "pse"
    prover = halo2.Halo2Prover(pk)
    circuits = [SimpleCircuit(), SimpleCircuit()]
    insts = [c.instance_columns() for c in circuits]
    proof = prover.create_proof(circuits, insts)
    ver = halo2.Halo2Verifier(pk)
    assert ver.verify(proof.proof, insts)
    bad = bytearray(proof.proof)
    bad[len(bad) // 2] ^= 1
    assert not ver.verify(bytes(bad), insts)


def _circuit_cases():
    """{circuit}x{pcs}x{lookup flavor} product for the PSE==Scroll pin.

    Mirrors the reference's golden matrix granularity
    (zk/plonk/examples/circuit_test_type_traits.h — the reference only
    instantiates Vendor::kScroll there; PSE parity is therefore pinned
    transitively: Scroll bytes are golden-pinned in test_halo2_golden.py,
    and these cases assert PSE produces byte-identical proofs)."""
    from tests.circuits_halo2 import (Fibonacci1Circuit,
                                      SimpleLookupCircuit, ShuffleCircuit)

    cases = []
    for pcs in ("shplonk", "gwc"):
        cases.append(pytest.param(SimpleCircuit, {}, 4, pcs, "halo2",
                                  id=f"simple-{pcs}"))
        cases.append(pytest.param(SimpleLookupCircuit, {"k": 4}, 4, pcs,
                                  "halo2", id=f"lookup-{pcs}"))
        cases.append(pytest.param(Fibonacci1Circuit, {}, 4, pcs, "halo2",
                                  id=f"fib1-{pcs}"))
    cases.append(pytest.param(SimpleLookupCircuit, {"k": 4}, 4, "shplonk",
                              "log_derivative", id="lookup-logderiv"))
    cases.append(pytest.param(ShuffleCircuit, {}, 4, "shplonk", "halo2",
                              id="shuffle-shplonk"))
    return cases


@pytest.mark.parametrize("circuit_cls,kwargs,k,pcs,lookup", _circuit_cases())
def test_pse_matches_scroll_proof_bytes(circuit_cls, kwargs, k, pcs, lookup):
    """h(X) = C(X)/(X^n - 1) is a polynomial identity: evaluating over the
    PSE coset (zeta^2) vs the Scroll coset (zeta) must yield the SAME h
    coefficients and therefore identical proof bytes on identical circuits
    and rng — the vendor knob changes the evaluation strategy, not the
    proof (reference: vanishing_utils.h:46-61, the zeta choice is a
    halo2curves-compat detail)."""
    pk_s = halo2.keygen(circuit_cls(**kwargs), k=k, vendor="scroll",
                        pcs=pcs, lookup_type=lookup)
    pk_p = halo2.keygen(circuit_cls(**kwargs), k=k, vendor="pse",
                        pcs=pcs, lookup_type=lookup)
    # one circuit instance per proof: the vendor-equality property is
    # per-configuration, and the host prover is python-bound — two
    # instances double the file's wall time for no extra coverage
    circuits = [circuit_cls(**kwargs)]
    insts = [c.instance_columns() for c in circuits]
    pr_s = halo2.Halo2Prover(pk_s).create_proof(circuits, insts)
    pr_p = halo2.Halo2Prover(pk_p).create_proof(circuits, insts)
    assert pr_s.proof == pr_p.proof
    assert halo2.Halo2Verifier(pk_p).verify(pr_p.proof, insts)
