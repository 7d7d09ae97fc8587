"""End-to-end Groth16: parse the reference's committed circom fixture
(multiplier_3.zkey / .wtns, read in place from the read-only reference
checkout), prove on the TPU pipeline, verify with the exact pairing.

Mirrors reference tests: vendors/circom/circomlib/zkey/zkey_unittest.cc,
circomlib/circuit/multiplier_3_circuit_unittest.cc.
"""
import os

import numpy as np
import pytest

ZKEY = "/root/reference/vendors/circom/examples/multiplier_3.zkey"
WTNS = "/root/reference/vendors/circom/circomlib/wtns/multiplier_3.wtns"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(ZKEY) and os.path.exists(WTNS)),
    reason="reference circom fixtures not available",
)


@pytest.fixture(scope="module")
def zkey():
    from tachyon_tpu.io.zkey import parse_zkey

    return parse_zkey(ZKEY)


def test_parse_zkey_header(zkey):
    from tachyon_tpu.fields import presets

    assert zkey.q == presets.BN254_FQ.p
    assert zkey.r == presets.BN254_FR.p
    assert zkey.num_vars >= zkey.num_public + 1
    assert zkey.domain_size & (zkey.domain_size - 1) == 0


def test_zkey_points_on_curve(zkey):
    from tachyon_tpu.math import curves
    from tachyon_tpu.zk.groth16.prover import _g1_points

    g1 = curves.bn254_g1()
    pts = _g1_points(g1, zkey.points_a1)
    assert bool(np.asarray(g1.is_on_curve(pts)).all())


def test_parse_wtns():
    from tachyon_tpu.io.zkey import parse_wtns
    from tachyon_tpu.fields import presets

    modulus, limbs = parse_wtns(WTNS)
    assert modulus == presets.BN254_FR.p
    assert limbs[0, 0] == 1  # first witness is the constant 1


@pytest.mark.slow
def test_groth16_prove_verify(zkey):
    from tachyon_tpu.io.zkey import parse_wtns
    from tachyon_tpu.zk.groth16.prover import CircomGroth16Prover
    from tachyon_tpu.fields.spec import limbs_to_int

    _, witness = parse_wtns(WTNS)
    prover = CircomGroth16Prover(zkey)
    proof = prover.prove(witness)
    pub = [
        limbs_to_int(witness[:, i + 1]) for i in range(zkey.num_public)
    ]
    assert prover.verify(proof, pub)
    # wrong public input must fail
    assert not prover.verify(proof, [(p + 1) for p in pub])
    # corrupted proof must fail
    from tachyon_tpu.zk.groth16 import prover as pr

    bad = proof._replace(c=pr._py_g1_add(proof.c, proof.c))
    assert not prover.verify(bad, pub)


@pytest.mark.slow
def test_groth16_zk_randomness(zkey):
    from tachyon_tpu.io.zkey import parse_wtns
    from tachyon_tpu.zk.groth16.prover import CircomGroth16Prover
    from tachyon_tpu.fields.spec import limbs_to_int

    _, witness = parse_wtns(WTNS)
    prover = CircomGroth16Prover(zkey)
    proof = prover.prove(witness, r=12345, s=67890)
    pub = [limbs_to_int(witness[:, i + 1]) for i in range(zkey.num_public)]
    assert prover.verify(proof, pub)
