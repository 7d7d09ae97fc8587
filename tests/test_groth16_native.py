"""Native R1CS -> setup -> prove -> verify, on bn254 AND bls12_381
(reference: zk/r1cs/groth16 unittest flow with a toxic-waste setup)."""
import pytest

from tachyon_tpu.zk.groth16.r1cs import R1CS, Groth16, setup


def _mul_circuit() -> R1CS:
    """x * y = z with z public: w = (1, z, x, y)."""
    r1cs = R1CS(num_public=1)
    x = r1cs.new_private()
    y = r1cs.new_private()
    # x * y = z
    r1cs.constrain({x: 1}, {y: 1}, {1: 1})
    # (x + y) * 1 = x + y  (a second, linear constraint exercising ONE)
    s = r1cs.new_private()
    r1cs.constrain({x: 1, y: 1}, {0: 1}, {s: 1})
    return r1cs


@pytest.mark.parametrize("family", ["bn254", "bls12_381"])
def test_native_groth16_roundtrip(family):
    r1cs = _mul_circuit()
    pp = setup(r1cs, family, rng=iter([777, 888, 999, 1111, 2222]).__next__)
    g16 = Groth16(pp)
    proof = g16.prove(public=[21], private=[3, 7, 10])
    assert g16.verify(proof, [21])
    # wrong public input must fail
    assert not g16.verify(proof, [22])
    # wrong witness must fail to verify
    bad = g16.prove(public=[21], private=[3, 8, 11])
    assert not g16.verify(bad, [21])


def test_native_groth16_rerandomize():
    r1cs = _mul_circuit()
    pp = setup(r1cs, "bn254", rng=iter([5, 6, 7, 8, 9]).__next__)
    g16 = Groth16(pp)
    proof = g16.prove(public=[15], private=[3, 5, 8], r=0, s=0)
    rr = g16.rerandomize(proof)
    assert rr != proof  # unlinkable
    assert g16.verify(rr, [15])


def test_native_groth16_deterministic_with_rs():
    r1cs = _mul_circuit()
    pp = setup(r1cs, "bn254", rng=iter([5, 6, 7, 8, 9]).__next__)
    g16 = Groth16(pp)
    p1 = g16.prove(public=[15], private=[3, 5, 8], r=123, s=456)
    p2 = g16.prove(public=[15], private=[3, 5, 8], r=123, s=456)
    assert p1 == p2
    p3 = g16.prove(public=[15], private=[3, 5, 8])  # fresh CSPRNG r/s
    assert p3 != p1
    assert g16.verify(p3, [15])
