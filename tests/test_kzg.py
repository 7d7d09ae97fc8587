"""KZG commit/open/verify roundtrip (reference: kzg_unittest pattern)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tachyon_tpu.crypto import kzg
from tachyon_tpu.math import curves
from tachyon_tpu.ops import mont


@pytest.fixture(scope="module")
def params():
    return kzg.unsafe_setup(8, tau=0xDEADBEEF)


def test_commit_matches_direct_eval(params, rng):
    """[p(tau)]G1 computed two ways: coeff MSM and Lagrange MSM."""
    Fr = curves.bn254_fr()
    coeffs = [int(rng.integers(1, 1 << 30)) for _ in range(8)]
    cm = Fr.encode(np.array(coeffs, dtype=object))
    c_std = mont.mont_reduce(Fr.spec, cm)
    c1 = kzg.to_int_point(kzg.commit(params, c_std))
    # evals on the domain
    from tachyon_tpu.math.ntt import Radix2Domain

    dom = Radix2Domain(Fr, 8)
    evals = dom.fft(cm)
    e_std = mont.mont_reduce(Fr.spec, evals)
    c2 = kzg.to_int_point(kzg.commit_lagrange(params, e_std))
    assert c1 == c2
    # direct: p(tau) * G1
    tau = 0xDEADBEEF
    v = sum(c * pow(tau, i, Fr.p) for i, c in enumerate(coeffs)) % Fr.p
    from tachyon_tpu.zk.groth16.prover import _py_g1_mul

    assert c1 == _py_g1_mul((1, 2), v)


def test_open_verify(params, rng):
    Fr = curves.bn254_fr()
    coeffs = [int(rng.integers(1, 1 << 30)) for _ in range(8)]
    cm = Fr.encode(np.array(coeffs, dtype=object))
    c_std = mont.mont_reduce(Fr.spec, cm)
    commitment = kzg.to_int_point(kzg.commit(params, c_std))
    z = 777
    proof = kzg.open_at(params, cm, z)
    want = sum(c * pow(z, i, Fr.p) for i, c in enumerate(coeffs)) % Fr.p
    assert proof.value == want
    assert kzg.verify(params, commitment, z, proof)
    bad = kzg.KZGProof((proof.value + 1) % Fr.p, proof.pi)
    assert not kzg.verify(params, commitment, z, bad)
