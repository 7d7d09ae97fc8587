"""Pedersen commitment + BinaryMerkleTree coverage (reference:
crypto/commitments/pedersen/pedersen_unittest, binary_merkle_tree tests)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tachyon_tpu.crypto import binary_merkle, pedersen, poseidon2
from tachyon_tpu.fields.spec import int_to_limbs
from tachyon_tpu.math import curves


def test_pedersen_homomorphic(rng):
    curve = curves.bn254_g1()
    n = 8
    params = pedersen.setup(curve, n, rng)
    Ls = curve.SF.spec.L
    r_p = curve.SF.p
    m1 = [int(rng.integers(0, 1 << 40)) for _ in range(n)]
    m2 = [int(rng.integers(0, 1 << 40)) for _ in range(n)]
    r1, r2 = 123456789, 987654321

    def enc(ms):
        return jnp.asarray(np.stack([int_to_limbs(v, Ls) for v in ms], -1))

    c1 = pedersen.commit(curve, params, enc(m1), r1)
    c2 = pedersen.commit(curve, params, enc(m2), r2)
    msum = [(a + b) % r_p for a, b in zip(m1, m2)]
    csum = pedersen.commit(curve, params, enc(msum), (r1 + r2) % r_p)
    lhs = curve.to_affine(curve.add_xyzz(c1, c2))
    rhs = curve.to_affine(csum)
    assert bool(np.asarray(curve.eq_affine(lhs, rhs)).all())


def test_binary_merkle_roundtrip(rng):
    h = poseidon2.baby_bear_p3_w16()
    F = h.F
    n = 16
    leaves = F.random((8, n), rng)  # 8-element digests per leaf
    tree = binary_merkle.build(h.compress, leaves)
    root = tree.root()
    for idx in (0, 5, n - 1):
        proof = binary_merkle.open_at(tree, idx)
        assert binary_merkle.verify(
            h.compress, root, idx, leaves[:, :, idx], proof
        )
    # wrong leaf fails
    bad = F.random((8,), rng)
    proof = binary_merkle.open_at(tree, 3)
    assert not binary_merkle.verify(h.compress, root, 3, bad, proof)
