"""Binary tower field tests: exact host-int reference + algebraic laws
(reference pattern: math/finite_fields/binary_fields/binary_fields_unittest.cc).
"""
import numpy as np
import pytest

from tachyon_tpu.math.binary_field import binary_field


# --- independent scalar reference (python ints) --------------------------
def ref_mul_alpha(x, k):
    if k == 1:
        return x
    h = k // 2
    m = (1 << h) - 1
    x0, x1 = x & m, x >> h
    return x1 | ((x0 ^ ref_mul_alpha(x1, h)) << h)


def ref_mul(a, b, k):
    if k == 1:
        return a & b
    h = k // 2
    m = (1 << h) - 1
    a0, a1 = a & m, a >> h
    b0, b1 = b & m, b >> h
    z0 = ref_mul(a0, b0, h)
    z1 = ref_mul(a1, b1, h)
    z2 = ref_mul(a0 ^ a1, b0 ^ b1, h) ^ z0 ^ z1
    return (z0 ^ z1) | ((z2 ^ ref_mul_alpha(z1, h)) << h)


def test_gf4_gf16_canonical():
    """hand-checked Wiedemann tower values (match the reference's
    DoBinaryMul 4-bit table semantics)."""
    # GF(4): X^2 = X + 1 -> 2*2 = 3, 2*3 = 1
    assert ref_mul(2, 2, 2) == 3
    assert ref_mul(2, 3, 2) == 1
    F = binary_field(2)
    assert int(F.mul(F.encode(2), F.encode(2))) == 3
    assert int(F.mul(F.encode(2), F.encode(3))) == 1
    # GF(16): every nonzero x has x * x^-1 = 1
    F16 = binary_field(4)
    for x in range(1, 16):
        xv = F16.encode(x)
        assert int(F16.mul(xv, F16.inv(xv))) == 1


@pytest.mark.parametrize("k", [8, 16, 32, 64, 128])
def test_vs_scalar_reference(k, rng):
    F = binary_field(k)
    a = F.random((16,), rng)
    b = F.random((16,), rng)
    got = F.decode(F.mul(a, b))
    ai, bi = F.decode(a), F.decode(b)
    for i in range(16):
        assert int(got[i]) == ref_mul(int(ai[i]), int(bi[i]), k)


@pytest.mark.parametrize("k", [8, 32, 128])
def test_field_laws(k, rng):
    F = binary_field(k)
    a = F.random((32,), rng)
    b = F.random((32,), rng)
    c = F.random((32,), rng)
    # commutativity / associativity / distributivity
    assert np.array_equal(np.asarray(F.mul(a, b)), np.asarray(F.mul(b, a)))
    assert np.array_equal(
        np.asarray(F.mul(F.mul(a, b), c)), np.asarray(F.mul(a, F.mul(b, c)))
    )
    assert np.array_equal(
        np.asarray(F.mul(a, F.add(b, c))),
        np.asarray(F.add(F.mul(a, b), F.mul(a, c))),
    )
    # frobenius: (a+b)^2 = a^2 + b^2
    assert np.array_equal(
        np.asarray(F.square(F.add(a, b))),
        np.asarray(F.add(F.square(a), F.square(b))),
    )
    # square == mul(self)
    assert np.array_equal(np.asarray(F.square(a)), np.asarray(F.mul(a, a)))
    # inverse (zero maps to zero, skip those lanes)
    inv = F.inv(a)
    one = F.mul(a, inv)
    nz = ~np.asarray(F.is_zero(a))
    ones = np.asarray(F.ones(a.shape[1:] if k > 32 else a.shape))
    got = np.asarray(one)
    if k > 32:
        assert np.array_equal(got[:, nz], ones[:, nz])
    else:
        assert np.array_equal(got[nz], ones[nz])
    # mul_by_alpha == mul by this level's generator X = 2^(k/2)
    alpha = F.encode(np.full(32, 1 << (k // 2), dtype=object))
    assert np.array_equal(
        np.asarray(F.mul_by_alpha(a)), np.asarray(F.mul(a, alpha))
    )
