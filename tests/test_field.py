"""Field arithmetic: bit-exact vs exact Python integer reference.

Mirrors the reference's test strategy (random-input algebraic identities +
cross-checks against an exact implementation; see
tachyon/math/finite_fields/prime_field_unittest.cc) with python ints playing
the role of GMP.
"""
import numpy as np
import pytest

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField

FIELDS = [
    presets.BN254_FQ,
    presets.BN254_FR,
    presets.BLS12_381_FQ,
    presets.BABY_BEAR,
    presets.GOLDILOCKS,
    presets.MERSENNE31,
    presets.KOALA_BEAR,
    presets.SECP256K1_FR,
    presets.PALLAS_FP,
]


def sample_ints(spec, rng, n):
    """Random ints covering edge cases (0, 1, p-1, small, full-range)."""
    out = [0, 1, spec.p - 1, 2, spec.p // 2]
    while len(out) < n:
        out.append(int.from_bytes(rng.bytes(48), "little") % spec.p)
    return np.array(out[:n], dtype=object)


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_roundtrip(spec, rng):
    F = PrimeField(spec)
    xs = sample_ints(spec, rng, 16)
    got = F.decode(F.encode(xs))
    assert np.array_equal(got, xs)


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_add_sub_mul_square(spec, rng):
    F = PrimeField(spec)
    n = 32
    xs = sample_ints(spec, rng, n)
    ys = sample_ints(spec, rng, n)[::-1].copy()
    a, b = F.encode(xs), F.encode(ys)
    p = spec.p

    assert np.array_equal(F.decode(F.add(a, b)), (xs + ys) % p)
    assert np.array_equal(F.decode(F.sub(a, b)), (xs - ys) % p)
    assert np.array_equal(F.decode(F.mul(a, b)), (xs * ys) % p)
    assert np.array_equal(F.decode(F.square(a)), (xs * xs) % p)
    assert np.array_equal(F.decode(F.neg(a)), (-xs) % p)
    assert np.array_equal(F.decode(F.double(a)), (2 * xs) % p)
    assert np.array_equal(F.decode(F.mul_small(a, 7)), (7 * xs) % p)


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_pow_inv(spec, rng):
    F = PrimeField(spec)
    xs = sample_ints(spec, rng, 8)
    a = F.encode(xs)
    e = 12345
    assert np.array_equal(
        F.decode(F.pow_const(a, e)), np.array([pow(int(x), e, spec.p) for x in xs], dtype=object)
    )
    inv = F.decode(F.inv(a))
    for x, ix in zip(xs, inv):
        if x == 0:
            assert ix == 0
        else:
            assert (int(x) * int(ix)) % spec.p == 1


@pytest.mark.parametrize("spec", [presets.BN254_FR, presets.BABY_BEAR], ids=lambda s: s.name)
def test_batch_inverse(spec, rng):
    F = PrimeField(spec)
    xs = sample_ints(spec, rng, 33)
    a = F.encode(xs)
    inv = F.decode(F.batch_inverse(a))
    for x, ix in zip(xs, inv):
        if x == 0:
            assert ix == 0
        else:
            assert (int(x) * int(ix)) % spec.p == 1


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_root_of_unity(spec):
    if spec.two_adicity < 3:
        pytest.skip("no 2-adic subgroup")
    w = spec.root_of_unity(8)
    assert pow(w, 8, spec.p) == 1
    assert pow(w, 4, spec.p) != 1


def test_known_montgomery_constants():
    # R and n0inv for BN254 Fr (R = 2^256; reference uses 4x64 limbs = same R)
    s = presets.BN254_FR
    assert s.L == 16
    assert s.R == 1 << 256
    assert (s.p * pow(s.p, -1, 1 << 16)) % (1 << 16) == 1
    # BabyBear: L=2 => R = 2^32, same Montgomery domain as plonky3
    assert presets.BABY_BEAR.L == 2
    assert presets.BABY_BEAR.two_adicity == 27
    assert presets.GOLDILOCKS.two_adicity == 32
    assert presets.BN254_FR.two_adicity == 28


def test_shapes_and_select(rng):
    F = PrimeField(presets.BN254_FR)
    a = F.random((4, 8), rng)
    assert a.shape == (16, 4, 8)
    b = F.add(a, F.ones((4, 8)))
    m = F.eq(a, a)
    assert m.shape == (4, 8)
    assert bool(m.all())
    c = F.select(F.is_zero(F.sub(a, a)), a, b)
    assert np.array_equal(np.asarray(c), np.asarray(a))
