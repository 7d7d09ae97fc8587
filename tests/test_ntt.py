"""NTT tests: bit-exact vs naive DFT with exact python ints (the reference's
radix2_evaluation_domain_unittest pattern)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.ntt import Radix2Domain, coset_lde_batch

FIELDS = [presets.BN254_FR, presets.BABY_BEAR, presets.GOLDILOCKS]


def naive_dft(coeffs, w, p):
    n = len(coeffs)
    return [
        sum(int(coeffs[j]) * pow(w, i * j, p) for j in range(n)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_fft_vs_naive(spec, n, rng):
    F = PrimeField(spec)
    dom = Radix2Domain(F, n)
    coeffs = [int.from_bytes(rng.bytes(40), "little") % spec.p for _ in range(n)]
    got = F.decode(dom.fft(F.encode(np.array(coeffs, dtype=object))))
    want = naive_dft(coeffs, dom.omega_int, spec.p)
    assert [int(x) for x in got] == want


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_ifft_roundtrip(spec, rng):
    F = PrimeField(spec)
    n = 64
    dom = Radix2Domain(F, n)
    a = F.random((n,), rng)
    back = dom.ifft(dom.fft(a))
    assert bool(np.asarray(F.eq(back, a)).all())


def test_coset_fft(rng):
    spec = presets.BABY_BEAR
    F = PrimeField(spec)
    n = 16
    dom = Radix2Domain(F, n)
    coeffs = [int.from_bytes(rng.bytes(8), "little") % spec.p for _ in range(n)]
    g = spec.generator
    got = F.decode(dom.coset_fft(F.encode(np.array(coeffs, dtype=object)), g))
    # p(g * w^i)
    for i in range(n):
        x = (g * pow(dom.omega_int, i, spec.p)) % spec.p
        want = sum(c * pow(x, j, spec.p) for j, c in enumerate(coeffs)) % spec.p
        assert int(got[i]) == want
    back = dom.coset_ifft(jnp.asarray(dom.coset_fft(
        F.encode(np.array(coeffs, dtype=object)), g)), g)
    assert [int(v) for v in F.decode(back)] == coeffs


def test_batch_and_lde(rng):
    spec = presets.BABY_BEAR
    F = PrimeField(spec)
    n, cols = 8, 3
    dom = Radix2Domain(F, n)
    vals = np.array(
        [[int.from_bytes(rng.bytes(8), "little") % spec.p for _ in range(cols)]
         for _ in range(n)], dtype=object)
    evals = F.encode(vals)  # (L, n, cols)
    lde = coset_lde_batch(dom, evals, log_blowup=1, shift_int=spec.generator)
    assert lde.shape[1] == 2 * n
    # each column's LDE must agree with per-column computation
    for c in range(cols):
        col = F.encode(vals[:, c])
        coeffs = dom.ifft(col)
        big = Radix2Domain(F, 2 * n)
        padded = jnp.concatenate([coeffs, F.zeros((n,))], axis=1)
        want = big.coset_fft(padded, spec.generator)
        assert bool(np.asarray(F.eq(lde[:, :, c], want)).all())
