"""MixedRadixDomain: exact host DFT cross-check + roundtrip
(reference: mixed_radix_evaluation_domain.h semantics on bn254 Fr)."""
import numpy as np
import pytest

from tachyon_tpu.math import curves
from tachyon_tpu.math.ntt import DomainCache, MixedRadixDomain, Radix2Domain


@pytest.mark.parametrize("n", [3, 6, 12, 18, 24, 96])
def test_mixed_radix_vs_host_dft(n, rng):
    Fr = curves.bn254_fr()
    p = Fr.p
    dom = MixedRadixDomain(Fr, n)
    w = dom.omega_int
    assert pow(w, n, p) == 1 and pow(w, n // 2 or 1, p) != 1 or n <= 2

    coeffs_int = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    ev = dom.fft(Fr.encode(np.array(coeffs_int, dtype=object)))
    got = Fr.decode(ev)
    for k in range(n):
        x = pow(w, k, p)
        expect = 0
        for c in reversed(coeffs_int):
            expect = (expect * x + c) % p
        assert int(got[k]) == expect, k


@pytest.mark.parametrize("n", [12, 48])
def test_mixed_radix_roundtrip(n, rng):
    Fr = curves.bn254_fr()
    dom = MixedRadixDomain(Fr, n)
    vals = Fr.random((n,), rng)
    back = dom.ifft(dom.fft(vals))
    assert np.array_equal(np.asarray(back), np.asarray(vals))


def test_domain_factory_dispatch():
    Fr = curves.bn254_fr()
    cache = DomainCache(Fr)
    assert isinstance(cache.get(16), Radix2Domain)
    assert isinstance(cache.get(12), MixedRadixDomain)
    with pytest.raises(AssertionError):
        cache.get(10)  # 2 * 5: unsupported
