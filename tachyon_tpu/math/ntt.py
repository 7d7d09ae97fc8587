"""Radix-2 NTT / evaluation domain, fully vectorized for TPU.

TPU-native analog of the reference's Radix2EvaluationDomain
(reference: tachyon/math/polynomials/univariate/radix2_evaluation_domain.h:
FFT/IFFT/CosetLDE, twiddle caching radix2_twiddle_cache.h).  Design:

  * one bit-reverse gather + log2(n) DIT butterfly stages, each stage a
    static reshape + one vector multiply + add/sub over the whole array --
    no in-place scalar butterflies (XLA fuses each stage into a couple of
    HBM passes);
  * the twiddle table (n/2 powers of w) is built ON DEVICE by log-doubling
    (n/2 field muls) and cached per (field, n, inverse) -- stage tables are
    strided slices of it;
  * batch FFT ("FFTBatch"/"CosetLDEBatch") is the same code: trailing batch
    axes ride along, so many columns share every twiddle load.

Conventions: fft(coeffs) -> natural-order evaluations [p(w^i)]_i;
ifft inverts exactly (includes the 1/n scale).  Montgomery form throughout.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.math.field import PrimeField


@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class Radix2Domain:
    """Evaluation domain of size n = 2^log_n over PrimeField F."""

    def __init__(self, F: PrimeField, n: int):
        assert n & (n - 1) == 0 and n >= 1
        self.F = F
        self.n = n
        self.log_n = n.bit_length() - 1
        assert self.log_n <= F.two_adicity
        spec = F.spec
        self.omega_int = spec.root_of_unity(n)
        self.omega_inv_int = pow(self.omega_int, n - 1, spec.p)
        self.n_inv_int = pow(n, spec.p - 2, spec.p)
        self._tw_cache: dict[bool, jnp.ndarray] = {}

    # --- twiddles -------------------------------------------------------------
    def twiddles(self, inverse: bool) -> jnp.ndarray:
        """(L, n/2) table of w^j (or w^-j), built on device by log-doubling."""
        if inverse in self._tw_cache:
            return self._tw_cache[inverse]
        F = self.F
        w_int = self.omega_inv_int if inverse else self.omega_int
        half = self.n // 2
        tab = F.ones((1,))
        if half > 1:
            cur = F.encode(np.array([w_int], dtype=object))
            while tab.shape[-1] < half:
                tab = jnp.concatenate([tab, F.mul(tab, cur)], axis=-1)
                cur = F.square(cur)
        self._tw_cache[inverse] = tab
        return tab

    # --- core transform ---------------------------------------------------------
    def _transform(self, coeffs: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """DIT FFT over axis 1 of (L, n, *batch)."""
        F = self.F
        n, log_n = self.n, self.log_n
        assert coeffs.shape[1] == n, (coeffs.shape, n)
        if n == 1:
            return coeffs
        x = jnp.take(coeffs, jnp.asarray(_bitrev_perm(log_n)), axis=1)
        tw = self.twiddles(inverse)  # (L, n/2)
        batch = coeffs.shape[2:]
        L = coeffs.shape[0]
        for s in range(log_n):
            m = 1 << (s + 1)
            stride = n // m
            # twiddle_j = w^(j*stride), j < m/2
            w = tw[:, ::stride]  # (L, m/2)
            xr = x.reshape(L, n // m, 2, m // 2, *batch)
            u = xr[:, :, 0]
            v = F.mul(
                xr[:, :, 1],
                w.reshape(L, 1, m // 2, *([1] * len(batch))),
            )
            x = jnp.concatenate(
                [F.add(u, v)[:, :, None], F.sub(u, v)[:, :, None]], axis=2
            ).reshape(L, n, *batch)
        if inverse:
            ninv = F.full((), self.n_inv_int).reshape(
                (L,) + (1,) * (x.ndim - 1)
            )
            x = F.mul(x, ninv)
        return x

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """coefficients -> evaluations on the domain (natural order)."""
        return self._transform(coeffs, inverse=False)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """evaluations -> coefficients."""
        return self._transform(evals, inverse=True)

    # --- coset ops ---------------------------------------------------------------
    def shift_powers(self, shift_int: int, count: int | None = None) -> jnp.ndarray:
        """(L, count) table of shift^i via device log-doubling."""
        F = self.F
        count = count or self.n
        tab = F.ones((1,))
        cur = F.encode(np.array([shift_int], dtype=object))
        while tab.shape[-1] < count:
            tab = jnp.concatenate([tab, F.mul(tab, cur)], axis=-1)
            cur = F.square(cur)
        return tab[:, :count]

    def coset_fft(self, coeffs: jnp.ndarray, shift_int: int) -> jnp.ndarray:
        """evaluations of p on the coset shift*H: FFT(coeffs .* shift^i)."""
        sp = self.shift_powers(shift_int)
        batch = coeffs.shape[2:]
        sp = sp.reshape(sp.shape[:2] + (1,) * len(batch))
        return self.fft(self.F.mul(coeffs, sp))

    def coset_ifft(self, evals: jnp.ndarray, shift_int: int) -> jnp.ndarray:
        coeffs = self.ifft(evals)
        inv_shift = pow(shift_int, self.F.p - 2, self.F.p)
        sp = self.shift_powers(inv_shift)
        batch = coeffs.shape[2:]
        sp = sp.reshape(sp.shape[:2] + (1,) * len(batch))
        return self.F.mul(coeffs, sp)


class DomainCache:
    """Per-field domain factory (analog of UnivariateEvaluationDomainFactory)."""

    def __init__(self, F: PrimeField):
        self.F = F
        self._cache: dict[int, Radix2Domain] = {}

    def get(self, n: int) -> Radix2Domain:
        if n not in self._cache:
            self._cache[n] = Radix2Domain(self.F, n)
        return self._cache[n]


def coset_lde_batch(
    domain: Radix2Domain,
    evals: jnp.ndarray,
    log_blowup: int,
    shift_int: int,
) -> jnp.ndarray:
    """Plonky3-style CosetLDEBatch: interpret (L, n, *batch) as evaluations
    on H, return evaluations on shift*H' where |H'| = n << log_blowup.

    Reference: radix2_evaluation_domain.h:122 (CosetLDEBatch).
    """
    F = domain.F
    coeffs = domain.ifft(evals)
    big_n = domain.n << log_blowup
    big = Radix2Domain(F, big_n)
    pad_shape = (coeffs.shape[0], big_n - domain.n) + coeffs.shape[2:]
    padded = jnp.concatenate(
        [coeffs, jnp.zeros(pad_shape, dtype=coeffs.dtype)], axis=1
    )
    return big.coset_fft(padded, shift_int)
