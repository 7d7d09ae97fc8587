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

    def __init__(self, F: PrimeField, n: int, omega_int: int | None = None):
        """omega_int overrides the canonical 2-adic root (the mixed-radix
        domain composes sub-FFTs whose roots must be powers of ITS root)."""
        assert n & (n - 1) == 0 and n >= 1
        self.F = F
        self.n = n
        self.log_n = n.bit_length() - 1
        spec = F.spec
        if omega_int is None:
            assert self.log_n <= F.two_adicity
            omega_int = spec.root_of_unity(n)
        self.omega_int = omega_int
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
    """Per-field domain factory: Radix2 for powers of two, MixedRadix for
    2^a*3^b sizes (analog of UnivariateEvaluationDomainFactory,
    univariate_evaluation_domain_factory.h)."""

    def __init__(self, F: PrimeField):
        self.F = F
        self._cache: dict[int, object] = {}

    def get(self, n: int):
        if n not in self._cache:
            if n & (n - 1) == 0:
                self._cache[n] = Radix2Domain(self.F, n)
            else:
                self._cache[n] = MixedRadixDomain(self.F, n)
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


class MixedRadixDomain:
    """Evaluation domain of size n = 2^a * 3^b (four-step composition).

    Analog of the reference's MixedRadixEvaluationDomain
    (reference: polynomials/univariate/mixed_radix_evaluation_domain.h:53,
    enabled for fields with kHasLargeSubgroupRootOfUnity — bn254 Fr has a
    base-3 small subgroup, bn254/BUILD.bazel:37-48, decomposition
    prime_field_base.h:61).  Decomposition: index j = j2*n1 + j1 with
    n1 = 3^b, n2 = 2^a; a batched radix-2 FFT over j2, a twiddle by
    w^(j1*k2), and a direct n1-point DFT (n1 <= 9: one small matmul) over
    j1.  Output is natural order: X[k2 + n2*k1].
    """

    def __init__(self, F: PrimeField, n: int):
        self.F = F
        self.n = n
        p = F.p
        n2 = n & (-n)  # 2^a part
        n1 = n // n2
        b = 0
        t = n1
        while t % 3 == 0:
            t //= 3
            b += 1
        assert t == 1, f"size {n} is not 2^a * 3^b"
        assert (p - 1) % n == 0, f"no order-{n} subgroup"
        self.n1, self.n2 = n1, n2
        g = F.spec.generator
        self.omega_int = pow(g, (p - 1) // n, p)
        self.omega_inv_int = pow(self.omega_int, n - 1, p)
        w_n2 = pow(self.omega_int, n1, p)  # order n2
        self.w_n1 = pow(self.omega_int, n2, p)  # order n1
        self.r2 = (
            Radix2Domain(F, n2, omega_int=w_n2) if n2 > 1 else None
        )
        self._cache: dict = {}

    def _small_dft_matrix(self, inverse: bool) -> jnp.ndarray:
        """(L, n1, n1) matrix M[k, j] = w_n1^{±jk} (scaled by 1/n1 if inv)."""
        key = ("M", inverse)
        if key in self._cache:
            return self._cache[key]
        F, p, n1 = self.F, self.F.p, self.n1
        w = pow(self.w_n1, p - 2, p) if inverse else self.w_n1
        scale = pow(n1, p - 2, p) if inverse else 1
        m = np.empty((n1, n1), dtype=object)
        for k in range(n1):
            for j in range(n1):
                m[k, j] = pow(w, j * k, p) * scale % p
        self._cache[key] = F.encode(m)
        return self._cache[key]

    def _mid_twiddles(self, inverse: bool) -> jnp.ndarray:
        """(L, n2, n1) table w^{±j1*k2}."""
        key = ("T", inverse)
        if key in self._cache:
            return self._cache[key]
        F, p = self.F, self.F.p
        w = self.omega_inv_int if inverse else self.omega_int
        t = np.empty((self.n2, self.n1), dtype=object)
        for k2 in range(self.n2):
            wk = pow(w, k2, p)
            v = 1
            for j1 in range(self.n1):
                t[k2, j1] = v
                v = v * wk % p
        self._cache[key] = F.encode(t)
        return self._cache[key]

    def _apply_small_dft(self, arr: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """DFT_{n1} over axis 2 of (L, n2, n1, *batch)."""
        F = self.F
        M = self._small_dft_matrix(inverse)  # (L, n1, n1)
        batch = arr.shape[3:]
        Mb = M.reshape(M.shape[0], 1, self.n1, self.n1, *([1] * len(batch)))
        prod = F.mul(Mb, arr[:, :, None])  # (L, n2, k1, j1, *b)
        acc = prod[:, :, :, 0]
        for j in range(1, self.n1):
            acc = F.add(acc, prod[:, :, :, j])
        return acc  # (L, n2, n1=k1, *b)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        F = self.F
        L = coeffs.shape[0]
        batch = coeffs.shape[2:]
        n1, n2 = self.n1, self.n2
        arr = coeffs.reshape(L, n2, n1, *batch)  # [j2, j1]
        if self.r2 is not None:
            arr = self.r2.fft(arr)
        tw = self._mid_twiddles(False).reshape(
            L, n2, n1, *([1] * len(batch))
        )
        arr = F.mul(arr, tw)
        out = self._apply_small_dft(arr, False)  # (L, k2, k1, *b)
        out = jnp.moveaxis(out, 2, 1)  # (L, k1, k2, *b)
        return out.reshape(L, self.n, *batch)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        F = self.F
        L = evals.shape[0]
        batch = evals.shape[2:]
        n1, n2 = self.n1, self.n2
        arr = evals.reshape(L, n1, n2, *batch)  # [k1, k2]
        arr = jnp.moveaxis(arr, 1, 2)  # (L, k2, k1, *b)
        arr = self._apply_small_dft(arr, True)  # inverse small DFT (axis 2)
        tw = self._mid_twiddles(True).reshape(L, n2, n1, *([1] * len(batch)))
        arr = F.mul(arr, tw)
        if self.r2 is not None:
            arr = self.r2.ifft(arr)
        return arr.reshape(L, self.n, *batch)
