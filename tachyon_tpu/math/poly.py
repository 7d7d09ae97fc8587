"""Dense univariate polynomial helpers over vectorized fields.

Analog of the reference's univariate polynomial ops
(reference: tachyon/math/polynomials/univariate/univariate_polynomial.h,
univariate_evaluations.h, support_poly_operators.h) in array form: a
polynomial is its (L, n) coefficient array (low-degree first), Montgomery
form; evaluations are (L, n) arrays over a Radix2Domain.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.math.field import PrimeField


def eval_at(F: PrimeField, coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation: coeffs (L, n), z (L,) -> (L,). lax.scan (n steps)."""
    rev = coeffs[:, ::-1]

    def body(acc, c):
        return F.add(F.mul(acc, z), c), None

    acc, _ = jax.lax.scan(body, F.zeros(()), jnp.moveaxis(rev, 1, 0))
    return acc


def eval_at_fast(F: PrimeField, coeffs: jnp.ndarray, z_int: int) -> jnp.ndarray:
    """Evaluation via a z-powers table + log-depth tree sum (O(n) parallel
    muls instead of an n-step sequential Horner scan)."""
    n = coeffs.shape[1]
    tab = F.ones((1,))
    cur = F.encode(np.array(z_int, dtype=object))[:, None]
    while tab.shape[-1] < n:
        tab = jnp.concatenate([tab, F.mul(tab, cur)], axis=-1)
        cur = F.square(cur)
    terms = F.mul(coeffs, tab[:, :n])
    m = 1 << max(n - 1, 0).bit_length()
    if m != n:
        terms = jnp.concatenate(
            [terms, jnp.zeros((terms.shape[0], m - n), terms.dtype)], axis=1
        )
    while m > 1:
        half = m // 2
        terms = F.add(terms[:, :half], terms[:, half:])
        m = half
    return terms[:, 0]


def divide_by_linear(
    F: PrimeField, coeffs: jnp.ndarray, z: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(q, rem) with p(x) = q(x)(x - z) + rem — synthetic division.

    Sequential scan from the top coefficient (n steps).
    """
    n = coeffs.shape[1]
    rev = jnp.moveaxis(coeffs[:, ::-1], 1, 0)  # (n, L)

    def body(acc, c):
        out = acc
        nxt = F.add(F.mul(acc, z), c)
        return nxt, out

    rem, qs_rev = jax.lax.scan(body, F.zeros(()), rev)
    # qs_rev[i] corresponds to coefficient of degree n-1-i of q (with q of
    # degree n-2); first output is 0*x^{n-1} artifact -> drop index 0
    q = jnp.moveaxis(qs_rev, 0, 1)[:, ::-1]  # (L, n): [junk q_0 ... q_{n-2}]?
    return q[:, : n - 1] if n > 1 else F.zeros((0,)), rem


def add(F: PrimeField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    na, nb = a.shape[1], b.shape[1]
    if na < nb:
        a = jnp.concatenate([a, jnp.zeros((a.shape[0], nb - na), a.dtype)], 1)
    elif nb < na:
        b = jnp.concatenate([b, jnp.zeros((b.shape[0], na - nb), b.dtype)], 1)
    return F.add(a, b)


def scale(F: PrimeField, a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return F.mul(a, s[:, None] if s.ndim == 1 else s)
