"""Dense multilinear extensions (sumcheck substrate).

Analog of the reference's multilinear polynomial layer
(reference: tachyon/math/polynomials/multivariate/
multilinear_dense_evaluations.h, multilinear_extension.h).
An MLE over k variables is its (L, 2^k) evaluation table on the boolean
hypercube; all ops vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp

from tachyon_tpu.math.field import PrimeField


def num_vars(evals: jnp.ndarray) -> int:
    n = evals.shape[1]
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def fix_first_variable(F: PrimeField, evals: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """f(x1..xk) -> f(r, x2..xk): table halves.

    Variable order: first variable is the LOW bit (index parity), matching
    the reference's FixVariables order.
    """
    lo = evals[:, 0::2]
    hi = evals[:, 1::2]
    # (1-r) lo + r hi = lo + r (hi - lo)
    return F.add(lo, F.mul(r[:, None] if r.ndim == 1 else r, F.sub(hi, lo)))


def evaluate(F: PrimeField, evals: jnp.ndarray, point: list) -> jnp.ndarray:
    """full evaluation at a point (list of (L,) field arrays)."""
    cur = evals
    for r in point:
        cur = fix_first_variable(F, cur, r)
    return cur[:, 0]
