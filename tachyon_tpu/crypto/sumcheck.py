"""Multilinear sumcheck prover/verifier (arkworks-style).

Analog of the reference's sumcheck
(reference: tachyon/crypto/sumcheck/multilinear/sumcheck_prover.h Round,
sumcheck_verifier.h).  Proves sum over the boolean hypercube of a product
of up to `d` multilinear polynomials.  Round evaluations are vectorized over
the table; challenge plumbing is host-side via a caller-provided sampler.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math import mle
from tachyon_tpu.math.field import PrimeField


class SumcheckProof(NamedTuple):
    round_evals: tuple  # per round: tuple of d+1 ints (evals of g_i at 0..d)
    claimed_sum: int


def prove(
    F: PrimeField,
    mles: list[jnp.ndarray],
    sample_challenge: Callable[[list[int]], int],
) -> tuple[SumcheckProof, list[int]]:
    """mles: list of (L, 2^k) tables (the product is being summed).

    `sample_challenge(round_evals)` -> int challenge (Fiat-Shamir hook).
    Returns (proof, challenges).
    """
    d = len(mles)
    k = mle.num_vars(mles[0])
    p = F.p

    # claimed sum = sum over hypercube of prod_i f_i(x)
    prod = mles[0]
    for m in mles[1:]:
        prod = F.mul(prod, m)
    total = _tree_sum(F, prod)
    claimed = int(F.decode(total))

    cur = [m for m in mles]
    rounds = []
    challenges = []
    for _ in range(k):
        # g(t) = sum_{x' in H^{k-1}} prod_i f_i(t, x'): degree d; send
        # evaluations at t = 0..d
        evals_t = []
        for t in range(d + 1):
            tc = F.full((), t)
            fixed = [mle.fix_first_variable(F, m, tc) for m in cur]
            pr = fixed[0]
            for m in fixed[1:]:
                pr = F.mul(pr, m)
            evals_t.append(int(F.decode(_tree_sum(F, pr))))
        r = sample_challenge(evals_t) % p
        challenges.append(r)
        rc = F.encode(np.array(r, dtype=object))
        cur = [mle.fix_first_variable(F, m, rc) for m in cur]
        rounds.append(tuple(evals_t))
    return SumcheckProof(tuple(rounds), claimed), challenges


def verify(
    F: PrimeField,
    proof: SumcheckProof,
    final_evals: list[int],
    sample_challenge: Callable[[list[int]], int],
) -> bool:
    """final_evals: prover-claimed f_i(r) values (checked by the caller
    against commitments / direct evaluation)."""
    p = F.p
    expected = proof.claimed_sum % p
    challenges = []
    d = None
    for evals_t in proof.round_evals:
        d = len(evals_t) - 1
        # g(0) + g(1) must equal the running claim
        if (evals_t[0] + evals_t[1]) % p != expected:
            return False
        r = sample_challenge(list(evals_t)) % p
        challenges.append(r)
        expected = _interp_eval(list(evals_t), r, p)
    final = 1
    for v in final_evals:
        final = final * v % p
    return final == expected


def _interp_eval(ys, x, p):
    """evaluate the degree-d poly through (0..d, ys) at x (exact ints)."""
    d = len(ys) - 1
    acc = 0
    for i in range(d + 1):
        num, den = 1, 1
        for j in range(d + 1):
            if i == j:
                continue
            num = num * (x - j) % p
            den = den * (i - j) % p
        acc = (acc + ys[i] * num * pow(den, p - 2, p)) % p
    return acc


def _tree_sum(F: PrimeField, arr: jnp.ndarray) -> jnp.ndarray:
    n = arr.shape[1]
    while n > 1:
        half = n // 2
        arr = F.add(arr[:, :half], arr[:, half : 2 * half])
        n = half
    return arr[:, 0]
