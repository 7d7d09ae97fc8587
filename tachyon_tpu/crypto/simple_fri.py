"""SimpleFRI: textbook single-polynomial FRI low-degree test.

Analog of the reference's educational/bench FRI
(reference: tachyon/crypto/commitments/fri/simple_fri.h — commit folds the
polynomial layer by layer to a constant, each layer merkle-committed;
openings reveal sibling pairs per query).  The production PCS is
TwoAdicFRIPCS (crypto/fri.py); SimpleFRI is the minimal reference shape,
kept for parity and as the didactic fixture.

All folding is device-vectorized: one layer fold = one fused elementwise
pass over the evaluation vector.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import merkle
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.ntt import Radix2Domain


class SimpleFRIProof(NamedTuple):
    layer_roots: list  # per layer merkle root (L, D) arrays
    final_value: int  # the constant the last layer folds to
    query_paths: list  # per query: list of (left, right, proof) per layer


class SimpleFRI:
    """Commit/verify a low-degree claim for one polynomial's evals over a
    two-adic domain, folding by challenger-sampled betas."""

    def __init__(self, F: PrimeField, hasher, num_queries: int = 16):
        self.F = F
        self.h = hasher  # Poseidon2 instance (merkle + challenger)
        self.num_queries = num_queries

    def _fold(self, evals: jnp.ndarray, beta: int, dom: Radix2Domain):
        """f'(x^2) = (f(x) + f(-x))/2 + beta (f(x) - f(-x))/(2x):
        even/odd split in evaluation form."""
        F = self.F
        n = evals.shape[1]
        half = n // 2
        lo = evals[:, :half]
        hi = evals[:, half:]  # f(-x) for x in the first half
        s = F.add(lo, hi)
        d = F.sub(lo, hi)
        p = F.p
        inv2 = pow(2, p - 2, p)
        # 1/(2 x_i) for the first half points
        xs = [pow(dom.omega_int, i, p) for i in range(half)]
        inv2x = F.encode(np.array(
            [inv2 * pow(x, p - 2, p) % p for x in xs], dtype=object))
        even = F.mul(s, F.full((), inv2)[:, None])
        odd = F.mul(d, inv2x)
        return F.add(even, F.mul(odd, F.full((), beta)[:, None]))

    def commit(self, evals: jnp.ndarray, challenger: DuplexChallenger):
        """evals: (L, n) polynomial evaluations over the radix-2 domain.
        Returns (SimpleFRIProof skeleton, per-layer trees+evals)."""
        F = self.F
        n = evals.shape[1]
        layers = []
        roots = []
        cur = evals
        while cur.shape[1] > 1:
            tree = merkle.build(self.h, [cur[:, :, None]])
            layers.append((cur, tree))
            roots.append(tree.root())
            challenger.observe_many(
                [int(v) for v in np.asarray(
                    F.decode(tree.root())).reshape(-1)]
            )
            beta = challenger.sample()
            dom = Radix2Domain(F, cur.shape[1])
            cur = self._fold(cur, beta, dom)
        final_value = int(F.decode(cur[:, 0]))
        challenger.observe(final_value)

        # query phase
        query_paths = []
        for _ in range(self.num_queries):
            idx = challenger.sample() % n
            path = []
            i = idx
            for cur_evals, tree in layers:
                half = cur_evals.shape[1] // 2
                j = i % half
                # sibling-pair openings; values travel inside the merkle
                # proofs so the verifier is bound to committed data
                path.append(
                    (merkle.open_at(tree, j), merkle.open_at(tree, j + half))
                )
                i = j
            query_paths.append((idx, path))
        return SimpleFRIProof(roots, final_value, query_paths)

    def verify(self, n: int, proof: SimpleFRIProof,
               challenger: DuplexChallenger) -> bool:
        F = self.F
        p = F.p
        betas = []
        for root in proof.layer_roots:
            challenger.observe_many(
                [int(v) for v in np.asarray(F.decode(root)).reshape(-1)]
            )
            betas.append(challenger.sample())
        challenger.observe(proof.final_value)

        for _q, (idx, path) in enumerate(proof.query_paths):
            expect_idx = challenger.sample() % n
            if idx != expect_idx:
                return False
            m = n
            i = idx
            carried = None  # folded value that must match the next layer
            for li, (left, right, pr_l, pr_r) in enumerate(path):
                half = m // 2
                j = i % half
                root = proof.layer_roots[li]
                if not merkle.verify(self.h, root, j, pr_l):
                    return False
                if not merkle.verify(self.h, root, j + half, pr_r):
                    return False
                here = left if i < half else right
                if carried is not None and here != carried:
                    return False
                dom = Radix2Domain(F, m)
                x = pow(dom.omega_int, j, p)
                inv2 = pow(2, p - 2, p)
                even = (left + right) * inv2 % p
                odd = (left - right) * inv2 % p * pow(x, p - 2, p) % p
                carried = (even + betas[li] * odd) % p
                m = half
                i = j
            if carried != proof.final_value:
                return False
        return True
