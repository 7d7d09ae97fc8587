"""Sparse polynomial forms.

TPU-native analogs of the reference's sparse representations
(reference: tachyon/math/polynomials/univariate/
univariate_sparse_coefficients.h — UnivariateTerm list + Horner-free
Evaluate; tachyon/math/polynomials/multivariate/
multivariate_sparse_coefficients.h — Term = coefficient x product of
variable literals; tachyon/math/polynomials/multivariate/
linear_combination.h — LinearCombination over shared dense MLEs, with
Combine()/Evaluate()).

Design: term structure (degrees / exponent matrices) is static host
metadata; coefficients live as (L, k) Montgomery columns.  Every
evaluation vectorizes over the k terms at once — exponentiation is a
static square-and-multiply ladder driven by the host-known degree bits,
so the device graph is a fixed chain of lane-parallel muls with no
data-dependent control flow (the reference parallelizes the same maps
with absl Span chunks over OpenMP threads).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math import mle
from tachyon_tpu.math.field import PrimeField


def _tree_sum(F: PrimeField, arr: jnp.ndarray) -> jnp.ndarray:
    n = arr.shape[1]
    while n > 1:
        half = n // 2
        head = F.add(arr[:, :half], arr[:, half:2 * half])
        arr = head if n % 2 == 0 else jnp.concatenate(
            [head, arr[:, -1:]], axis=1)
        n = (n + 1) // 2
    return arr[:, 0]


def _pow_static(F: PrimeField, base: jnp.ndarray, exps: np.ndarray):
    """base: (L, k) columns; exps: host int array (k,) -> base**exps.

    One square-and-multiply ladder for ALL terms: at bit b, the terms whose
    degree has bit b multiply the running square in (static lane mask)."""
    exps = np.asarray(exps, dtype=object)
    maxbits = max((int(e).bit_length() for e in exps.ravel()), default=0)
    acc = F.ones(base.shape[1:])
    cur = base
    for b in range(maxbits):
        mask = jnp.asarray(
            np.array([(int(e) >> b) & 1 for e in exps.ravel()],
                     dtype=bool).reshape(exps.shape))
        acc = F.select(mask, F.mul(acc, cur), acc)
        if b != maxbits - 1:
            cur = F.square(cur)
    return acc


class SparseUnivariate:
    """sum_j c_j X^{d_j} with strictly increasing host-int degrees.

    (reference: univariate_sparse_coefficients.h:95)."""

    def __init__(self, F: PrimeField, degrees, coeffs: jnp.ndarray):
        self.F = F
        self.degrees = [int(d) for d in degrees]
        assert all(a < b for a, b in zip(self.degrees, self.degrees[1:]))
        assert coeffs.shape[1] == len(self.degrees)
        self.coeffs = coeffs  # (L, k) Montgomery

    @classmethod
    def from_dict(cls, F: PrimeField, terms: dict):
        degs = sorted(int(d) for d in terms)
        cf = F.encode(np.array([terms[d] % F.p for d in degs], dtype=object))
        return cls(F, degs, cf)

    def to_dict(self) -> dict:
        vals = np.asarray(self.F.decode(self.coeffs))
        return {d: int(v) for d, v in zip(self.degrees, vals) if int(v)}

    @property
    def degree(self) -> int:
        return self.degrees[-1] if self.degrees else 0

    def evaluate(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (L,) encoded point -> (L,) value; all terms in one ladder."""
        F = self.F
        if not self.degrees:
            return F.zeros(())
        zs = jnp.broadcast_to(z[:, None], self.coeffs.shape)
        powers = _pow_static(F, zs, np.array(self.degrees, dtype=object))
        return _tree_sum(F, F.mul(self.coeffs, powers))

    def to_dense(self, n: int | None = None) -> jnp.ndarray:
        F = self.F
        n = n if n is not None else self.degree + 1
        assert n > self.degree
        out = F.zeros((n,))
        idx = jnp.asarray(np.array(self.degrees, dtype=np.int64))
        return out.at[:, idx].set(self.coeffs)

    def _merge(self, other: "SparseUnivariate", negate_other: bool):
        F = self.F
        degs = sorted(set(self.degrees) | set(other.degrees))
        pos = {d: i for i, d in enumerate(degs)}
        out = F.zeros((len(degs),))
        ia = jnp.asarray(np.array([pos[d] for d in self.degrees],
                                  dtype=np.int64))
        ib = jnp.asarray(np.array([pos[d] for d in other.degrees],
                                  dtype=np.int64))
        out = out.at[:, ia].set(self.coeffs)
        oc = F.neg(other.coeffs) if negate_other else other.coeffs
        # shared degrees need a modular add, not a raw scatter-add
        upd = F.add(out[:, ib], oc)
        out = out.at[:, ib].set(upd)
        return SparseUnivariate(F, degs, out)

    def __add__(self, other):
        return self._merge(other, negate_other=False)

    def __sub__(self, other):
        return self._merge(other, negate_other=True)

    def __mul__(self, other: "SparseUnivariate"):
        F = self.F
        ka, kb = len(self.degrees), len(other.degrees)
        prod_deg = [da + db for da in self.degrees for db in other.degrees]
        cf = F.mul(self.coeffs[:, :, None],
                   other.coeffs[:, None, :]).reshape(F.L, ka * kb)
        degs = sorted(set(prod_deg))
        pos = {d: i for i, d in enumerate(degs)}
        out = F.zeros((len(degs),))
        for j, d in enumerate(prod_deg):  # k^2 static scatter-adds
            out = out.at[:, pos[d]].set(F.add(out[:, pos[d]], cf[:, j]))
        return SparseUnivariate(F, degs, out)


class SparseMultivariate:
    """sum_j c_j * prod_i x_i^{E[j, i]} — exponent matrix is host metadata
    (reference: multivariate_sparse_coefficients.h:28 Term/Literal)."""

    def __init__(self, F: PrimeField, exponents: np.ndarray,
                 coeffs: jnp.ndarray):
        self.F = F
        self.E = np.array([[int(e) for e in row] for row in exponents],
                          dtype=object)  # (k, n_vars)
        assert coeffs.shape[1] == self.E.shape[0]
        self.coeffs = coeffs

    @classmethod
    def from_terms(cls, F: PrimeField, terms):
        """terms: list of (coeff_int, {var_index: exponent})."""
        nv = 1 + max((max(lit, default=-1) for _, lit in terms), default=-1)
        E = np.zeros((len(terms), max(nv, 1)), dtype=object)
        for j, (_, lit) in enumerate(terms):
            for v, e in lit.items():
                E[j, v] = int(e)
        cf = F.encode(np.array([c % F.p for c, _ in terms], dtype=object))
        return cls(F, E, cf)

    @property
    def num_vars(self) -> int:
        return self.E.shape[1]

    def evaluate(self, point: list) -> jnp.ndarray:
        """point: list of (L,) encoded values, one per variable."""
        F = self.F
        k, nv = self.E.shape
        if k == 0:
            return F.zeros(())
        acc = self.coeffs
        for i in range(nv):
            col = self.E[:, i]
            if all(int(e) == 0 for e in col):
                continue
            xs = jnp.broadcast_to(point[i][:, None], acc.shape)
            acc = F.mul(acc, _pow_static(F, xs, col))
        return _tree_sum(F, acc)


class LinearCombination:
    """sum_j c_j * prod_t M_{j,t}(x) over shared dense MLE tables
    (reference: linear_combination.h:26 — Combine() sums the product term
    over the whole hypercube; Evaluate() evaluates at one point)."""

    def __init__(self, F: PrimeField, num_vars: int):
        self.F = F
        self.nv = num_vars
        self.mles: list[jnp.ndarray] = []  # each (L, 2^nv)
        self.terms: list[tuple[int, list[int]]] = []

    def add_mle(self, evals: jnp.ndarray) -> int:
        assert mle.num_vars(evals) == self.nv
        self.mles.append(evals)
        return len(self.mles) - 1

    def add_term(self, coeff: int, mle_indices: list[int]):
        self.terms.append((coeff % self.F.p, list(mle_indices)))

    def combine(self) -> jnp.ndarray:
        """sum over the hypercube — the sumcheck claim value."""
        F = self.F
        total = F.zeros((1 << self.nv,))
        for coeff, idxs in self.terms:
            prod = F.full((1 << self.nv,), coeff)
            for t in idxs:
                prod = F.mul(prod, self.mles[t])
            total = F.add(total, prod)
        return _tree_sum(F, total)

    def evaluate(self, point: list) -> jnp.ndarray:
        F = self.F
        vals = [mle.evaluate(F, m, point) for m in self.mles]
        acc = F.zeros(())
        for coeff, idxs in self.terms:
            prod = F.full((), coeff)
            for t in idxs:
                prod = F.mul(prod, vals[t])
            acc = F.add(acc, prod)
        return acc
