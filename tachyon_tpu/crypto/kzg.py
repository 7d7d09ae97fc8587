"""KZG polynomial commitment over BN254 (+ batch opening).

Analog of the reference's KZG / SHPlonk stack
(reference: tachyon/crypto/commitments/kzg/kzg.h Commit/CommitLagrange,
shplonk.h, gwc.h).  Commit = MSM on TPU; the pairing side of verification is
exact host arithmetic (tachyon_tpu/math/pairing_bn254.py).

SRS here is generated from a test tau ("unsafe setup", the reference's
tachyon_bn254_kzg_srs unsafe-setup path); production SRS files load through
the same arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.fields.spec import int_to_limbs
from tachyon_tpu.math import curves, poly
from tachyon_tpu.math import pairing_bn254 as pairing
from tachyon_tpu.math.ec import AffinePoint
from tachyon_tpu.math.msm import msm
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.zk.groth16.prover import (
    _py_g1_add,
    _py_g1_mul,
    _py_g2_add,
    _py_g2_mul,
)


class KZGParams(NamedTuple):
    g1_powers: AffinePoint  # (L, n) coords: [tau^i]G1
    g1_lagrange: AffinePoint  # [L_i(tau)]G1 for the domain
    g2_gen: tuple  # G2 affine ints
    g2_tau: tuple  # [tau]G2
    n: int


def unsafe_setup(n: int, tau: int) -> KZGParams:
    """Powers-of-tau SRS from an explicit secret (test/dev only)."""
    g1 = curves.bn254_g1()
    Fr = curves.bn254_fr()
    p = Fr.p
    taus = np.empty((n,), dtype=object)
    acc = 1
    for i in range(n):
        taus[i] = acc
        acc = acc * tau % p
    Ls = Fr.spec.L
    sl = jnp.asarray(np.stack([int_to_limbs(int(t), Ls) for t in taus], -1))
    pts = g1.to_affine(g1.scalar_mul(g1.generator((n,)), sl))

    # Lagrange basis: L_i(tau) = ifft of power vector -> scalar muls
    dom = Radix2Domain(Fr, n)
    coeff = dom.ifft(Fr.encode(taus))  # evals of x^? no: values tau^i ARE the
    # evaluations of the identity-ish... we need L_i(tau) = IFFT twiddle trick:
    # [L_0(tau), .., L_{n-1}(tau)] = IFFT_n applied to [1, tau, tau^2, ...]
    from tachyon_tpu.ops import mont

    lag_std = mont.mont_reduce(Fr.spec, coeff)
    lag = g1.to_affine(g1.scalar_mul(g1.generator((n,)), lag_std))

    G2 = (
        (
            10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634,
        ),
        (
            8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531,
        ),
    )
    return KZGParams(pts, lag, G2, _py_g2_mul(G2, tau), n)


def commit(params: KZGParams, coeffs_std: jnp.ndarray):
    """coeffs_std: (L, k<=n) standard-form limb scalars -> XYZZ point."""
    g1 = curves.bn254_g1()
    k = coeffs_std.shape[1]
    pts = AffinePoint(
        params.g1_powers.x[:, :k],
        params.g1_powers.y[:, :k],
        params.g1_powers.inf[:k],
    )
    return msm(g1, pts, coeffs_std)


def commit_lagrange(params: KZGParams, evals_std: jnp.ndarray):
    g1 = curves.bn254_g1()
    k = evals_std.shape[1]
    assert k == params.n
    return msm(g1, params.g1_lagrange, evals_std)


def to_int_point(acc) -> tuple | None:
    g1 = curves.bn254_g1()
    Fq = curves.bn254_fq()
    aff = g1.to_affine(acc)
    if bool(np.asarray(aff.inf)):
        return None
    return (int(Fq.decode(aff.x)), int(Fq.decode(aff.y)))


class KZGProof(NamedTuple):
    value: int  # p(z)
    pi: tuple  # quotient commitment (G1 ints)


def open_at(params: KZGParams, coeffs_mont: jnp.ndarray, z_int: int) -> KZGProof:
    """Single-point opening: pi = [(p(x)-p(z))/(x-z)]_1."""
    Fr = curves.bn254_fr()
    from tachyon_tpu.ops import mont

    z = Fr.encode(np.array(z_int, dtype=object))
    q, rem = poly.divide_by_linear(Fr, coeffs_mont, z)
    q_std = mont.mont_reduce(Fr.spec, q)
    pi = commit(params, q_std)
    return KZGProof(int(Fr.decode(rem)), to_int_point(pi))


def verify(
    params: KZGParams, commitment: tuple, z_int: int, proof: KZGProof
) -> bool:
    """e(C - [v]G1, G2) == e(pi, [tau]G2 - [z]G2)."""
    G1 = (1, 2)
    lhs_p = _py_g1_add(commitment, _py_g1_mul((G1[0], (-G1[1]) % pairing.P), proof.value))
    # e(lhs, G2) * e(-pi, tau2 - z G2) == 1
    tz = _py_g2_add(params.g2_tau, _py_g2_mul(_g2_neg(params.g2_gen), z_int))
    neg_pi = (proof.pi[0], (-proof.pi[1]) % pairing.P) if proof.pi else None
    return pairing.pairing_product_is_one([(lhs_p, params.g2_gen), (neg_pi, tz)])


def _g2_neg(q):
    return (q[0], pairing.f2_neg(q[1]))
