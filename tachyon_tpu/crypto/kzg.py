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


def _mont64(p: int):
    """reference wire format constants: 4x u64 little-endian limbs holding
    the coordinate in Montgomery form w.r.t. R = 2^256."""
    R = (1 << 256) % p
    return R, pow(R, p - 2, p)


def _read_fq(buf: memoryview, off: int, p: int, rinv: int) -> tuple[int, int]:
    v = int.from_bytes(bytes(buf[off:off + 32]), "little") * rinv % p
    return v, off + 32


def load_params(data: bytes) -> KZGParams:
    """Parse a halo2 KZG params blob — the exact byte stream the reference's
    prover-from-params C API consumes (reference: c/zk/plonk/halo2/
    buffer_reader.h:488-523 — u32 k; 2^k G1 powers-of-tau; 2^k Lagrange
    G1 points; g2; s_g2; every coordinate 4x u64 LE Montgomery limbs).

    This is the production SRS path: point coordinates parse on host and
    upload once as encoded (L, n) columns; commits then run the device MSM.
    """
    g1 = curves.bn254_g1()
    Fq = g1.F
    p = Fq.p
    _, rinv = _mont64(p)
    buf = memoryview(data)
    k = int.from_bytes(bytes(buf[:4]), "little")
    n = 1 << k
    off = 4

    def read_g1_vec(count):
        xs = np.empty((count,), dtype=object)
        ys = np.empty((count,), dtype=object)
        nonlocal off
        for i in range(count):
            xs[i], off = _read_fq(buf, off, p, rinv)
            ys[i], off = _read_fq(buf, off, p, rinv)
        inf = np.array([x == 0 and y == 0 for x, y in zip(xs, ys)])
        return AffinePoint(Fq.encode(xs), Fq.encode(ys), jnp.asarray(inf))

    powers = read_g1_vec(n)
    lagrange = read_g1_vec(n)

    def read_g2():
        nonlocal off
        x0, off = _read_fq(buf, off, p, rinv)
        x1, off = _read_fq(buf, off, p, rinv)
        y0, off = _read_fq(buf, off, p, rinv)
        y1, off = _read_fq(buf, off, p, rinv)
        return ((x0, x1), (y0, y1))

    g2 = read_g2()
    s_g2 = read_g2()
    assert off == len(buf), (off, len(buf))
    return KZGParams(powers, lagrange, g2, s_g2, n)


def load_params_file(path: str) -> KZGParams:
    with open(path, "rb") as f:
        return load_params(f.read())


def dump_params(params: KZGParams) -> bytes:
    """Inverse of load_params (same reference wire format) — lets an
    unsafe-setup SRS round-trip through the production path in tests."""
    g1 = curves.bn254_g1()
    Fq = g1.F
    p = Fq.p
    R, _ = _mont64(p)
    out = bytearray()
    k = params.n.bit_length() - 1
    assert 1 << k == params.n
    out += int(k).to_bytes(4, "little")

    def put_fq(v):
        out.extend((int(v) * R % p).to_bytes(32, "little"))

    for pts in (params.g1_powers, params.g1_lagrange):
        xs = np.asarray(Fq.decode(pts.x))
        ys = np.asarray(Fq.decode(pts.y))
        inf = np.asarray(pts.inf)
        for i in range(params.n):
            put_fq(0 if inf[i] else xs[i])
            put_fq(0 if inf[i] else ys[i])
    for q in (params.g2_gen, params.g2_tau):
        (x0, x1), (y0, y1) = q
        for v in (x0, x1, y0, y1):
            put_fq(v)
    return bytes(out)


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
