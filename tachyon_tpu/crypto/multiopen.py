"""SHPlonk (BDFG20) and GWC19 multi-point KZG opening schemes.

Analog of the reference's kzg family
(reference: tachyon/crypto/commitments/kzg/shplonk.h DoCreateOpeningProof/
DoVerifyOpeningProof, gwc.h, polynomial_openings.h).  The prover's poly
algebra (linear combination, vanishing division) runs on device; challenge
plumbing and the verifier's tiny point combos are exact host arithmetic.

API: an opening request is (poly_or_commitment, points, values).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import kzg as kzg_mod
from tachyon_tpu.crypto.transcript import TranscriptReader, TranscriptWriter
from tachyon_tpu.math import curves, poly as poly_mod
from tachyon_tpu.math import pairing_bn254 as pairing
from tachyon_tpu.ops import mont
from tachyon_tpu.zk.groth16.prover import _py_g1_add, _py_g1_mul, _py_g2_add, _py_g2_mul


class ProverOpening(NamedTuple):
    coeffs: jnp.ndarray  # (L, n) Montgomery coefficient form
    points: tuple  # python ints


class VerifierOpening(NamedTuple):
    commitment: tuple | None  # G1 int point
    points: tuple
    values: tuple  # claimed evals, python ints


def _lagrange_interp(points, values, p):
    """host exact Lagrange interpolation -> coefficient list (ints)."""
    k = len(points)
    coeffs = [0] * k
    for i, (xi, yi) in enumerate(zip(points, values)):
        # basis poly: prod_{j!=i} (X - xj) / (xi - xj)
        basis = [1]
        denom = 1
        for j, xj in enumerate(points):
            if j == i:
                continue
            denom = denom * (xi - xj) % p
            new = [0] * (len(basis) + 1)
            for t, c in enumerate(basis):
                new[t] = (new[t] - c * xj) % p
                new[t + 1] = (new[t + 1] + c) % p
            basis = new
        scale = yi * pow(denom, p - 2, p) % p
        for t in range(len(basis)):
            coeffs[t] = (coeffs[t] + basis[t] * scale) % p
    return coeffs


def _eval_host(coeffs_ints, x, p):
    acc = 0
    for c in reversed(coeffs_ints):
        acc = (acc * x + c) % p
    return acc


def _vanishing_eval(roots, x, p):
    acc = 1
    for r in roots:
        acc = acc * (x - r) % p
    return acc


class SHPlonk:
    """reference: shplonk.h:85."""

    def __init__(self, params: kzg_mod.KZGParams):
        self.params = params
        self.Fr = curves.bn254_fr()

    # ---------------------------------------------------------------- prove
    def create_opening_proof(
        self, openings: Sequence[ProverOpening], w: TranscriptWriter
    ):
        Fr = self.Fr
        p = Fr.p
        # group by point set
        groups: dict[tuple, list[int]] = {}
        for i, o in enumerate(openings):
            groups.setdefault(tuple(o.points), []).append(i)
        group_list = list(groups.items())
        super_points = sorted({pt for o in openings for pt in o.points})

        y = w.squeeze_challenge()
        # H_i = sum_j y^j (p_j - R_j) / Z_points
        h_polys = []
        r_polys = []  # per group: list of R_j coefficient int lists
        for points, idxs in group_list:
            acc = None
            rs = []
            for k, idx in enumerate(idxs):
                coeffs = openings[idx].coeffs
                vals = [
                    int(Fr.decode(poly_mod.eval_at_fast(Fr, coeffs, pt)))
                    for pt in points
                ]
                r = _lagrange_interp(list(points), vals, p)
                rs.append(r)
                term = coeffs
                # term -= R (pad R)
                r_enc = Fr.encode(np.array(r + [0] * (coeffs.shape[1] - len(r)), dtype=object))
                term = Fr.sub(term, r_enc)
                if k > 0:
                    yk = Fr.encode(np.array(pow(y, k, p), dtype=object))
                    term = Fr.mul(term, yk[:, None])
                acc = term if acc is None else Fr.add(acc, term)
            # divide by Z = prod (X - pt)
            q = acc
            for pt in points:
                z = Fr.encode(np.array(pt, dtype=object))
                q, rem = poly_mod.divide_by_linear(Fr, q, z)
                # rem must be 0
            h_polys.append(q)
            r_polys.append(rs)

        v = w.squeeze_challenge()
        # H = sum v^i H_i
        h = None
        maxlen = max(hp.shape[1] for hp in h_polys)
        for i, hp in enumerate(h_polys):
            t = hp
            if i > 0:
                vk = Fr.encode(np.array(pow(v, i, p), dtype=object))
                t = Fr.mul(t, vk[:, None])
            h = t if h is None else poly_mod.add(Fr, h, t)
        h_std = mont.mont_reduce(Fr.spec, h)
        h_cm = kzg_mod.to_int_point(kzg_mod.commit(self.params, h_std))
        w.write_point(h_cm)

        u = w.squeeze_challenge()
        # L = sum_i v^i z_diff_i (sum_j y^j (p_j - R_j(u))) - Z_T(u) H
        l = None
        first_z_diff = None
        for gi, (points, idxs) in enumerate(group_list):
            diffs = [pt for pt in super_points if pt not in points]
            z_diff = _vanishing_eval(diffs, u, p)
            if gi == 0:
                first_z_diff = z_diff
            acc = None
            for k, idx in enumerate(idxs):
                coeffs = openings[idx].coeffs
                ru = _eval_host(r_polys[gi][k], u, p)
                c0 = Fr.encode(np.array(ru, dtype=object))
                term = jnp.concatenate(
                    [Fr.sub(coeffs[:, :1], c0[:, None]), coeffs[:, 1:]], axis=1
                )
                if k > 0:
                    yk = Fr.encode(np.array(pow(y, k, p), dtype=object))
                    term = Fr.mul(term, yk[:, None])
                acc = term if acc is None else Fr.add(acc, term)
            scale = pow(v, gi, p) * z_diff % p
            sc = Fr.encode(np.array(scale, dtype=object))
            acc = Fr.mul(acc, sc[:, None])
            l = acc if l is None else poly_mod.add(Fr, l, acc)
        zt_u = _vanishing_eval(super_points, u, p)
        zt = Fr.encode(np.array(zt_u, dtype=object))
        l = poly_mod.add(Fr, l, Fr.neg(Fr.mul(h, zt[:, None])))
        # Q = L / (X - u) / first_z_diff
        uq = Fr.encode(np.array(u, dtype=object))
        q, rem = poly_mod.divide_by_linear(Fr, l, uq)
        inv_fzd = pow(first_z_diff, p - 2, p)
        q = Fr.mul(q, Fr.encode(np.array(inv_fzd, dtype=object))[:, None])
        q_std = mont.mont_reduce(Fr.spec, q)
        q_cm = kzg_mod.to_int_point(kzg_mod.commit(self.params, q_std))
        w.write_point(q_cm)

    # ---------------------------------------------------------------- verify
    def verify_opening_proof(
        self, openings: Sequence[VerifierOpening], r: TranscriptReader
    ) -> bool:
        params = self.params
        p = self.Fr.p
        groups: dict[tuple, list[int]] = {}
        for i, o in enumerate(openings):
            groups.setdefault(tuple(o.points), []).append(i)
        group_list = list(groups.items())
        super_points = sorted({pt for o in openings for pt in o.points})

        y = r.squeeze_challenge()
        v = r.squeeze_challenge()
        h_cm = r.read_point()
        u = r.squeeze_challenge()
        q_cm = r.read_point()

        G1 = (1, 2)
        first_z_diff_inv = None
        first_z = None
        normalized_l = []
        for gi, (points, idxs) in enumerate(group_list):
            diffs = [pt for pt in super_points if pt not in points]
            z_diff = _vanishing_eval(diffs, u, p)
            if gi == 0:
                first_z = _vanishing_eval(list(points), u, p)
                first_z_diff_inv = pow(z_diff, p - 2, p)
                norm = 1
            else:
                norm = z_diff * first_z_diff_inv % p
            lc = None
            for idx in reversed(idxs):
                o = openings[idx]
                ru = _eval_host(
                    _lagrange_interp(list(o.points), list(o.values), p), u, p
                )
                delta = _py_g1_add(
                    o.commitment, _py_g1_mul((G1[0], (-G1[1]) % pairing.P), ru)
                )
                lc = delta if lc is None else _py_g1_add(_py_g1_mul(lc, y), delta)
            lc = _py_g1_mul(lc, norm)
            normalized_l.append(lc)
        # P = sum v^i L_i - first_z * H + u * Q
        acc = None
        for lc in reversed(normalized_l):
            acc = lc if acc is None else _py_g1_add(_py_g1_mul(acc, v), lc)
        acc = _py_g1_add(acc, _py_g1_mul(_neg(h_cm), first_z))
        acc = _py_g1_add(acc, _py_g1_mul(q_cm, u))
        # e(Q, [tau]_2) * e(P, -G2) == 1
        return pairing.pairing_product_is_one(
            [(q_cm, params.g2_tau), (acc, _g2_neg(params.g2_gen))]
        )


class GWC:
    """reference: gwc.h:84."""

    def __init__(self, params: kzg_mod.KZGParams):
        self.params = params
        self.Fr = curves.bn254_fr()

    def create_opening_proof(
        self, openings: Sequence[ProverOpening], w: TranscriptWriter
    ):
        Fr = self.Fr
        p = Fr.p
        v = w.squeeze_challenge()
        # group by single point
        groups: dict[int, list[int]] = {}
        for i, o in enumerate(openings):
            for pt in o.points:
                groups.setdefault(pt, []).append(i)
        for pt, idxs in groups.items():
            acc = None
            for k, idx in enumerate(idxs):
                term = openings[idx].coeffs
                if k > 0:
                    vk = Fr.encode(np.array(pow(v, k, p), dtype=object))
                    term = Fr.mul(term, vk[:, None])
                acc = term if acc is None else Fr.add(acc, term)
            z = Fr.encode(np.array(pt, dtype=object))
            q, rem = poly_mod.divide_by_linear(Fr, acc, z)
            q_std = mont.mont_reduce(Fr.spec, q)
            cm = kzg_mod.to_int_point(kzg_mod.commit(self.params, q_std))
            w.write_point(cm)

    def verify_opening_proof(
        self, openings: Sequence[VerifierOpening], r: TranscriptReader
    ) -> bool:
        params = self.params
        p = self.Fr.p
        v = r.squeeze_challenge()
        groups: dict[int, list[int]] = {}
        for i, o in enumerate(openings):
            for j, pt in enumerate(o.points):
                groups.setdefault(pt, []).append((i, j))
        witnesses = [r.read_point() for _ in groups]
        u = r.squeeze_challenge()

        G1 = (1, 2)
        opening_multi = 0
        commitment_multi = None
        witness_with_aux = None
        witness = None
        pow_u = 1
        for gi, (pt, pairs) in enumerate(groups.items()):
            ob = 0
            cb = None
            for (i, j) in reversed(pairs):
                o = openings[i]
                ob = (ob * v + o.values[j]) % p
                cb = (
                    o.commitment
                    if cb is None
                    else _py_g1_add(_py_g1_mul(cb, v), o.commitment)
                )
            commitment_multi = _py_g1_add(commitment_multi, _py_g1_mul(cb, pow_u))
            opening_multi = (opening_multi + ob * pow_u) % p
            witness_with_aux = _py_g1_add(
                witness_with_aux, _py_g1_mul(witnesses[gi], pow_u * pt % p)
            )
            witness = _py_g1_add(witness, _py_g1_mul(witnesses[gi], pow_u))
            pow_u = pow_u * u % p
        rhs = _py_g1_add(
            _py_g1_add(witness_with_aux, commitment_multi),
            _py_g1_mul((G1[0], (-G1[1]) % pairing.P), opening_multi),
        )
        return pairing.pairing_product_is_one(
            [(witness, params.g2_tau), (rhs, _g2_neg(params.g2_gen))]
        )


def _neg(pt):
    return None if pt is None else (pt[0], (-pt[1]) % pairing.P)


def _g2_neg(q):
    return (q[0], pairing.f2_neg(q[1]))
