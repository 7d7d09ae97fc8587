"""Groth16 prover/verifier for circom zkeys, TPU-native.

Analog of the reference's circom Groth16 pipeline
(reference: vendors/circom/prover_main.cc CreateProof,
vendors/circom/circomlib/circuit/quadratic_arithmetic_program.h
WitnessMapFromMatrices, tachyon/zk/r1cs/groth16/prove.h
CreateProofWithAssignment, verify.h).

Pipeline (hot path all on TPU):
  witness map:   segmented field-sum of coefficient contributions (the
                 reference's locked scatter loop becomes a sort + segmented
                 scan), 3 iFFT + 3 coset FFT, h = A.B - C on the w_{2n} coset;
  proof:         3 G1 MSMs + 1 G2 MSM (+2 more with ZK randomness);
  verification:  host-side exact pairing product (4 Miller loops).
"""
from __future__ import annotations

import secrets
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.io.zkey import ZKeyData
from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import AffinePoint, PointXYZZ
from tachyon_tpu.math.msm import msm
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.math import pairing_bn254 as pairing
from tachyon_tpu.fields.spec import int_to_limbs


class Groth16Proof(NamedTuple):
    a: tuple  # G1 affine ints (x, y)
    b: tuple  # G2 affine ((x0,x1),(y0,y1))
    c: tuple  # G1


def _g1_points(curve, arr: np.ndarray) -> AffinePoint:
    """(L, n, 2) Montgomery limb array -> device AffinePoint."""
    x = jnp.asarray(arr[:, :, 0])
    y = jnp.asarray(arr[:, :, 1])
    inf = jnp.all((arr[:, :, 0] == 0) & (arr[:, :, 1] == 0), axis=0)
    return AffinePoint(x, y, jnp.asarray(inf))


def _g2_points(curve, arr: np.ndarray) -> AffinePoint:
    x = jnp.stack([jnp.asarray(arr[:, :, 0]), jnp.asarray(arr[:, :, 1])], 0)
    y = jnp.stack([jnp.asarray(arr[:, :, 2]), jnp.asarray(arr[:, :, 3])], 0)
    inf = jnp.all(arr == 0, axis=(0, 2))
    return AffinePoint(x, y, jnp.asarray(inf))


class CircomGroth16Prover:
    def __init__(self, zkey: ZKeyData):
        self.zkey = zkey
        self.g1 = curves.bn254_g1()
        self.g2 = curves.bn254_g2()
        self.Fr = curves.bn254_fr()
        self.Fq = curves.bn254_fq()
        assert zkey.r == self.Fr.p and zkey.q == self.Fq.p
        n = zkey.domain_size
        self.domain = Radix2Domain(self.Fr, n)
        # root of unity of order 2n: coset shift (circom convention,
        # reference: circomlib QAP root_of_unity = GetRootOfUnity(2n))
        self.shift = self.Fr.spec.root_of_unity(2 * n)

        # device-resident queries
        self.pts_a1 = _g1_points(self.g1, zkey.points_a1)
        self.pts_b1 = _g1_points(self.g1, zkey.points_b1)
        self.pts_b2 = _g2_points(self.g2, zkey.points_b2)
        self.pts_c1 = _g1_points(self.g1, zkey.points_c1)
        self.pts_h1 = _g1_points(self.g1, zkey.points_h1)

        # witness-map plan: coefficients sorted by (matrix, constraint)
        key = zkey.coeff_matrix.astype(np.uint64) * n + zkey.coeff_constraint
        order = np.argsort(key, kind="stable")
        self._c_key = jnp.asarray(key[order].astype(np.uint32))
        self._c_signal = jnp.asarray(zkey.coeff_signal[order].astype(np.int32))
        self._c_value = jnp.asarray(zkey.coeff_values[:, order])
        self._c_matrix = zkey.coeff_matrix[order]
        self._c_constraint = zkey.coeff_constraint[order]

    # ------------------------------------------------------------- witness map
    def witness_map(self, w_mont: jnp.ndarray) -> jnp.ndarray:
        """h evaluations on the w_{2n} coset (reference: circomlib QAP).

        w_mont: (L, num_vars) full assignment in Montgomery form.
        Returns (L, n) h evals in Montgomery form.
        """
        F, dom, n = self.Fr, self.domain, self.zkey.domain_size
        terms = F.mul(
            jnp.take(w_mont, self._c_signal, axis=1), self._c_value
        )  # (L, nc)
        # segmented inclusive sum by sorted key
        key = self._c_key[None]  # (1, nc)

        def combine(x, y):
            kx, vx = x
            ky, vy = y
            same = kx == ky
            return ky, jnp.where(same, F.add(vx, vy), vy)

        _, summed = jax.lax.associative_scan(combine, (key, terms), axis=1)
        nc = terms.shape[1]
        nxt = jnp.concatenate(
            [self._c_key[1:], jnp.full((1,), 0xFFFFFFFF, jnp.uint32)]
        )
        is_end = self._c_key != nxt
        # scatter segment totals: a slots [0, n), b slots [n, 2n), dump 2n
        idx = jnp.where(is_end, self._c_key, jnp.uint32(2 * n)).astype(jnp.int32)
        ab = jnp.zeros((F.L, 2 * n + 1), jnp.uint32).at[:, idx].set(summed)
        a = ab[:, :n]
        b = ab[:, n : 2 * n]
        c = F.mul(a, b)
        a_p, b_p, c_p = dom.ifft(a), dom.ifft(b), dom.ifft(c)
        a_e = dom.coset_fft(a_p, self.shift)
        b_e = dom.coset_fft(b_p, self.shift)
        c_e = dom.coset_fft(c_p, self.shift)
        return F.sub(F.mul(a_e, b_e), c_e)

    # ------------------------------------------------------------------- prove
    def prove(
        self,
        witness_std: np.ndarray,
        r: int | None = None,
        s: int | None = None,
        *,
        deterministic: bool = False,
    ) -> Groth16Proof:
        """witness_std: (L, num_vars) standard-form limbs (from wtns).

        r/s default to fresh CSPRNG scalars (the reference samples fresh
        blinding per proof, zk/r1cs/groth16/prove.h).  Pass
        deterministic=True for a reproducible non-ZK test proof (r=s=0,
        reference prove.h:179 no-ZK mode).
        """
        zk = self.zkey
        F = self.Fr
        if deterministic:
            r = 0 if r is None else r
            s = 0 if s is None else s
        else:
            if r is None:
                r = secrets.randbelow(F.p)
            if s is None:
                s = secrets.randbelow(F.p)
        from tachyon_tpu.ops import mont

        w_std = jnp.asarray(witness_std)
        w_mont = mont.to_mont(F.spec, w_std)
        h_mont = self.witness_map(w_mont)
        h_std = mont.mont_reduce(F.spec, h_mont)

        npub1 = zk.num_public + 1
        # optional input dump for the replay debugger (io/replay.py;
        # reference: msm_gpu_replay.cc / TACHYON_PCS_PARAMS_LOG_PATH)
        from tachyon_tpu.io import replay as _replay

        _replay.dump_msm("bn254_g1", self.pts_a1.x, self.pts_a1.y,
                         self.pts_a1.inf, w_std)
        a_acc = msm(self.g1, self.pts_a1, w_std)
        b2_acc = msm(self.g2, self.pts_b2, w_std)
        c_acc = msm(self.g1, self.pts_c1, w_std[:, npub1:])
        h_acc = msm(self.g1, self.pts_h1, h_std)

        # host-side tiny combines (exact ints)
        Fq = self.Fq

        def g1_out(acc: PointXYZZ):
            aff = self.g1.to_affine(acc)
            if bool(np.asarray(aff.inf)):
                return None
            return (int(Fq.decode(aff.x)), int(Fq.decode(aff.y)))

        def g2_out(acc):
            aff = self.g2.to_affine(acc)
            if bool(np.asarray(aff.inf)):
                return None
            x = self.g2.F.decode(aff.x)
            y = self.g2.F.decode(aff.y)
            return ((int(x[0]), int(x[1])), (int(y[0]), int(y[1])))

        alpha = (int(Fq.decode(jnp.asarray(zk.alpha_g1[:, 0]))),
                 int(Fq.decode(jnp.asarray(zk.alpha_g1[:, 1]))))
        beta2 = self._g2_int(zk.beta_g2)
        delta1 = (int(Fq.decode(jnp.asarray(zk.delta_g1[:, 0]))),
                  int(Fq.decode(jnp.asarray(zk.delta_g1[:, 1]))))
        delta2 = self._g2_int(zk.delta_g2)

        A = _py_g1_add(g1_out(a_acc), alpha)
        B = _py_g2_add(g2_out(b2_acc), beta2)
        Cw = _py_g1_add(g1_out(c_acc), g1_out(h_acc))
        if r or s:
            beta1 = (int(Fq.decode(jnp.asarray(zk.beta_g1[:, 0]))),
                     int(Fq.decode(jnp.asarray(zk.beta_g1[:, 1]))))
            A = _py_g1_add(A, _py_g1_mul(delta1, r))
            B = _py_g2_add(B, _py_g2_mul(delta2, s))
            b1 = _py_g1_add(_py_g1_add(g1_out(msm(self.g1, self.pts_b1, w_std)), beta1), _py_g1_mul(delta1, s))
            C = _py_g1_add(Cw, _py_g1_mul(A, s))
            C = _py_g1_add(C, _py_g1_mul(b1, r))
            C = _py_g1_add(C, _py_g1_mul(delta1, (-r * s) % self.Fr.p))
        else:
            C = Cw
        return Groth16Proof(A, B, C)

    def _g2_int(self, arr):
        Fq = self.Fq
        vals = [int(Fq.decode(jnp.asarray(arr[:, i]))) for i in range(4)]
        return ((vals[0], vals[1]), (vals[2], vals[3]))

    # ------------------------------------------------------------------ verify
    def verify(self, proof: Groth16Proof, public_inputs: list[int]) -> bool:
        """e(A,B) == e(alpha,beta) e(vk_x,gamma) e(C,delta)
        (reference: zk/r1cs/groth16/verify.h)."""
        zk = self.zkey
        Fq = self.Fq
        ic = [
            (int(Fq.decode(jnp.asarray(zk.ic[:, i, 0]))),
             int(Fq.decode(jnp.asarray(zk.ic[:, i, 1]))))
            for i in range(zk.num_public + 1)
        ]
        vk_x = ic[0]
        for i, pub in enumerate(public_inputs):
            vk_x = _py_g1_add(vk_x, _py_g1_mul(ic[i + 1], pub % self.Fr.p))
        alpha = (int(Fq.decode(jnp.asarray(zk.alpha_g1[:, 0]))),
                 int(Fq.decode(jnp.asarray(zk.alpha_g1[:, 1]))))
        beta2 = self._g2_int(zk.beta_g2)
        gamma2 = self._g2_int(zk.gamma_g2)
        delta2 = self._g2_int(zk.delta_g2)
        neg_a = (proof.a[0], (-proof.a[1]) % pairing.P) if proof.a else None
        return pairing.pairing_product_is_one(
            [
                (neg_a, proof.b),
                (alpha, beta2),
                (vk_x, gamma2),
                (proof.c, delta2),
            ]
        )


# ---- exact python G1/G2 single-point helpers ---------------------------------
def _py_g1_add(p, q):
    P = pairing.P
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if p == q:
        lam = 3 * x1 * x1 * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _py_g1_mul(p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = _py_g1_add(acc, add)
        add = _py_g1_add(add, add)
        k >>= 1
    return acc


def _py_g2_add(p, q):
    f = pairing
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and f.f2_add(y1, y2) == (0, 0):
        return None
    if p == q:
        lam = f.f2_mul(f.f2_muls(f.f2_sq(x1), 3), f.f2_inv(f.f2_muls(y1, 2)))
    else:
        lam = f.f2_mul(f.f2_sub(y2, y1), f.f2_inv(f.f2_sub(x2, x1)))
    x3 = f.f2_sub(f.f2_sub(f.f2_sq(lam), x1), x2)
    return (x3, f.f2_sub(f.f2_mul(lam, f.f2_sub(x1, x3)), y1))


def _py_g2_mul(p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = _py_g2_add(acc, add)
        add = _py_g2_add(add, add)
        k >>= 1
    return acc
