"""Native R1CS constraint system + Groth16 trusted setup — curve generic.

Analog of the reference's r1cs layer
(reference: tachyon/zk/r1cs/constraint_system/constraint_system.h with
linear-combination reduction, quadratic_arithmetic_program.h QAP
instance/witness maps, zk/r1cs/groth16/{prove.h,verify.h} and the
toxic-waste setup used by its unittests; proof rerandomization
prove.h:246).

The circom pipeline (io/zkey.py + prover.py) covers imported circuits;
this module builds circuits natively, runs the setup, and proves on any
supported pairing curve (bn254, bls12_381) — the reference's arkworks-style
CreateProofWithAssignment path.  Setup and tiny-circuit point algebra are
host-exact ints; witness-map FFTs and the 5 proof MSMs run on the device
exactly as in the circom prover.
"""
from __future__ import annotations

import dataclasses
import secrets
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import AffinePoint
from tachyon_tpu.math.msm import msm
from tachyon_tpu.math.ntt import Radix2Domain


# --- host exact point ops, parameterized by the pairing module ------------
def g1_add(f, p, q):
    P = f.P
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


def g1_mul(f, p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = g1_add(f, acc, add)
        add = g1_add(f, add, add)
        k >>= 1
    return acc


def g2_add(f, p, q):
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


def g2_mul(f, p, k):
    acc, add = None, p
    while k:
        if k & 1:
            acc = g2_add(f, acc, add)
        add = g2_add(f, add, add)
        k >>= 1
    return acc


# below this the device MSM's compile cost dwarfs the math; host exact path
MSM_HOST_THRESHOLD = 1024

CURVE_FAMILIES = {
    "bn254": dict(
        g1=curves.bn254_g1, g2=curves.bn254_g2,
        pairing="tachyon_tpu.math.pairing_bn254",
    ),
    "bls12_381": dict(
        g1=curves.bls12_381_g1, g2=curves.bls12_381_g2,
        pairing="tachyon_tpu.math.pairing_bls12_381",
    ),
}


def _pairing_mod(family: str):
    import importlib

    return importlib.import_module(CURVE_FAMILIES[family]["pairing"])


# --- R1CS -----------------------------------------------------------------
class LinearCombination(dict):
    """var index -> coefficient.  Var 0 is the constant ONE."""


@dataclasses.dataclass
class R1CS:
    """a(w) * b(w) = c(w) constraints over the witness vector
    w = (1, public..., private...)
    (reference: r1cs/constraint_system/constraint_system.h)."""

    num_public: int  # public inputs, excluding the leading ONE
    num_private: int = 0
    constraints: list = dataclasses.field(default_factory=list)

    @property
    def num_vars(self) -> int:
        return 1 + self.num_public + self.num_private

    def new_private(self) -> int:
        self.num_private += 1
        return self.num_vars - 1

    def constrain(self, a: dict, b: dict, c: dict):
        """a, b, c: {var: coeff} linear combinations."""
        self.constraints.append(
            (LinearCombination(a), LinearCombination(b), LinearCombination(c))
        )


class Groth16Proof(NamedTuple):
    a: tuple | None
    b: tuple | None
    c: tuple | None


class Groth16Params(NamedTuple):
    family: str
    r1cs: R1CS
    n: int  # QAP domain size
    # proving key (host int points)
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_query: list  # [u_j(tau)]_1 per variable
    b1_query: list
    b2_query: list
    l_query: list  # private-var C terms / delta
    h_query: list  # [tau^i Z(tau)/delta]_1
    # verifying key
    gamma2: tuple
    ic: list  # public-var C terms / gamma


def _lagrange_at_tau(Fr_p: int, n: int, omega: int, tau: int) -> list[int]:
    """L_i(tau) = Z(tau) * w^i / (n (tau - w^i)) for the radix-2 domain."""
    z_tau = (pow(tau, n, Fr_p) - 1) % Fr_p
    out = []
    wi = 1
    for _ in range(n):
        out.append(
            z_tau * wi % Fr_p * pow(n * (tau - wi) % Fr_p, Fr_p - 2, Fr_p)
            % Fr_p
        )
        wi = wi * omega % Fr_p
    return out


def setup(r1cs: R1CS, family: str = "bn254", rng=None) -> Groth16Params:
    """Toxic-waste setup (test/dev only — a production SRS comes from a
    ceremony).  reference: zk/r1cs/groth16 setup flow in its unittests."""
    f = _pairing_mod(family)
    g1c = CURVE_FAMILIES[family]["g1"]()
    g2c = CURVE_FAMILIES[family]["g2"]()
    rp = f.R  # scalar field order
    rand = rng if rng is not None else (lambda: secrets.randbelow(rp - 1) + 1)
    tau, alpha, beta, gamma, delta = (rand() for _ in range(5))

    n = 1
    while n < max(len(r1cs.constraints), 2):
        n *= 2
    Fr = g1c.SF
    dom = Radix2Domain(Fr, n)
    omega = dom.omega_int
    lag = _lagrange_at_tau(rp, n, omega, tau)

    nv = r1cs.num_vars
    u = [0] * nv  # u_j(tau)
    v = [0] * nv
    w = [0] * nv
    for i, (a, b, c) in enumerate(r1cs.constraints):
        li = lag[i]
        for j, coef in a.items():
            u[j] = (u[j] + coef * li) % rp
        for j, coef in b.items():
            v[j] = (v[j] + coef * li) % rp
        for j, coef in c.items():
            w[j] = (w[j] + coef * li) % rp

    G1 = (g1c.gen_x, g1c.gen_y)
    G2 = (tuple(g2c.gen_x), tuple(g2c.gen_y))
    ginv = pow(gamma, rp - 2, rp)
    dinv = pow(delta, rp - 2, rp)
    npub1 = 1 + r1cs.num_public

    a_query = [g1_mul(f, G1, u[j]) for j in range(nv)]
    b1_query = [g1_mul(f, G1, v[j]) for j in range(nv)]
    b2_query = [g2_mul(f, G2, v[j]) for j in range(nv)]
    ic = [
        g1_mul(f, G1, (beta * u[j] + alpha * v[j] + w[j]) % rp * ginv % rp)
        for j in range(npub1)
    ]
    l_query = [
        g1_mul(f, G1, (beta * u[j] + alpha * v[j] + w[j]) % rp * dinv % rp)
        for j in range(npub1, nv)
    ]
    z_tau = (pow(tau, n, rp) - 1) % rp
    h_query = [
        g1_mul(f, G1, pow(tau, i, rp) * z_tau % rp * dinv % rp)
        for i in range(n - 1)
    ]
    return Groth16Params(
        family=family, r1cs=r1cs, n=n,
        alpha1=g1_mul(f, G1, alpha), beta1=g1_mul(f, G1, beta),
        beta2=g2_mul(f, G2, beta), delta1=g1_mul(f, G1, delta),
        delta2=g2_mul(f, G2, delta),
        a_query=a_query, b1_query=b1_query, b2_query=b2_query,
        l_query=l_query, h_query=h_query,
        gamma2=g2_mul(f, G2, gamma), ic=ic,
    )


def _dev_points(curve, pts: list) -> AffinePoint:
    F = curve.F
    D = getattr(F, "D", 1)
    if D == 1:
        xs = np.array([0 if p is None else p[0] for p in pts], dtype=object)
        ys = np.array([0 if p is None else p[1] for p in pts], dtype=object)
    else:
        # extension coords (G2 over Fq2): ExtField.encode wants a length-D
        # list of per-coefficient arrays
        zero = (0,) * D
        xs = [np.array([(zero if p is None else p[0])[d] for p in pts],
                       dtype=object) for d in range(D)]
        ys = [np.array([(zero if p is None else p[1])[d] for p in pts],
                       dtype=object) for d in range(D)]
    infs = np.array([p is None for p in pts])
    return AffinePoint(F.encode(xs), F.encode(ys), jnp.asarray(infs))


def _scalar_limbs(Fr, vals: list[int]) -> jnp.ndarray:
    from tachyon_tpu.fields.spec import int_to_limbs

    return jnp.asarray(
        np.stack([int_to_limbs(v % Fr.p, Fr.spec.L) for v in vals], axis=1)
    )


class Groth16:
    """Prover/verifier over a Groth16Params
    (reference: zk/r1cs/groth16/prove.h CreateProofWithAssignment —
    same 5-MSM structure, witness map on the device domain)."""

    def __init__(self, params: Groth16Params):
        self.pp = params
        self.f = _pairing_mod(params.family)
        self.g1 = CURVE_FAMILIES[params.family]["g1"]()
        self.g2 = CURVE_FAMILIES[params.family]["g2"]()
        self.Fr = self.g1.SF
        self.dom = Radix2Domain(self.Fr, params.n)
        big = len(params.a_query) > MSM_HOST_THRESHOLD
        self._a_pts = _dev_points(self.g1, params.a_query) if big else None
        self._b2_pts = _dev_points(self.g2, params.b2_query) if big else None
        self._l_pts = (
            _dev_points(self.g1, params.l_query)
            if params.l_query and len(params.l_query) > MSM_HOST_THRESHOLD
            else None
        )
        self._h_pts = (
            _dev_points(self.g1, params.h_query)
            if params.h_query and len(params.h_query) > MSM_HOST_THRESHOLD
            else None
        )

    # --- witness map (QAP) ------------------------------------------------
    def _h_scalars(self, witness: list[int]) -> list[int]:
        """h coefficients: (A.B - C)/Z evaluated via coset FFTs on device
        (reference: quadratic_arithmetic_program.h WitnessMapFromMatrices:
        3 iFFT + coset FFTs + pointwise)."""
        Fr, dom, n, rp = self.Fr, self.dom, self.pp.n, self.f.R
        a_rows = [0] * n
        b_rows = [0] * n
        c_rows = [0] * n
        for i, (a, b, c) in enumerate(self.pp.r1cs.constraints):
            a_rows[i] = sum(coef * witness[j] for j, coef in a.items()) % rp
            b_rows[i] = sum(coef * witness[j] for j, coef in b.items()) % rp
            c_rows[i] = sum(coef * witness[j] for j, coef in c.items()) % rp
        ae = Fr.encode(np.array(a_rows, dtype=object))
        be = Fr.encode(np.array(b_rows, dtype=object))
        ce = Fr.encode(np.array(c_rows, dtype=object))
        shift = Fr.spec.generator
        a_c = dom.coset_fft(dom.ifft(ae), shift)
        b_c = dom.coset_fft(dom.ifft(be), shift)
        c_c = dom.coset_fft(dom.ifft(ce), shift)
        q_c = Fr.sub(Fr.mul(a_c, b_c), c_c)
        # divide by Z on the coset: Z(shift w^i) = shift^n - 1 (constant)
        zinv = pow((pow(shift, n, rp) - 1) % rp, rp - 2, rp)
        q_c = Fr.mul(q_c, Fr.full((), zinv)[:, None])
        h = dom.coset_ifft(q_c, shift)
        return [int(v) for v in Fr.decode(h)]

    def prove(self, public: list[int], private: list[int],
              r: int | None = None, s: int | None = None) -> Groth16Proof:
        pp, f, rp = self.pp, self.f, self.f.R
        witness = [1] + [v % rp for v in public] + [v % rp for v in private]
        assert len(witness) == pp.r1cs.num_vars
        if r is None:
            r = secrets.randbelow(rp)
        if s is None:
            s = secrets.randbelow(rp)

        h = self._h_scalars(witness)
        npub1 = 1 + pp.r1cs.num_public

        def msm_out(curve, dev_pts, query, scalar_ints, g2=False):
            # host/device dispatch and the __init__ device-point upload both
            # key off the same quantity (query length); scalar count must
            # match or the zip below would silently truncate
            assert len(query) == len(scalar_ints), (
                f"msm_out: {len(query)} points vs {len(scalar_ints)} scalars"
            )
            # Below the threshold the device Pippenger/scan graphs cost
            # minutes of XLA compile for microseconds of math — use the
            # exact host double-and-add instead (same algorithm-by-size
            # dispatch as the reference's VariableBaseMSM facade).
            if len(query) <= MSM_HOST_THRESHOLD or dev_pts is None:
                acc = None
                add2 = g2_add if g2 else g1_add
                mul2 = g2_mul if g2 else g1_mul
                for pt, k in zip(query, scalar_ints):
                    acc = add2(f, acc, mul2(f, pt, int(k) % self.f.R))
                return acc
            acc = curve.to_affine(
                msm(curve, dev_pts, _scalar_limbs(self.Fr, scalar_ints)))
            if bool(np.asarray(acc.inf)):
                return None
            if g2:
                x = curve.F.decode(acc.x)
                y = curve.F.decode(acc.y)
                return ((int(x[0]), int(x[1])), (int(y[0]), int(y[1])))
            return (int(curve.F.decode(acc.x)), int(curve.F.decode(acc.y)))

        a_acc = msm_out(self.g1, self._a_pts, pp.a_query, witness)
        b2_acc = msm_out(self.g2, self._b2_pts, pp.b2_query, witness, g2=True)
        priv = witness[npub1:]
        c_l = (
            msm_out(self.g1, self._l_pts, pp.l_query, priv)
            if priv else None
        )
        hq = h[: len(pp.h_query)]
        c_h = (
            msm_out(self.g1, self._h_pts, pp.h_query, hq)
            if hq else None
        )

        A = g1_add(f, a_acc, g1_add(f, pp.alpha1, g1_mul(f, pp.delta1, r)))
        B = g2_add(f, b2_acc, g2_add(f, pp.beta2, g2_mul(f, pp.delta2, s)))
        b1_acc = None
        for j, v in enumerate(witness):
            b1_acc = g1_add(f, b1_acc, g1_mul(f, pp.b1_query[j], v))
        B1 = g1_add(f, b1_acc, g1_add(f, pp.beta1, g1_mul(f, pp.delta1, s)))
        C = g1_add(f, c_l, c_h)
        C = g1_add(f, C, g1_mul(f, A, s))
        C = g1_add(f, C, g1_mul(f, B1, r))
        C = g1_add(f, C, g1_mul(f, pp.delta1, (-r * s) % rp))
        return Groth16Proof(A, B, C)

    def rerandomize(self, proof: Groth16Proof) -> Groth16Proof:
        """fresh-randomness proof rerandomization
        (reference: groth16/prove.h:246 Rerandomize): same statement,
        unlinkable proof."""
        f, rp = self.f, self.f.R
        r1 = secrets.randbelow(rp - 1) + 1
        r2 = secrets.randbelow(rp)
        a = g1_mul(f, proof.a, r1)
        b = g2_add(
            f,
            g2_mul(f, proof.b, pow(r1, rp - 2, rp)),
            g2_mul(f, self.pp.delta2, r2),
        )
        c = g1_add(f, proof.c, g1_mul(f, a, r2))
        return Groth16Proof(a, b, c)

    def verify(self, proof: Groth16Proof, public: list[int]) -> bool:
        """e(A,B) == e(alpha,beta) e(vk_x,gamma) e(C,delta)
        (reference: zk/r1cs/groth16/verify.h)."""
        f, pp, rp = self.f, self.pp, self.f.R
        if proof.a is None or proof.b is None:
            return False
        vk_x = pp.ic[0]
        for i, v in enumerate(public):
            vk_x = g1_add(f, vk_x, g1_mul(f, pp.ic[i + 1], v % rp))
        neg_a = (proof.a[0], (-proof.a[1]) % f.P)
        return f.pairing_product_is_one([
            (neg_a, proof.b),
            (pp.alpha1, pp.beta2),
            (vk_x, pp.gamma2),
            (proof.c, pp.delta2),
        ])
