"""PLONK prover/verifier (halo2-architecture, KZG + SHPlonk/GWC).

Analog of the reference's halo2 proving stack
(reference: tachyon/zk/plonk/halo2/prover.h CreateProof, keys/proving_key.h,
permutation/permutation_prover.h + grand_product_argument.h,
vanishing/circuit_polynomial_builder.h, verifier.h).

Round-1 scope (documented deviations, self-consistent prover+verifier):
  * single permutation grand product (halo2 chunks by degree bound);
  * no lookups/shuffles yet; no ZK blinding rows (deterministic proofs);
  * instance values absorbed as scalars.

All column algebra (FFTs, grand products, gate evaluation over the extended
coset, vanishing division) is vectorized on device; transcript and
challenges are exact host logic (blake2b, halo2-compatible encoding).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.crypto import kzg as kzg_mod
from tachyon_tpu.crypto.multiopen import ProverOpening, SHPlonk, VerifierOpening
from tachyon_tpu.crypto.transcript import TranscriptReader, TranscriptWriter
from tachyon_tpu.fields import presets
from tachyon_tpu.math import curves, poly as poly_mod
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.ops import mont
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.constraint_system import (
    ConstraintSystem,
    build_permutation_mapping,
)


class ProvingKey(NamedTuple):
    cs: ConstraintSystem
    n: int
    fixed_evals: list  # (L, n) per fixed column
    fixed_coeffs: list
    sigma_evals: list  # per permutation column
    sigma_coeffs: list
    fixed_commitments: list  # int points (the VK part)
    sigma_commitments: list
    deltas: list  # delta^j ints


def _delta(Fr) -> int:
    # halo2 DELTA = generator^(2^two_adicity): generates the coset group
    return pow(Fr.spec.generator, 1 << Fr.spec.two_adicity, Fr.p)


def keygen(params: kzg_mod.KZGParams, cs: ConstraintSystem, n: int,
           fixed_values: list) -> ProvingKey:
    """fixed_values: per fixed column, numpy object array of n ints."""
    Fr = curves.bn254_fr()
    dom = Radix2Domain(Fr, n)
    omega = dom.omega_int
    p = Fr.p
    delta = _delta(Fr)
    num_perm = len(cs.permutation_columns)
    deltas = [pow(delta, j, p) for j in range(num_perm)]

    mapping = build_permutation_mapping(cs, n)
    sigma_evals, sigma_coeffs, sigma_cms = [], [], []
    for j in range(num_perm):
        vals = np.empty((n,), dtype=object)
        for i in range(n):
            tgt = int(mapping[j, i])
            cp, rp = tgt // n, tgt % n
            vals[i] = deltas[cp] * pow(omega, rp, p) % p
        e = Fr.encode(vals)
        c = dom.ifft(e)
        sigma_evals.append(e)
        sigma_coeffs.append(c)
        sigma_cms.append(
            kzg_mod.to_int_point(
                kzg_mod.commit(params, mont.mont_reduce(Fr.spec, c))
            )
        )
    fixed_evals, fixed_coeffs, fixed_cms = [], [], []
    for vals in fixed_values:
        e = Fr.encode(np.asarray(vals, dtype=object))
        c = dom.ifft(e)
        fixed_evals.append(e)
        fixed_coeffs.append(c)
        fixed_cms.append(
            kzg_mod.to_int_point(
                kzg_mod.commit(params, mont.mont_reduce(Fr.spec, c))
            )
        )
    return ProvingKey(
        cs, n, fixed_evals, fixed_coeffs, sigma_evals, sigma_coeffs,
        fixed_cms, sigma_cms, deltas,
    )


def _prefix_product(Fr, ratios: jnp.ndarray) -> jnp.ndarray:
    """z with z[0] = 1, z[i] = prod_{k<i} ratios[k] (exclusive scan)."""
    inc = jax.lax.associative_scan(Fr.mul, ratios, axis=1)
    one = Fr.ones((1,))
    return jnp.concatenate([one, inc[:, :-1]], axis=1)


class PlonkProver:
    def __init__(self, params: kzg_mod.KZGParams, pk: ProvingKey):
        self.params = params
        self.pk = pk
        self.Fr = curves.bn254_fr()
        self.dom = Radix2Domain(self.Fr, pk.n)

    def _commit_evals(self, evals):
        return kzg_mod.to_int_point(
            kzg_mod.commit_lagrange(
                self.params, mont.mont_reduce(self.Fr.spec, evals)
            )
        )

    def _commit_coeffs(self, coeffs):
        return kzg_mod.to_int_point(
            kzg_mod.commit(self.params, mont.mont_reduce(self.Fr.spec, coeffs))
        )

    def prove(self, advice_values: list, instance_values: list) -> bytes:
        """advice/instance values: per column numpy object arrays of n ints."""
        Fr, pk, dom = self.Fr, self.pk, self.dom
        cs, n, p = pk.cs, pk.n, Fr.p
        omega = dom.omega_int
        w = TranscriptWriter(presets.BN254_FR, presets.BN254_FQ)

        instance_ints = [list(map(int, vals)) for vals in instance_values]
        for col in instance_ints:
            for v in col:
                w.common_scalar(v)

        advice_evals = [
            Fr.encode(np.asarray(v, dtype=object)) for v in advice_values
        ]
        advice_coeffs = [dom.ifft(e) for e in advice_evals]
        advice_cms = [self._commit_evals(e) for e in advice_evals]
        for cm in advice_cms:
            w.write_point(cm)

        instance_evals = [
            Fr.encode(np.asarray(v, dtype=object)) for v in instance_values
        ]
        instance_coeffs = [dom.ifft(e) for e in instance_evals]

        beta = w.squeeze_challenge()
        gamma = w.squeeze_challenge()

        # --- permutation grand product ---------------------------------------
        def col_evals(col):
            if col.kind == "fixed":
                return pk.fixed_evals[col.index]
            if col.kind == "advice":
                return advice_evals[col.index]
            return instance_evals[col.index]

        omega_pows = dom.shift_powers(omega, n)  # (L, n): w^i
        beta_e = Fr.full((n,), beta)
        gamma_e = Fr.full((n,), gamma)
        num = Fr.ones((n,))
        den = Fr.ones((n,))
        for j, col in enumerate(cs.permutation_columns):
            v = col_evals(col)
            dj = Fr.full((), pk.deltas[j])[:, None]
            t_num = Fr.add(Fr.add(v, Fr.mul(beta_e, Fr.mul(dj, omega_pows))), gamma_e)
            t_den = Fr.add(Fr.add(v, Fr.mul(beta_e, pk.sigma_evals[j])), gamma_e)
            num = Fr.mul(num, t_num)
            den = Fr.mul(den, t_den)
        ratios = Fr.mul(num, Fr.batch_inverse(den, axis=1))
        z_evals = _prefix_product(Fr, ratios)
        z_coeffs = dom.ifft(z_evals)
        z_cm = self._commit_evals(z_evals)
        w.write_point(z_cm)

        y = w.squeeze_challenge()

        # --- vanishing / h(X) over extended coset ------------------------------
        max_deg = max(cs.max_gate_degree(), len(cs.permutation_columns) + 2)
        ext_factor = 1 << max(1, (max_deg - 1).bit_length())
        big_n = n * ext_factor
        big = Radix2Domain(Fr, big_n)
        shift = Fr.spec.generator

        def to_ext(coeffs):
            pad = jnp.zeros((coeffs.shape[0], big_n - coeffs.shape[1]),
                            coeffs.dtype)
            return big.coset_fft(jnp.concatenate([coeffs, pad], axis=1), shift)

        fixed_ext = [to_ext(c) for c in pk.fixed_coeffs]
        advice_ext = [to_ext(c) for c in advice_coeffs]
        instance_ext = [to_ext(c) for c in instance_coeffs]
        sigma_ext = [to_ext(c) for c in pk.sigma_coeffs]
        z_ext = to_ext(z_coeffs)

        ev = ex.Evaluator(Fr, fixed_ext, advice_ext, instance_ext,
                          rot_scale=ext_factor)
        acc = None
        for g in cs.gates:
            for poly in g.polys:
                v = ev.eval(poly)
                acc = v if acc is None else Fr.add(Fr.mul(acc, Fr.full((), y)[:, None]), v)

        # permutation identities on the extended coset
        xs = big.shift_powers(shift, big_n)  # coset points
        beta_b = Fr.full((big_n,), beta)
        gamma_b = Fr.full((big_n,), gamma)
        numb = Fr.ones((big_n,))
        denb = Fr.ones((big_n,))
        col_ext = {"fixed": fixed_ext, "advice": advice_ext,
                   "instance": instance_ext}
        for j, col in enumerate(cs.permutation_columns):
            v = col_ext[col.kind][col.index]
            dj = Fr.full((), pk.deltas[j])[:, None]
            numb = Fr.mul(numb, Fr.add(Fr.add(v, Fr.mul(beta_b, Fr.mul(dj, xs))), gamma_b))
            denb = Fr.mul(denb, Fr.add(Fr.add(v, Fr.mul(beta_b, sigma_ext[j])), gamma_b))
        z_next = jnp.roll(z_ext, -ext_factor, axis=1)
        perm_trans = Fr.sub(Fr.mul(z_next, denb), Fr.mul(z_ext, numb))

        # l_0 over extended coset
        l0_evals = Fr.encode(np.array([1] + [0] * (n - 1), dtype=object))
        l0_ext = to_ext(dom.ifft(l0_evals))
        perm_first = Fr.mul(l0_ext, Fr.sub(z_ext, Fr.ones((big_n,))))

        yc = Fr.full((), y)[:, None]
        for ident in (perm_first, perm_trans):
            acc = ident if acc is None else Fr.add(Fr.mul(acc, yc), ident)

        # divide by Z_H(coset x) = shift^n * w^(n i) - 1
        zh_vals = np.empty((ext_factor,), dtype=object)
        sn = pow(shift, n, p)
        wn = pow(big.omega_int, n, p)
        for i in range(ext_factor):
            zh_vals[i] = (sn * pow(wn, i, p) - 1) % p
        zh_inv = Fr.encode(
            np.array([pow(int(v), p - 2, p) for v in zh_vals], dtype=object)
        )
        zh_inv_full = jnp.tile(zh_inv, (1, n))
        h_ext = Fr.mul(acc, zh_inv_full)
        h_coeffs = big.coset_ifft(h_ext, shift)
        # split h into ext_factor chunks of n coefficients, commit each
        h_cms = []
        h_chunks = []
        for i in range(ext_factor):
            chunk = h_coeffs[:, i * n : (i + 1) * n]
            h_chunks.append(chunk)
            cm = self._commit_coeffs(chunk)
            h_cms.append(cm)
            w.write_point(cm)

        x = w.squeeze_challenge()
        wx = x * omega % p

        # --- evaluations ---------------------------------------------------------
        def ev_at(coeffs, pt):
            return int(Fr.decode(poly_mod.eval_at_fast(Fr, coeffs, pt)))

        evals = {}
        openings = []
        for i, c in enumerate(advice_coeffs):
            vv = ev_at(c, x)
            evals[("advice", i)] = vv
            w.write_scalar(vv)
            openings.append(ProverOpening(c, (x,)))
        for i, c in enumerate(pk.fixed_coeffs):
            vv = ev_at(c, x)
            evals[("fixed", i)] = vv
            w.write_scalar(vv)
            openings.append(ProverOpening(c, (x,)))
        for i, c in enumerate(pk.sigma_coeffs):
            vv = ev_at(c, x)
            evals[("sigma", i)] = vv
            w.write_scalar(vv)
            openings.append(ProverOpening(c, (x,)))
        zx = ev_at(z_coeffs, x)
        zwx = ev_at(z_coeffs, wx)
        w.write_scalar(zx)
        w.write_scalar(zwx)
        openings.append(ProverOpening(z_coeffs, (x, wx)))
        # h combined poly: open each chunk at x
        for chunk in h_chunks:
            openings.append(ProverOpening(chunk, (x,)))
            vv = ev_at(chunk, x)
            w.write_scalar(vv)

        SHPlonk(self.params).create_opening_proof(openings, w)
        return bytes(w.proof)


class PlonkVerifier:
    def __init__(self, params: kzg_mod.KZGParams, pk: ProvingKey):
        self.params = params
        self.pk = pk  # uses only the VK parts (commitments + cs)
        self.Fr = curves.bn254_fr()
        self.dom = Radix2Domain(self.Fr, pk.n)

    def verify(self, proof: bytes, instance_values: list) -> bool:
        Fr, pk = self.Fr, self.pk
        cs, n, p = pk.cs, pk.n, Fr.p
        omega = self.dom.omega_int
        r = TranscriptReader(proof, presets.BN254_FR, presets.BN254_FQ)
        for col in instance_values:
            for v in col:
                r.common_scalar(int(v))
        advice_cms = [r.read_point() for _ in range(cs.num_advice)]
        beta = r.squeeze_challenge()
        gamma = r.squeeze_challenge()
        z_cm = r.read_point()
        y = r.squeeze_challenge()
        max_deg = max(cs.max_gate_degree(), len(cs.permutation_columns) + 2)
        ext_factor = 1 << max(1, (max_deg - 1).bit_length())
        h_cms = [r.read_point() for _ in range(ext_factor)]
        x = r.squeeze_challenge()
        wx = x * omega % p

        advice_evals = [r.read_scalar() for _ in range(cs.num_advice)]
        fixed_evals = [r.read_scalar() for _ in range(cs.num_fixed)]
        sigma_evals = [r.read_scalar() for _ in range(len(cs.permutation_columns))]
        zx = r.read_scalar()
        zwx = r.read_scalar()
        h_evals = None  # read after

        # instance evals at x computed from the public values
        inst_evals = []
        for col in instance_values:
            dom = self.dom
            e = Fr.encode(np.asarray(col, dtype=object))
            c = dom.ifft(e)
            inst_evals.append(
                int(Fr.decode(poly_mod.eval_at_fast(Fr, c, x)))
            )
        h_evals = [r.read_scalar() for _ in range(ext_factor)]

        # --- recompute N(x) and check h(x) (x^n - 1) == N(x) ------------------
        scal = _ScalarEvaluator(p, fixed_evals, advice_evals, inst_evals)
        acc = None
        for g in cs.gates:
            for poly in g.polys:
                v = scal.eval(poly)
                acc = v if acc is None else (acc * y + v) % p
        # permutation identities at x
        xn = pow(x, n, p)
        l0 = (xn - 1) * pow(n * (x - 1) % p, p - 2, p) % p
        numx, denx = 1, 1
        col_eval = {"fixed": fixed_evals, "advice": advice_evals,
                    "instance": inst_evals}
        for j, col in enumerate(cs.permutation_columns):
            v = col_eval[col.kind][col.index]
            numx = numx * ((v + beta * pk.deltas[j] % p * x + gamma) % p) % p
            denx = denx * ((v + beta * sigma_evals[j] + gamma) % p) % p
        perm_first = l0 * (zx - 1) % p
        perm_trans = (zwx * denx - zx * numx) % p
        for ident in (perm_first, perm_trans):
            acc = ident if acc is None else (acc * y + ident) % p
        h_at_x = 0
        for i in reversed(range(ext_factor)):
            h_at_x = (h_at_x * xn + h_evals[i]) % p
        if h_at_x * ((xn - 1) % p) % p != acc % p:
            return False

        # --- multiopen verification -------------------------------------------
        openings = []
        for i, cm in enumerate(advice_cms):
            openings.append(VerifierOpening(cm, (x,), (advice_evals[i],)))
        for i, cm in enumerate(pk.fixed_commitments):
            openings.append(VerifierOpening(cm, (x,), (fixed_evals[i],)))
        for i, cm in enumerate(pk.sigma_commitments):
            openings.append(VerifierOpening(cm, (x,), (sigma_evals[i],)))
        openings.append(VerifierOpening(z_cm, (x, wx), (zx, zwx)))
        for i, cm in enumerate(h_cms):
            openings.append(VerifierOpening(cm, (x,), (h_evals[i],)))
        return SHPlonk(self.params).verify_opening_proof(openings, r)


class _ScalarEvaluator:
    """host-int expression evaluation at a single point."""

    def __init__(self, p, fixed, advice, instance, challenges=None):
        self.p = p
        self.fixed = fixed
        self.advice = advice
        self.instance = instance
        self.challenges = challenges or {}

    def eval(self, e):
        p = self.p
        if isinstance(e, ex.Constant):
            return e.value % p
        if isinstance(e, ex.Fixed):
            assert e.rotation == 0, "rotations at x need extra openings"
            return self.fixed[e.column]
        if isinstance(e, ex.Advice):
            assert e.rotation == 0
            return self.advice[e.column]
        if isinstance(e, ex.Instance):
            assert e.rotation == 0
            return self.instance[e.column]
        if isinstance(e, ex.Challenge):
            return self.challenges[e.index]
        if isinstance(e, ex.Negated):
            return (-self.eval(e.expr)) % p
        if isinstance(e, ex.Sum):
            return (self.eval(e.left) + self.eval(e.right)) % p
        if isinstance(e, ex.Product):
            return self.eval(e.left) * self.eval(e.right) % p
        if isinstance(e, ex.Scaled):
            return self.eval(e.expr) * (e.scale % p) % p
        raise TypeError(e)
