"""PLONK prover/verifier (halo2-architecture, KZG + SHPlonk/GWC).

Analog of the reference's halo2 proving stack
(reference: tachyon/zk/plonk/halo2/prover.h CreateProof, keys/proving_key.h,
permutation/permutation_prover.h + grand_product_argument.h,
vanishing/circuit_polynomial_builder.h, verifier.h).

Features: permutation argument, halo2 + log-derivative lookups, shuffles,
ZK blinding rows (cs.blinding_factors > 0), SHPlonk/GWC multiopen dispatch.
Documented deviations (self-consistent prover+verifier, upstream-halo2
bit-compat is a later milestone): single permutation grand product (halo2
chunks by degree bound); no vanishing random poly; selector compression is
an opt-in keygen pass (zk/plonk/selector.py) rather than automatic;
instance values absorbed as scalars.

All column algebra (FFTs, grand products, gate evaluation over the extended
coset, vanishing division) is vectorized on device; transcript and
challenges are exact host logic (blake2b, halo2-compatible encoding).
"""
from __future__ import annotations

import secrets
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.crypto import kzg as kzg_mod
from tachyon_tpu.crypto.multiopen import (
    GWC,
    ProverOpening,
    SHPlonk,
    VerifierOpening,
)
from tachyon_tpu.crypto.transcript import (
    ProofDecodeError,
    TranscriptReader,
    TranscriptWriter,
)
from tachyon_tpu.fields import presets
from tachyon_tpu.math import curves, poly as poly_mod
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.ops import mont
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk import lookup
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


def vk_transcript_repr(pk: ProvingKey) -> int:
    """Transcript representative of the verifying key: blake2b of the
    pinned VK Rust-Debug string, halo2-bit-compatible
    (reference: keys/verifying_key.h:102-124 SetTranscriptRepresentative;
    string format zk/plonk/halo2/pinned_verifying_key.h)."""
    from tachyon_tpu.zk.plonk import stringifier

    Fr = curves.bn254_fr()
    Fq = curves.bn254_fq()
    dom = Radix2Domain(Fr, pk.n)
    k = pk.n.bit_length() - 1
    max_deg = pk.cs.required_degree()
    ext_factor = 1 << max(1, (max_deg - 1).bit_length())
    extended_k = k + (ext_factor.bit_length() - 1)
    vk_str = stringifier.pinned_vk_str(
        pk.cs, k, extended_k, dom.omega_int,
        pk.fixed_commitments, pk.sigma_commitments,
        base_modulus=Fq.p, scalar_modulus=Fr.p,
    )
    return stringifier.transcript_repr_from_str(vk_str, Fr.p)


def _prefix_product(Fr, ratios: jnp.ndarray) -> jnp.ndarray:
    """z with z[0] = 1, z[i] = prod_{k<i} ratios[k] (exclusive scan)."""
    inc = jax.lax.associative_scan(Fr.mul, ratios, axis=1)
    one = Fr.ones((1,))
    return jnp.concatenate([one, inc[:, :-1]], axis=1)


class PlonkProver:
    def __init__(self, params: kzg_mod.KZGParams, pk: ProvingKey,
                 pcs: str = "shplonk"):
        """pcs: "shplonk" | "gwc" (reference: zk/plonk/halo2/pcs_type.h
        kGWC/kSHPlonk dispatch, c/zk/plonk/halo2/bn254_prover.cc:359)."""
        self.params = params
        self.pk = pk
        self.pcs_cls = {"shplonk": SHPlonk, "gwc": GWC}[pcs]
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
        """advice/instance values: per column numpy object arrays of n ints.

        With cs.blinding_factors > 0 the last t+1 rows of every advice
        column are overwritten with fresh randomness and all transition
        identities are masked to the active region (halo2 blinding:
        reference zk/base/blinder.h + the l_last/l_active_row machinery in
        keys/proving_key.h) — proofs become zero-knowledge.
        """
        Fr, pk, dom = self.Fr, self.pk, self.dom
        cs, n, p = pk.cs, pk.n, Fr.p
        omega = dom.omega_int
        w = TranscriptWriter(presets.BN254_FR, presets.BN254_FQ)

        t_blind = cs.blinding_factors
        u = cs.usable_rows(n)
        def rand_ints(k):
            # ZK blinding must be full-width uniform from a CSPRNG
            # (halo2 uses F::random over an OS RNG); secrets.randbelow is
            # uniform in [0, p) and unpredictable.
            return [secrets.randbelow(p) for _ in range(k)]

        w.common_scalar(vk_transcript_repr(pk))
        instance_ints = [list(map(int, vals)) for vals in instance_values]
        for col in instance_ints:
            for v in col:
                w.common_scalar(v)

        if t_blind:
            advice_values = [
                np.concatenate([
                    np.asarray(v, dtype=object)[:u],
                    np.array(rand_ints(n - u), dtype=object),
                ])
                for v in advice_values
            ]
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

        # --- lookups: theta-compress + host prep (reference:
        # zk/lookup/halo2/prover_impl.h BatchCompressPairs/BatchPermutePairs,
        # log_derivative_halo2/prover_impl.h ComputeMPolys) -----------------
        theta = None
        lookup_cols = []  # per lookup: dict of committed column evals/coeffs
        if cs.lookups or cs.shuffles:
            theta = w.squeeze_challenge()
        base_ev = ex.Evaluator(Fr, pk.fixed_evals, advice_evals,
                               instance_evals, rot_scale=1)
        for lk in cs.lookups:
            a_comp = lookup.compress(Fr, base_ev, lk.input_exprs, theta)
            s_comp = lookup.compress(Fr, base_ev, lk.table_exprs, theta)
            entry = {"a": a_comp, "s": s_comp}
            if cs.lookup_type == "halo2":
                # pairs built over the usable region; blinded tail rows of
                # A'/S' are random (halo2 permute_expression_pair + blinder)
                ap_ints, sp_ints = lookup.permute_pair(
                    Fr.decode(a_comp)[:u], Fr.decode(s_comp)[:u]
                )
                if t_blind:
                    ap_ints = np.concatenate(
                        [ap_ints, np.array(rand_ints(n - u), dtype=object)]
                    )
                    sp_ints = np.concatenate(
                        [sp_ints, np.array(rand_ints(n - u), dtype=object)]
                    )
                ap = Fr.encode(ap_ints)
                sp = Fr.encode(sp_ints)
                entry.update(
                    ap=ap, sp=sp, ap_coeffs=dom.ifft(ap), sp_coeffs=dom.ifft(sp)
                )
                for e in (ap, sp):
                    cm = self._commit_evals(e)
                    entry.setdefault("cms", []).append(cm)
                    w.write_point(cm)
            else:
                m_ints = lookup.multiplicities(
                    Fr.decode(a_comp)[:u], Fr.decode(s_comp)[:u]
                )
                if t_blind:
                    m_ints = np.concatenate(
                        [m_ints, np.zeros(n - u, dtype=object)]
                    )
                m = Fr.encode(m_ints)
                entry.update(m=m, m_coeffs=dom.ifft(m))
                cm = self._commit_evals(m)
                entry["cms"] = [cm]
                w.write_point(cm)
            lookup_cols.append(entry)

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
        idx_row = jnp.arange(n)
        active_mask = idx_row < u  # (n,)

        def mask_ratios(r):
            """force ratio 1 on the last+blind rows so the prefix product
            closes at row u (active-region telescoping)."""
            if not t_blind:
                return r
            return Fr.select(active_mask, r, Fr.ones((n,)))

        def blind_z(z):
            """randomize z on the blind rows (> u); row u keeps the
            closing value the verifier's l_last constraint checks."""
            if not t_blind:
                return z
            rz = Fr.encode(np.array(rand_ints(n), dtype=object))
            return Fr.select(idx_row > u, rz, z)

        # chunked grand products (halo2 permutation/prover.rs: chunk_len =
        # degree - 2 columns per Z poly; each chunk's Z starts from the
        # previous chunk's closing value at row u, stitched by the
        # l_0 * (z_c - z_{c-1}(w^last X)) constraint)
        chunks = cs.permutation_chunks()
        perm_z = []  # per chunk: dict(evals, coeffs, cm)
        last_z = 1
        j = 0
        for chunk in chunks:
            num = Fr.ones((n,))
            den = Fr.ones((n,))
            for col in chunk:
                v = col_evals(col)
                dj = Fr.full((), pk.deltas[j])[:, None]
                num = Fr.mul(num, Fr.add(
                    Fr.add(v, Fr.mul(beta_e, Fr.mul(dj, omega_pows))),
                    gamma_e))
                den = Fr.mul(den, Fr.add(
                    Fr.add(v, Fr.mul(beta_e, pk.sigma_evals[j])), gamma_e))
                j += 1
            ratios = mask_ratios(Fr.mul(num, Fr.batch_inverse(den, axis=1)))
            z = _prefix_product(Fr, ratios)
            if last_z != 1:
                z = Fr.mul(z, Fr.full((), last_z)[:, None])
            if len(chunks) > 1:
                # closing value at row u feeds the next chunk's start
                last_z = int(Fr.decode(z[:, u]))
            z = blind_z(z)
            perm_z.append({"evals": z, "coeffs": dom.ifft(z)})
        for entry in perm_z:
            cm = self._commit_evals(entry["evals"])
            entry["cm"] = cm
            w.write_point(cm)

        # --- lookup grand products / grand sums -----------------------------
        beta_c = Fr.full((), beta)[:, None]
        gamma_c = Fr.full((), gamma)[:, None]
        for entry in lookup_cols:
            if cs.lookup_type == "halo2":
                # z[i+1]/z[i] = (A+beta)(S+gamma) / ((A'+beta)(S'+gamma))
                t_num = Fr.mul(Fr.add(entry["a"], beta_c),
                               Fr.add(entry["s"], gamma_c))
                t_den = Fr.mul(Fr.add(entry["ap"], beta_c),
                               Fr.add(entry["sp"], gamma_c))
                r = mask_ratios(Fr.mul(t_num, Fr.batch_inverse(t_den, axis=1)))
                zl = blind_z(_prefix_product(Fr, r))
            else:
                # phi[i+1]-phi[i] = 1/(A+beta) - m/(S+beta); phi[0] = 0
                inv_a = Fr.batch_inverse(Fr.add(entry["a"], beta_c), axis=1)
                inv_s = Fr.batch_inverse(Fr.add(entry["s"], beta_c), axis=1)
                term = Fr.sub(inv_a, Fr.mul(entry["m"], inv_s))
                if t_blind:
                    term = Fr.select(active_mask, term, Fr.zeros((n,)))
                inc = jax.lax.associative_scan(Fr.add, term, axis=1)
                zl = jnp.concatenate(
                    [Fr.zeros((1,)), inc[:, :-1]], axis=1
                )
                zl = blind_z(zl)
            entry["z"] = zl
            entry["z_coeffs"] = dom.ifft(zl)
            cm = self._commit_evals(zl)
            entry["z_cm"] = cm
            w.write_point(cm)

        # --- shuffle grand products (reference: zk/shuffle/prover.h) --------
        shuffle_cols = []
        for sh in cs.shuffles:
            a_comp = lookup.compress(Fr, base_ev, sh.input_exprs, theta)
            s_comp = lookup.compress(Fr, base_ev, sh.shuffle_exprs, theta)
            r = mask_ratios(Fr.mul(
                Fr.add(a_comp, gamma_c),
                Fr.batch_inverse(Fr.add(s_comp, gamma_c), axis=1),
            ))
            zs = blind_z(_prefix_product(Fr, r))
            entry = {
                "a": a_comp, "s": s_comp, "z": zs, "z_coeffs": dom.ifft(zs),
            }
            cm = self._commit_evals(zs)
            entry["z_cm"] = cm
            shuffle_cols.append(entry)
            w.write_point(cm)

        y = w.squeeze_challenge()

        # --- vanishing / h(X) over extended coset ------------------------------
        max_deg = cs.required_degree()
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
        perm_z_ext = [to_ext(entry["coeffs"]) for entry in perm_z]

        ev = ex.Evaluator(Fr, fixed_ext, advice_ext, instance_ext,
                          rot_scale=ext_factor)
        acc = None
        for g in cs.gates:
            for poly in g.polys:
                v = ev.eval(poly)
                acc = v if acc is None else Fr.add(Fr.mul(acc, Fr.full((), y)[:, None]), v)

        # permutation identities on the extended coset: x_i = shift * w^i
        # (chunked, halo2 ordering: z_0 init, last-chunk boolean close,
        # chunk stitches, then per-chunk transitions)
        wp = big.shift_powers(big.omega_int, big_n)  # w^i
        xs = Fr.mul(wp, Fr.full((), shift)[:, None])
        beta_b = Fr.full((big_n,), beta)
        gamma_b = Fr.full((big_n,), gamma)
        col_ext = {"fixed": fixed_ext, "advice": advice_ext,
                   "instance": instance_ext}

        # row-selector polynomials over the extended coset
        def ind_ext(vec_01):
            return to_ext(dom.ifft(Fr.encode(np.array(vec_01, dtype=object))))

        l0_ext = ind_ext([1] + [0] * (n - 1))
        if t_blind:
            llast_ext = ind_ext([0] * u + [1] + [0] * (n - u - 1))
            lactive_ext = ind_ext([1] * u + [0] * (n - u))

        yc = Fr.full((), y)[:, None]
        one_bn = Fr.ones((big_n,))
        perm_idents = []
        if chunks:
            perm_idents.append(
                Fr.mul(l0_ext, Fr.sub(perm_z_ext[0], one_bn)))
            if t_blind:
                zl = perm_z_ext[-1]
                perm_idents.append(
                    Fr.mul(llast_ext, Fr.sub(Fr.square(zl), zl)))
            # stitches: l_0 * (z_c - z_{c-1}(w^{-(t+1)} X))
            for c in range(1, len(chunks)):
                z_prev_last = jnp.roll(
                    perm_z_ext[c - 1], (t_blind + 1) * ext_factor, axis=1)
                perm_idents.append(
                    Fr.mul(l0_ext, Fr.sub(perm_z_ext[c], z_prev_last)))
            j = 0
            for c, chunk in enumerate(chunks):
                numb = Fr.ones((big_n,))
                denb = Fr.ones((big_n,))
                for col in chunk:
                    v = col_ext[col.kind][col.index]
                    dj = Fr.full((), pk.deltas[j])[:, None]
                    numb = Fr.mul(numb, Fr.add(
                        Fr.add(v, Fr.mul(beta_b, Fr.mul(dj, xs))), gamma_b))
                    denb = Fr.mul(denb, Fr.add(
                        Fr.add(v, Fr.mul(beta_b, sigma_ext[j])), gamma_b))
                    j += 1
                z_c = perm_z_ext[c]
                z_next = jnp.roll(z_c, -ext_factor, axis=1)
                trans = Fr.sub(Fr.mul(z_next, denb), Fr.mul(z_c, numb))
                if t_blind:
                    trans = Fr.mul(trans, lactive_ext)
                perm_idents.append(trans)
        for ident in perm_idents:
            acc = ident if acc is None else Fr.add(Fr.mul(acc, yc), ident)

        # lookup identities over the extended coset
        one_b = Fr.ones((big_n,))
        beta_b2 = Fr.full((), beta)[:, None]
        gamma_b2 = Fr.full((), gamma)[:, None]
        ext_ev = ex.Evaluator(Fr, fixed_ext, advice_ext, instance_ext,
                              rot_scale=ext_factor)
        for lk_idx, entry in enumerate(lookup_cols):
            z_lk = to_ext(entry["z_coeffs"])
            z_lk_next = jnp.roll(z_lk, -ext_factor, axis=1)
            idents = []
            def act(v):
                return Fr.mul(v, lactive_ext) if t_blind else v

            def bool_close(z_col):
                return Fr.mul(llast_ext, Fr.sub(Fr.square(z_col), z_col))

            if cs.lookup_type == "halo2":
                lk = cs.lookups[lk_idx]
                a_big = lookup.compress(Fr, ext_ev, lk.input_exprs, theta)
                s_big = lookup.compress(Fr, ext_ev, lk.table_exprs, theta)
                ap_big = to_ext(entry["ap_coeffs"])
                sp_big = to_ext(entry["sp_coeffs"])
                ap_prev = jnp.roll(ap_big, ext_factor, axis=1)
                idents.append(Fr.mul(l0_ext, Fr.sub(z_lk, one_b)))
                idents.append(act(Fr.sub(
                    Fr.mul(z_lk_next,
                           Fr.mul(Fr.add(ap_big, beta_b2),
                                  Fr.add(sp_big, gamma_b2))),
                    Fr.mul(z_lk,
                           Fr.mul(Fr.add(a_big, beta_b2),
                                  Fr.add(s_big, gamma_b2))),
                )))
                if t_blind:
                    idents.append(bool_close(z_lk))
                diff = Fr.sub(ap_big, sp_big)
                idents.append(Fr.mul(l0_ext, diff))
                idents.append(act(Fr.mul(diff, Fr.sub(ap_big, ap_prev))))
            else:
                lk = cs.lookups[lk_idx]
                a_big = lookup.compress(Fr, ext_ev, lk.input_exprs, theta)
                s_big = lookup.compress(Fr, ext_ev, lk.table_exprs, theta)
                m_big = to_ext(entry["m_coeffs"])
                idents.append(Fr.mul(l0_ext, z_lk))
                # (phi(wx)-phi(x))(A+b)(S+b) - ((S+b) - m(A+b))
                ab = Fr.add(a_big, beta_b2)
                sb = Fr.add(s_big, beta_b2)
                idents.append(act(Fr.sub(
                    Fr.mul(Fr.sub(z_lk_next, z_lk), Fr.mul(ab, sb)),
                    Fr.sub(sb, Fr.mul(m_big, ab)),
                )))
                if t_blind:
                    # grand sum must close to zero at the last row
                    idents.append(Fr.mul(llast_ext, z_lk))
            for ident in idents:
                acc = ident if acc is None else Fr.add(Fr.mul(acc, yc), ident)

        for si, entry in enumerate(shuffle_cols):
            sh = cs.shuffles[si]
            a_big = lookup.compress(Fr, ext_ev, sh.input_exprs, theta)
            s_big = lookup.compress(Fr, ext_ev, sh.shuffle_exprs, theta)
            z_sh = to_ext(entry["z_coeffs"])
            z_sh_next = jnp.roll(z_sh, -ext_factor, axis=1)
            sh_idents = [
                Fr.mul(l0_ext, Fr.sub(z_sh, one_b)),
                Fr.sub(Fr.mul(z_sh_next, Fr.add(s_big, gamma_b2)),
                       Fr.mul(z_sh, Fr.add(a_big, gamma_b2))),
            ]
            if t_blind:
                sh_idents[1] = Fr.mul(sh_idents[1], lactive_ext)
                sh_idents.append(
                    Fr.mul(llast_ext, Fr.sub(Fr.square(z_sh), z_sh))
                )
            for ident in sh_idents:
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
        # permutation z evals: per chunk z(x), z(wx), plus z(x_last) for
        # every chunk but the final one (stitch openings; halo2
        # permutation/prover.rs evaluate order)
        x_last = x * pow(omega, (-(t_blind + 1)) % n, p) % p if chunks else 0
        for c, entry in enumerate(perm_z):
            zc = entry["coeffs"]
            pts = [x, wx]
            if c + 1 < len(perm_z):
                pts.append(x_last)
            for pt in pts:
                w.write_scalar(ev_at(zc, pt))
            openings.append(ProverOpening(zc, tuple(pts)))
        # lookup openings: halo2 -> a'(x), a'(w^-1 x), s'(x), z(x), z(wx);
        # log-derivative -> m(x), phi(x), phi(wx); shuffle -> z(x), z(wx)
        winv_x = x * pow(omega, p - 2, p) % p
        for entry in lookup_cols:
            if cs.lookup_type == "halo2":
                for c, pts in (
                    (entry["ap_coeffs"], (x, winv_x)),
                    (entry["sp_coeffs"], (x,)),
                    (entry["z_coeffs"], (x, wx)),
                ):
                    for pt in pts:
                        w.write_scalar(ev_at(c, pt))
                    openings.append(ProverOpening(c, pts))
            else:
                for c, pts in (
                    (entry["m_coeffs"], (x,)),
                    (entry["z_coeffs"], (x, wx)),
                ):
                    for pt in pts:
                        w.write_scalar(ev_at(c, pt))
                    openings.append(ProverOpening(c, pts))
        for entry in shuffle_cols:
            c = entry["z_coeffs"]
            for pt in (x, wx):
                w.write_scalar(ev_at(c, pt))
            openings.append(ProverOpening(c, (x, wx)))
        # h combined poly: open each chunk at x
        for chunk in h_chunks:
            openings.append(ProverOpening(chunk, (x,)))
            vv = ev_at(chunk, x)
            w.write_scalar(vv)

        self.pcs_cls(self.params).create_opening_proof(openings, w)
        return bytes(w.proof)


class PlonkVerifier:
    def __init__(self, params: kzg_mod.KZGParams, pk: ProvingKey,
                 pcs: str = "shplonk"):
        self.params = params
        self.pk = pk  # uses only the VK parts (commitments + cs)
        self.pcs_cls = {"shplonk": SHPlonk, "gwc": GWC}[pcs]
        self.Fr = curves.bn254_fr()
        self.dom = Radix2Domain(self.Fr, pk.n)

    def verify(self, proof: bytes, instance_values: list) -> bool:
        try:
            return self._verify(proof, instance_values)
        except ProofDecodeError:
            # malformed proof bytes are a rejection, not a crash
            return False

    def _verify(self, proof: bytes, instance_values: list) -> bool:
        Fr, pk = self.Fr, self.pk
        cs, n, p = pk.cs, pk.n, Fr.p
        omega = self.dom.omega_int
        r = TranscriptReader(proof, presets.BN254_FR, presets.BN254_FQ)
        r.common_scalar(vk_transcript_repr(pk))
        for col in instance_values:
            for v in col:
                r.common_scalar(int(v))
        advice_cms = [r.read_point() for _ in range(cs.num_advice)]
        theta = None
        if cs.lookups or cs.shuffles:
            theta = r.squeeze_challenge()
        lookup_cms = []  # per lookup: committed prep columns
        for _lk in cs.lookups:
            if cs.lookup_type == "halo2":
                lookup_cms.append((r.read_point(), r.read_point()))
            else:
                lookup_cms.append((r.read_point(),))
        beta = r.squeeze_challenge()
        gamma = r.squeeze_challenge()
        chunks = cs.permutation_chunks()
        perm_z_cms = [r.read_point() for _ in chunks]
        lookup_z_cms = [r.read_point() for _ in cs.lookups]
        shuffle_z_cms = [r.read_point() for _ in cs.shuffles]
        y = r.squeeze_challenge()
        max_deg = cs.required_degree()
        ext_factor = 1 << max(1, (max_deg - 1).bit_length())
        h_cms = [r.read_point() for _ in range(ext_factor)]
        x = r.squeeze_challenge()
        wx = x * omega % p
        winv_x = x * pow(omega, p - 2, p) % p

        t_blind = cs.blinding_factors
        u = cs.usable_rows(n)
        x_last = x * pow(omega, (-(t_blind + 1)) % n, p) % p

        advice_evals = [r.read_scalar() for _ in range(cs.num_advice)]
        fixed_evals = [r.read_scalar() for _ in range(cs.num_fixed)]
        sigma_evals = [r.read_scalar() for _ in range(len(cs.permutation_columns))]
        perm_z_evals = []
        for c in range(len(chunks)):
            e = {"z_x": r.read_scalar(), "z_wx": r.read_scalar()}
            if c + 1 < len(chunks):
                e["z_lastx"] = r.read_scalar()
            perm_z_evals.append(e)
        lookup_evals = []
        for _lk in cs.lookups:
            if cs.lookup_type == "halo2":
                lookup_evals.append({
                    "ap_x": r.read_scalar(), "ap_winvx": r.read_scalar(),
                    "sp_x": r.read_scalar(),
                    "z_x": r.read_scalar(), "z_wx": r.read_scalar(),
                })
            else:
                lookup_evals.append({
                    "m_x": r.read_scalar(),
                    "z_x": r.read_scalar(), "z_wx": r.read_scalar(),
                })
        shuffle_evals = [
            {"z_x": r.read_scalar(), "z_wx": r.read_scalar()}
            for _ in cs.shuffles
        ]
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
        # permutation identities at x (chunked; mirrors the prover order)
        xn = pow(x, n, p)
        l0 = (xn - 1) * pow(n * (x - 1) % p, p - 2, p) % p

        def lag(i):
            wi = pow(omega, i, p)
            return wi * (xn - 1) % p * pow(n * (x - wi) % p, p - 2, p) % p

        if t_blind:
            l_last = lag(u)
            l_blind = sum(lag(i) for i in range(u + 1, n)) % p
            l_active = (1 - l_last - l_blind) % p
        else:
            l_last, l_active = 0, 1

        col_eval = {"fixed": fixed_evals, "advice": advice_evals,
                    "instance": inst_evals}
        perm_idents = []
        if chunks:
            perm_idents.append(l0 * (perm_z_evals[0]["z_x"] - 1) % p)
            if t_blind:
                zl = perm_z_evals[-1]["z_x"]
                perm_idents.append(l_last * (zl * zl - zl) % p)
            for c in range(1, len(chunks)):
                perm_idents.append(
                    l0 * (perm_z_evals[c]["z_x"]
                          - perm_z_evals[c - 1]["z_lastx"]) % p)
            j = 0
            for c, chunk in enumerate(chunks):
                numx, denx = 1, 1
                for col in chunk:
                    v = col_eval[col.kind][col.index]
                    numx = numx * ((v + beta * pk.deltas[j] % p * x + gamma)
                                   % p) % p
                    denx = denx * ((v + beta * sigma_evals[j] + gamma)
                                   % p) % p
                    j += 1
                ev = perm_z_evals[c]
                perm_idents.append(
                    (ev["z_wx"] * denx - ev["z_x"] * numx) % p
                    * l_active % p)
        for ident in perm_idents:
            acc = ident if acc is None else (acc * y + ident) % p

        # lookup / shuffle identities at x
        from tachyon_tpu.zk.plonk import lookup as lk_mod

        for li, lk in enumerate(cs.lookups):
            ev = lookup_evals[li]
            a_x = lk_mod.compress_scalar(p, scal, lk.input_exprs, theta)
            s_x = lk_mod.compress_scalar(p, scal, lk.table_exprs, theta)
            idents = []
            if cs.lookup_type == "halo2":
                idents.append(l0 * (ev["z_x"] - 1) % p)
                idents.append((
                    ev["z_wx"] * ((ev["ap_x"] + beta) % p) % p
                    * ((ev["sp_x"] + gamma) % p)
                    - ev["z_x"] * ((a_x + beta) % p) % p
                    * ((s_x + gamma) % p)
                ) % p * l_active % p)
                if t_blind:
                    idents.append(
                        l_last * (ev["z_x"] * ev["z_x"] - ev["z_x"]) % p
                    )
                diff = (ev["ap_x"] - ev["sp_x"]) % p
                idents.append(l0 * diff % p)
                idents.append(
                    diff * ((ev["ap_x"] - ev["ap_winvx"]) % p) % p
                    * l_active % p
                )
            else:
                idents.append(l0 * ev["z_x"] % p)
                ab = (a_x + beta) % p
                sb = (s_x + beta) % p
                idents.append((
                    (ev["z_wx"] - ev["z_x"]) % p * ab % p * sb
                    - (sb - ev["m_x"] * ab) % p
                ) % p * l_active % p)
                if t_blind:
                    idents.append(l_last * ev["z_x"] % p)
            for ident in idents:
                acc = ident if acc is None else (acc * y + ident) % p
        for si, sh in enumerate(cs.shuffles):
            ev = shuffle_evals[si]
            a_x = lk_mod.compress_scalar(p, scal, sh.input_exprs, theta)
            s_x = lk_mod.compress_scalar(p, scal, sh.shuffle_exprs, theta)
            sh_idents = [
                l0 * (ev["z_x"] - 1) % p,
                (ev["z_wx"] * ((s_x + gamma) % p)
                 - ev["z_x"] * ((a_x + gamma) % p)) % p * l_active % p,
            ]
            if t_blind:
                sh_idents.append(
                    l_last * (ev["z_x"] * ev["z_x"] - ev["z_x"]) % p
                )
            for ident in sh_idents:
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
        for c, cm in enumerate(perm_z_cms):
            ev = perm_z_evals[c]
            pts = [x, wx]
            vals = [ev["z_x"], ev["z_wx"]]
            if c + 1 < len(perm_z_cms):
                pts.append(x_last)
                vals.append(ev["z_lastx"])
            openings.append(VerifierOpening(cm, tuple(pts), tuple(vals)))
        for li in range(len(cs.lookups)):
            ev = lookup_evals[li]
            if cs.lookup_type == "halo2":
                ap_cm, sp_cm = lookup_cms[li]
                openings.append(VerifierOpening(
                    ap_cm, (x, winv_x), (ev["ap_x"], ev["ap_winvx"])))
                openings.append(VerifierOpening(sp_cm, (x,), (ev["sp_x"],)))
            else:
                (m_cm,) = lookup_cms[li]
                openings.append(VerifierOpening(m_cm, (x,), (ev["m_x"],)))
            openings.append(VerifierOpening(
                lookup_z_cms[li], (x, wx), (ev["z_x"], ev["z_wx"])))
        for si in range(len(cs.shuffles)):
            ev = shuffle_evals[si]
            openings.append(VerifierOpening(
                shuffle_z_cms[si], (x, wx), (ev["z_x"], ev["z_wx"])))
        for i, cm in enumerate(h_cms):
            openings.append(VerifierOpening(cm, (x,), (h_evals[i],)))
        return self.pcs_cls(self.params).verify_opening_proof(openings, r)


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
