"""TwoAdicFRI polynomial commitment scheme, bit-compatible with the
reference / Plonky3 / SP1.

TPU-native analog of the reference's TwoAdicFRI
(reference: tachyon/crypto/commitments/fri/two_adic_fri.h Commit/
CreateOpeningProof/VerifyOpeningProof, fri/prove.h CommitPhase/AnswerQuery/
Prove, fri/verify.h Verify/VerifyQuery, fri/fri_config.h FoldMatrix/FoldRow).

Every convention follows the reference exactly so that, fed the same
matrices and challenger state, the transcript stream, commitments, proof
fields and final evaluations are value-identical:

  * commit: per-matrix coset LDE onto g*H (g = multiplicative group
    generator), rows stored in BIT-REVERSED order
    (radix2_evaluation_domain.h CosetLDEBatch with reverse_at_last=false);
    ONE FieldMerkleTree MMCS per commit over all matrices (mixed heights);
  * open (two_adic_fri.h CreateOpeningProof): alpha <- challenger;
    per-matrix alpha-combined rows; per-(point,height) inverse denominators
    over the bitrev coset; reduced openings keyed by log-height with
    PER-HEIGHT alpha-power offsets (num_reduced[]); commit phase pairs
    ADJACENT bitrev entries into (half, 2)-ext matrices, observes each
    commitment, samples beta, folds with
      ret[r] = (1/2 + b/2 * w^-rev(r)) * lo + (1/2 - b/2 * w^-rev(r)) * hi
    (fri_config.h FoldMatrix — note NO coset shift: the fold relabels the
    coset gH as H, which preserves degrees); final constant observed; PoW
    grind; per query index <- SampleBits(log_global_max), input openings at
    index >> (log_global_max - log_round_max), fold-layer openings keep only
    the SIBLING value (prove.h AnswerQuery);
  * verify (verify.h): replays betas, checks PoW, recomputes the reduced
    openings from the opened input rows (per-height alpha streams,
    x = g * w^rev(index >> bits_reduced)), reconstructs each fold-layer leaf
    row from its own running value + the proof sibling, checks the MMCS
    opening, folds (fri_config.h FoldRow), and compares to final_eval.

The PCS does NOT touch the challenger for input commitments or opened
values — callers observe those (matching the reference's caller-side
ObserveContainer2D / uni-stark schedule).

Transcript/index logic is host-exact; all bulk field work (LDEs, alpha
combination, quotients, folds, merkle hashing) is vectorized on device.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import merkle
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.poseidon2 import Poseidon2
from tachyon_tpu.math.extfield import ExtField
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.ntt import Radix2Domain, _bitrev_perm


@dataclasses.dataclass(frozen=False)
class FRIConfig:
    """reference: fri/fri_config.h:20-26."""

    log_blowup: int = 1
    num_queries: int = 10
    proof_of_work_bits: int = 8

    @property
    def blowup(self) -> int:
        return 1 << self.log_blowup


def _rev_bits(x: int, bits: int) -> int:
    return int(f"{x:0{bits}b}"[::-1], 2) if bits else 0


def ext_powers(ext: ExtField, z: jnp.ndarray, n: int) -> jnp.ndarray:
    """(D, L, n) table [1, z, z^2, ...] via device log-doubling."""
    tab = ext.ones((1,))
    cur = z[..., None] if z.ndim == ext.coeff_ndim else z
    while tab.shape[-1] < n:
        tab = jnp.concatenate([tab, ext.mul(tab, cur)], axis=-1)
        cur = ext.square(cur)
    return tab[..., :n]


def ext_tree_sum(ext: ExtField, arr: jnp.ndarray) -> jnp.ndarray:
    """Sum over the last axis with log-depth halving (modular adds)."""
    n = arr.shape[-1]
    m = 1 << max(n - 1, 0).bit_length()
    if m != n:
        pad = jnp.zeros(arr.shape[:-1] + (m - n,), dtype=arr.dtype)
        arr = jnp.concatenate([arr, pad], axis=-1)
    while m > 1:
        half = m // 2
        arr = ext.add(arr[..., :half], arr[..., half:])
        m = half
    return arr[..., 0]


class CommitData(NamedTuple):
    """Prover data for one Commit call (reference: MMCS ProverData +
    the coefficient forms the opener needs)."""

    tree: merkle.FieldMerkleTree
    ldes: tuple  # (L, H, C) bit-reversed-row LDE evals per matrix
    coeffs: tuple  # (L, n, C) plain coefficient form per matrix
    heights: tuple  # LDE heights H per matrix
    log_max: int  # log2(max LDE height in this commit)

    def root(self) -> jnp.ndarray:
        return self.tree.root()


class BatchOpening(NamedTuple):
    """reference: fri_proof.h BatchOpening."""

    opened_values: tuple  # per matrix: (L, C) base rows (bitrev index)
    opening_proof: tuple  # merkle path digests


class CommitPhaseProofStep(NamedTuple):
    """reference: fri_proof.h CommitPhaseProofStep — sibling only; the
    verifier reconstructs its own value from the fold chain."""

    sibling_value: jnp.ndarray  # (D, L)
    opening_proof: tuple  # merkle path digests


class QueryProof(NamedTuple):
    input_proof: tuple  # per round: BatchOpening
    commit_phase_openings: tuple  # per fold layer: CommitPhaseProofStep


class FRIProof(NamedTuple):
    """reference: fri_proof.h FRIProof."""

    commit_phase_commits: tuple  # (L, DIGEST) roots per fold layer
    query_proofs: tuple  # num_queries QueryProofs
    final_eval: jnp.ndarray  # (D, L)
    pow_witness: int


class TwoAdicFRIPCS:
    def __init__(
        self,
        F: PrimeField,
        ext: ExtField,
        hasher: Poseidon2,
        config: FRIConfig,
    ):
        self.F = F
        self.ext = ext
        self.h = hasher
        self.cfg = config
        self._dom_cache: dict[int, Radix2Domain] = {}

    def _domain(self, n: int) -> Radix2Domain:
        if n not in self._dom_cache:
            self._dom_cache[n] = Radix2Domain(self.F, n)
        return self._dom_cache[n]

    def _observe_root(self, challenger, root) -> None:
        root = np.asarray(root)
        for i in range(merkle.DIGEST):
            challenger.observe(int(self.F.decode(root[:, i])))

    def _observe_ext(self, challenger, value) -> None:
        value = np.asarray(value)
        for d in range(self.ext.D):
            challenger.observe(int(self.F.decode(value[d])))

    # ------------------------------------------------------------------ commit
    def commit(
        self,
        matrices: Sequence[jnp.ndarray],
        shifts: Sequence[int] | None = None,
    ) -> CommitData:
        """matrices[i]: (L, n_i, C_i) evaluations over shifts[i]*H_{n_i}
        (shift 1 = the natural domain).  Commits the bit-reversed LDEs over
        g*H_{n<<log_blowup} in ONE mixed-height merkle tree.

        Reference: two_adic_fri.h Commit — CosetLDEBatch(mat, log_blowup,
        g * offset_inv, reverse_at_last=false) then MMCS CommitOwned.
        """
        F, blow = self.F, self.cfg.log_blowup
        g = F.spec.generator
        if shifts is None:
            shifts = [1] * len(matrices)
        ldes, coeffs = [], []
        for m, s in zip(matrices, shifts):
            n = m.shape[1]
            dom = self._domain(n)
            cf = dom.coset_ifft(m, s) if s != 1 else dom.ifft(m)
            coeffs.append(cf)
            H = n << blow
            big = self._domain(H)
            pad = jnp.zeros((cf.shape[0], H - n) + cf.shape[2:], cf.dtype)
            lde = big.coset_fft(jnp.concatenate([cf, pad], axis=1), g)
            perm = jnp.asarray(_bitrev_perm(H.bit_length() - 1))
            ldes.append(jnp.take(lde, perm, axis=1))
        tree = merkle.build(self.h, ldes)
        max_h = max(l.shape[1] for l in ldes)
        return CommitData(
            tree,
            tuple(ldes),
            tuple(coeffs),
            tuple(l.shape[1] for l in ldes),
            max_h.bit_length() - 1,
        )

    def get_evaluations_on_domain(
        self, data: CommitData, idx: int, size: int
    ) -> jnp.ndarray:
        """Evaluations of committed matrix `idx` on g*H_size, natural order
        (reference: vendors/sp1/src/baby_bear_poseidon2.rs:718
        get_evaluations_on_domain — the first `size` bitrev LDE rows,
        re-bit-reversed).  SP1 uses this for trace evals on the quotient
        domain."""
        lde = data.ldes[idx]
        assert lde.shape[1] >= size
        perm = jnp.asarray(_bitrev_perm(size.bit_length() - 1))
        return jnp.take(lde[:, :size], perm, axis=1)

    # -------------------------------------------------------------------- open
    def _eval_at_ext(self, coeffs: jnp.ndarray, z) -> jnp.ndarray:
        """base coeffs (L, n, C) at ext z (D, L) -> (D, L, C).

        Value-equal to the reference's barycentric InterpolateCoset
        (two_adic_fri.h:340): both evaluate the unique interpolant.
        """
        ext = self.ext
        n = coeffs.shape[1]
        zp = ext_powers(ext, z, n)  # (D, L, n)
        terms = ext.mul_base(zp[..., None], coeffs)  # (D, L, n, C)
        m = 1 << max(n - 1, 0).bit_length()
        if m != n:
            padshape = terms.shape[:2] + (m - n,) + terms.shape[3:]
            terms = jnp.concatenate(
                [terms, jnp.zeros(padshape, terms.dtype)], axis=2
            )
        while m > 1:
            half = m // 2
            terms = ext.add(terms[:, :, :half], terms[:, :, half:])
            m = half
        return terms[:, :, 0]  # (D, L, C)

    def _coset_x_bitrev(self, log_h: int) -> jnp.ndarray:
        """(L, 2^log_h) base table x_i = g * w^rev(i) over the LDE coset."""
        F = self.F
        H = 1 << log_h
        dom = self._domain(H)
        wp = dom.shift_powers(dom.omega_int, H)  # (L, H): w^j natural
        sc = F.encode(np.array(F.spec.generator, dtype=object))
        xs = F.mul(wp, sc[:, None])
        return jnp.take(xs, jnp.asarray(_bitrev_perm(log_h)), axis=1)

    def create_opening_proof(
        self,
        data_by_round: Sequence[CommitData],
        points_by_round: Sequence[Sequence[Sequence[list[int]]]],
        challenger: DuplexChallenger,
    ) -> tuple[tuple, FRIProof]:
        """points_by_round[r][m] = list of ext points (each a list of D
        coefficient ints) to open round r's matrix m at.  The caller must
        already have observed the commitments (reference: the PCS samples
        alpha as its FIRST challenger interaction,
        two_adic_fri.h CreateOpeningProof).

        Returns (opened_values, proof); opened_values[r][m][pt] is (D, L, C).
        """
        F, ext, cfg = self.F, self.ext, self.cfg
        D = ext.D

        alpha_int = challenger.sample_ext(D)
        alpha = ext.encode([np.array(c, dtype=object) for c in alpha_int])

        log_global_max = max(d.log_max for d in data_by_round)

        # Pre-compute 1/(x - z) per unique point over its largest subgroup,
        # in bitrev order (two_adic_fri.h ComputeInverseDenominators).  The
        # bitrev table of H_k is a prefix of the bitrev table of H_m (k<m),
        # so slicing [:H] specializes to smaller heights.
        max_log_for_point: dict[tuple, int] = {}
        z_enc: dict[tuple, jnp.ndarray] = {}
        for data, pts in zip(data_by_round, points_by_round):
            for m_idx, H in enumerate(data.heights):
                log_h = H.bit_length() - 1
                for z_int in pts[m_idx]:
                    key = tuple(z_int)
                    if key not in z_enc:
                        z_enc[key] = ext.encode(
                            [np.array(c, dtype=object) for c in z_int]
                        )
                    max_log_for_point[key] = max(
                        max_log_for_point.get(key, 0), log_h
                    )
        inv_denoms: dict[tuple, jnp.ndarray] = {}
        for key, log_h in max_log_for_point.items():
            xs = self._coset_x_bitrev(log_h)  # (L, H)
            denom = ext.sub(ext.embed(xs), z_enc[key][..., None])
            inv_denoms[key] = ext.batch_inverse(denom, axis=-1)  # (D, L, H)

        # Reduced openings per log-height with per-height alpha offsets
        # (two_adic_fri.h:126-186: reduced_openings[32] + num_reduced[32]).
        ro: dict[int, jnp.ndarray] = {}
        num_reduced: dict[int, int] = {}
        opened_values = []
        for data, pts in zip(data_by_round, points_by_round):
            round_values = []
            for m_idx, (lde, cf) in enumerate(zip(data.ldes, data.coeffs)):
                H, C = lde.shape[1], lde.shape[2]
                log_h = H.bit_length() - 1
                apows = ext_powers(ext, alpha, C)  # (D, L, C)
                # reduced_rows = sum_c alpha^c * LDE[:, c]   (DotExtPowers)
                red_rows = ext_tree_sum(
                    ext, ext.mul_base(apows[:, :, None, :], lde)
                )  # (D, L, H)
                mat_values = []
                for z_int in pts[m_idx]:
                    key = tuple(z_int)
                    z = z_enc[key]
                    ys = self._eval_at_ext(cf, z)  # (D, L, C)
                    mat_values.append(ys)
                    red_ys = ext_tree_sum(ext, ext.mul(apows, ys))  # (D, L)
                    off = num_reduced.get(log_h, 0)
                    num_reduced[log_h] = off + C
                    a_off = ext.pow_const(alpha, off)  # (D, L)
                    term = ext.mul(
                        ext.sub(red_rows, red_ys[..., None]),
                        inv_denoms[key][:, :, :H],
                    )
                    term = ext.mul(term, a_off[..., None])
                    ro[log_h] = (
                        ext.add(ro[log_h], term) if log_h in ro else term
                    )
                round_values.append(tuple(mat_values))
            opened_values.append(tuple(round_values))
        opened_values = tuple(opened_values)

        # Commit phase (fri/prove.h CommitPhase).
        cur = ro.pop(log_global_max)
        fold_trees: list[merkle.FieldMerkleTree] = []
        commits: list[jnp.ndarray] = []
        betas: list[jnp.ndarray] = []
        log_h = log_global_max
        p = F.p
        inv2 = pow(2, p - 2, p)
        inv2_ext = ext.embed(F.encode(np.array(inv2, dtype=object)))
        while (1 << log_h) > cfg.blowup:
            half = 1 << (log_h - 1)
            lo = cur[..., 0::2]  # adjacent bitrev entries pair up
            hi = cur[..., 1::2]
            leaves = jnp.concatenate(
                [jnp.moveaxis(lo, 0, -1), jnp.moveaxis(hi, 0, -1)], axis=-1
            )  # (L, half, 2D): [lo coeffs..., hi coeffs...] per row
            tree = merkle.build(self.h, [leaves])
            fold_trees.append(tree)
            commits.append(tree.root())
            self._observe_root(challenger, tree.root())
            beta_int = challenger.sample_ext(D)
            beta = ext.encode([np.array(c, dtype=object) for c in beta_int])
            betas.append(beta)
            # FoldMatrix: pw[r] = beta/2 * w^-rev(r), w = root of size 2^log_h
            dom = self._domain(1 << log_h)
            winv_nat = dom.shift_powers(dom.omega_inv_int, half)  # (L, half)
            winv = jnp.take(
                winv_nat, jnp.asarray(_bitrev_perm(log_h - 1)), axis=1
            )
            half_beta = ext.mul(beta, inv2_ext)
            pw = ext.mul_base(half_beta[..., None], winv)  # (D, L, half)
            cur = ext.add(
                ext.mul(ext.add(inv2_ext[..., None], pw), lo),
                ext.mul(ext.sub(inv2_ext[..., None], pw), hi),
            )
            log_h -= 1
            if log_h in ro:
                cur = ext.add(cur, ro.pop(log_h))
        assert not ro, "leftover reduced openings below blowup height"
        final_eval = cur[..., 0]  # all entries equal (degree 0)
        self._observe_ext(challenger, final_eval)

        pow_witness = challenger.grind(cfg.proof_of_work_bits)

        # Query phase (fri/prove.h Prove + AnswerQuery).
        query_proofs = []
        for _ in range(cfg.num_queries):
            index = challenger.sample_bits(log_global_max)
            input_proof = []
            for data in data_by_round:
                mp = merkle.open_at(
                    data.tree, index >> (log_global_max - data.log_max)
                )
                input_proof.append(BatchOpening(mp.opened_rows, mp.siblings))
            steps = []
            for i, tree in enumerate(fold_trees):
                index_i = index >> i
                mp = merkle.open_at(tree, index_i >> 1)
                row = mp.opened_rows[0]  # (L, 2D)
                sib = (index_i ^ 1) & 1
                sibling = jnp.moveaxis(
                    row[:, sib * D : (sib + 1) * D], -1, 0
                )  # (D, L)
                steps.append(CommitPhaseProofStep(sibling, mp.siblings))
            query_proofs.append(QueryProof(tuple(input_proof), tuple(steps)))

        return opened_values, FRIProof(
            commit_phase_commits=tuple(commits),
            query_proofs=tuple(query_proofs),
            final_eval=final_eval,
            pow_witness=pow_witness,
        )

    # ------------------------------------------------------------------ verify
    def verify_opening_proof(
        self,
        commits_by_round: Sequence[jnp.ndarray],  # MMCS roots
        dims_by_round: Sequence[Sequence[tuple[int, int]]],  # (orig_n, C)
        points_by_round: Sequence[Sequence[Sequence[list[int]]]],
        opened_values: Sequence,  # [r][m][pt]: (D, L, C) claimed evals
        proof: FRIProof,
        challenger: DuplexChallenger,
    ) -> bool:
        """reference: two_adic_fri.h VerifyOpeningProof + fri/verify.h.
        The caller must already have observed the input commitments."""
        F, ext, cfg = self.F, self.ext, self.cfg
        D = ext.D
        p = F.p
        g = F.spec.generator
        blow = cfg.log_blowup

        alpha_int = challenger.sample_ext(D)
        alpha = ext.encode([np.array(c, dtype=object) for c in alpha_int])

        log_global_max = len(proof.commit_phase_commits) + blow

        betas = []
        for root in proof.commit_phase_commits:
            self._observe_root(challenger, root)
            beta_int = challenger.sample_ext(D)
            betas.append(
                ext.encode([np.array(c, dtype=object) for c in beta_int])
            )
        self._observe_ext(challenger, proof.final_eval)

        if len(proof.query_proofs) != cfg.num_queries:
            return False
        if not challenger.check_witness(
            cfg.proof_of_work_bits, proof.pow_witness
        ):
            return False

        z_enc: dict[tuple, jnp.ndarray] = {}
        inv2 = pow(2, p - 2, p)
        inv2_ext = ext.embed(F.encode(np.array(inv2, dtype=object)))

        for qp in proof.query_proofs:
            index = challenger.sample_bits(log_global_max)

            # Recompute reduced openings (two_adic_fri.h verifier lambda).
            ro_val: dict[int, jnp.ndarray] = {}
            ro_pow: dict[int, jnp.ndarray] = {}
            for r_idx, (root, dims, pts) in enumerate(
                zip(commits_by_round, dims_by_round, points_by_round)
            ):
                lde_dims = [(n << blow, C) for n, C in dims]
                batch_max = max(h for h, _ in lde_dims)
                bits_reduced = log_global_max - (batch_max.bit_length() - 1)
                reduced_index = index >> bits_reduced
                batch = qp.input_proof[r_idx]
                mp = merkle.MerkleProof(
                    batch.opened_values, batch.opening_proof
                )
                if not merkle.verify(self.h, root, lde_dims, reduced_index, mp):
                    return False
                for m_idx, (H, C) in enumerate(lde_dims):
                    log_h = H.bit_length() - 1
                    rev_reduced = _rev_bits(
                        index >> (log_global_max - log_h), log_h
                    )
                    dom = self._domain(H)
                    x_int = (g * pow(dom.omega_int, rev_reduced, p)) % p
                    x = ext.embed(F.encode(np.array(x_int, dtype=object)))
                    row = ext.embed(batch.opened_values[m_idx])  # (D, L, C)
                    if log_h not in ro_val:
                        ro_val[log_h] = ext.zeros(())
                        ro_pow[log_h] = ext.ones(())
                    for pt_idx, z_int in enumerate(pts[m_idx]):
                        key = tuple(z_int)
                        if key not in z_enc:
                            z_enc[key] = ext.encode(
                                [np.array(c, dtype=object) for c in z_int]
                            )
                        z = z_enc[key]
                        denom_inv = ext.inv(ext.sub(x, z))
                        ys = opened_values[r_idx][m_idx][pt_idx]  # (D, L, C)
                        if ys.shape[-1] != C:
                            return False
                        # quotient_c = (row_c - ys_c) / (x - z); the running
                        # per-height pow stream (pow * alpha^c) mirrors the
                        # prover's num_reduced counters.
                        apows = ext.mul(
                            ext_powers(ext, alpha, C),
                            ro_pow[log_h][..., None],
                        )
                        diff = ext.sub(row, ys)
                        contrib = ext_tree_sum(
                            ext,
                            ext.mul(ext.mul(diff, apows), denom_inv[..., None]),
                        )
                        ro_val[log_h] = ext.add(ro_val[log_h], contrib)
                        ro_pow[log_h] = ext.mul(
                            ro_pow[log_h], ext.pow_const(alpha, C)
                        )
            # Fold walk (fri/verify.h VerifyQuery).
            folded = ext.zeros(())
            idx = index
            if len(qp.commit_phase_openings) != len(betas):
                return False
            for step_idx, step in enumerate(qp.commit_phase_openings):
                log_folded = log_global_max - step_idx - 1
                if (log_folded + 1) in ro_val:
                    folded = ext.add(folded, ro_val.pop(log_folded + 1))
                sib = (idx ^ 1) & 1
                pair_idx = idx >> 1
                e = [folded, folded]
                e[sib] = step.sibling_value
                row = jnp.concatenate(
                    [jnp.moveaxis(e[0], 0, -1), jnp.moveaxis(e[1], 0, -1)],
                    axis=-1,
                )  # (L, 2D)
                mp = merkle.MerkleProof((row,), step.opening_proof)
                if not merkle.verify(
                    self.h,
                    proof.commit_phase_commits[step_idx],
                    [(1 << log_folded, 2 * D)],
                    pair_idx,
                    mp,
                ):
                    return False
                # FoldRow: x = w^rev(pair_idx) over size 2^(log_folded+1);
                # xs = [x, -x]; result = e0 + (beta - x)(e1 - e0)/(-2x).
                dom = self._domain(1 << (log_folded + 1))
                x_int = pow(dom.omega_int, _rev_bits(pair_idx, log_folded), p)
                x = ext.embed(F.encode(np.array(x_int, dtype=object)))
                diff = ext.sub(e[1], e[0])
                neg_inv_2x = ext.neg(
                    ext.mul(
                        inv2_ext,
                        ext.embed(
                            F.encode(np.array(pow(x_int, p - 2, p), dtype=object))
                        ),
                    )
                )
                folded = ext.add(
                    e[0],
                    ext.mul(
                        ext.mul(ext.sub(betas[step_idx], x), diff), neg_inv_2x
                    ),
                )
                idx = pair_idx
            if idx >= cfg.blowup:
                return False
            if ro_val:
                return False
            if not bool(np.asarray(ext.eq(folded, proof.final_eval)).all()):
                return False
        return True
