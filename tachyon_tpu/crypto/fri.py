"""TwoAdicFRI polynomial commitment scheme (Plonky3/SP1-style architecture).

TPU-native analog of the reference's TwoAdicFRI
(reference: tachyon/crypto/commitments/fri/two_adic_fri.h Commit/
CreateOpeningProof, fri/prove.h CommitPhase, fri/verify.h,
fri/fri_config.h).  Components:

  * commit: per-matrix coset LDE batch (blowup 2^log_blowup) + field-merkle
    MMCS commitment;
  * open: out-of-domain evals, alpha-batched two-adic quotient reduction,
    beta-fold commit phase, PoW grind, query phase with merkle openings;
  * verify: recompute reduced openings at query points and walk the fold
    chain down to the final constant.

Domain convention (documented deviation from plonky3's bit-reversed
layout, revisited for bit-compat later): all arrays are NATURAL order; a
matrix of LDE height h is evaluated on the coset  g^(2^k) * H_h  with
k = log2(max_h) - log2(h), which makes every fold layer's domain equal the
square of its parent's -- the fold chain and the injected reduced openings
then live on identical domains by construction.

Fold rule (x -> x^2):  f'(x^2) = (f(x)+f(-x))/2 + beta * (f(x)-f(-x))/(2x).
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
from tachyon_tpu.math.ntt import Radix2Domain


@dataclasses.dataclass(frozen=False)
class FRIConfig:
    """reference: fri/fri_config.h:20-26."""

    log_blowup: int = 1
    num_queries: int = 10
    proof_of_work_bits: int = 8


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
    trees: tuple  # one FieldMerkleTree per LDE height (descending)
    tree_heights: tuple  # LDE height per tree
    tree_members: tuple  # per tree: original matrix indices
    ldes: tuple  # (L, h, C) natural-order LDE evals per matrix
    coeffs: tuple  # (L, n, C) coefficient form per matrix
    heights: tuple  # original heights n

    def roots(self):
        return tuple(t.root() for t in self.trees)


class FRIProof(NamedTuple):
    # per round -> per matrix -> per point: (D, L, C) ext evals
    opened_values: tuple
    fold_roots: tuple  # (L, DIGEST) per fold layer
    final_poly: jnp.ndarray  # (D, L) constant
    pow_witness: int
    query_indices: tuple
    # per query -> per round -> per tree: MerkleProof
    query_input_proofs: tuple
    query_fold_proofs: tuple  # per query: tuple of per-layer MerkleProof


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

    def _shift_for_height(self, lde_h: int, max_h: int = 0) -> int:
        """Coset shift for a height-h LDE: g^(2^(two_adicity - log2 h)).

        Anchored to the field's two-adicity (not the per-commit max height)
        so the chain shift(h/2) = shift(h)^2 holds across independent
        commits — multi-round opens mix matrices from different commit
        calls into one fold chain.  max_h is accepted and ignored.
        """
        k = self.F.spec.two_adicity - (lde_h.bit_length() - 1)
        return pow(self.F.spec.generator, 1 << k, self.F.p)

    # ------------------------------------------------------------------ commit
    def commit(self, matrices: Sequence[jnp.ndarray]) -> CommitData:
        """matrices: (L, n, C) evaluations over H_n. Commits their LDEs."""
        blow = self.cfg.log_blowup
        max_h = max(m.shape[1] for m in matrices) << blow
        ldes, coeffs = [], []
        for m in matrices:
            n = m.shape[1]
            dom = self._domain(n)
            cf = dom.ifft(m)
            coeffs.append(cf)
            big = self._domain(n << blow)
            pad = jnp.zeros((cf.shape[0], (n << blow) - n) + cf.shape[2:], cf.dtype)
            shift = self._shift_for_height(n << blow, max_h)
            ldes.append(big.coset_fft(jnp.concatenate([cf, pad], axis=1), shift))
        # one tree per height: the natural-order fold chain consumes row
        # q mod h for a height-h matrix, which a single mixed tree cannot
        # bind (it forces q >> diff); separate trees restore consistency.
        by_h: dict[int, list[int]] = {}
        for i, l in enumerate(ldes):
            by_h.setdefault(l.shape[1], []).append(i)
        trees, tree_hs, tree_members = [], [], []
        for hgt in sorted(by_h, reverse=True):
            idxs = by_h[hgt]
            trees.append(merkle.build(self.h, [ldes[i] for i in idxs]))
            tree_hs.append(hgt)
            tree_members.append(tuple(idxs))
        return CommitData(
            tuple(trees), tuple(tree_hs), tuple(tree_members),
            tuple(ldes), tuple(coeffs), tuple(m.shape[1] for m in matrices)
        )

    # -------------------------------------------------------------------- open
    def _eval_at_ext(self, coeffs: jnp.ndarray, z) -> jnp.ndarray:
        """base coeffs (L, n, C) at ext z (D, L) -> (D, L, C)."""
        ext = self.ext
        n, C = coeffs.shape[1], coeffs.shape[2]
        zp = ext_powers(ext, z, n)  # (D, L, n)
        # mul_base multiplies ext (D,L,n,1) by base (L,n,C) broadcast:
        terms = ext.mul_base(zp[..., None], coeffs)
        s = terms
        m = 1 << max(n - 1, 0).bit_length()
        if m != n:
            padshape = s.shape[:2] + (m - n,) + s.shape[3:]
            s = jnp.concatenate([s, jnp.zeros(padshape, s.dtype)], axis=2)
        while m > 1:
            half = m // 2
            s = ext.add(s[:, :, :half], s[:, :, half:])
            m = half
        return s[:, :, 0]  # (D, L, C)

    def open(
        self,
        data: CommitData,
        z_int: list[int],
        challenger: DuplexChallenger,
    ) -> FRIProof:
        """Single-round sugar: open every matrix at one ext point z."""
        points = [[z_int]] * len(data.ldes)
        return self.open_rounds([(data, points)], challenger)

    def open_rounds(
        self,
        rounds: Sequence[tuple],
        challenger: DuplexChallenger,
    ) -> FRIProof:
        """Plonky3-style multi-round open (reference: two_adic_fri.h
        CreateOpeningProof over Vec<(ProverData, Vec<Vec<Point>>)>).

        rounds: list of (CommitData, points) where points[m] is the list of
        ext points (each a list of D coeff ints) to open matrix m at.
        """
        F, ext, cfg = self.F, self.ext, self.cfg
        D = ext.D

        # 0. bind the input commitments (round order)
        for data, _pts in rounds:
            for t in data.trees:
                root = np.asarray(t.root())  # one device->host transfer
                for i in range(merkle.DIGEST):
                    challenger.observe(int(F.decode(root[:, i])))

        # 1. out-of-domain evaluations: per round/matrix/point
        opened = []
        z_enc: dict[tuple, jnp.ndarray] = {}
        for data, pts in rounds:
            r_open = []
            for m_idx, cf in enumerate(data.coeffs):
                m_open = []
                for z_int in pts[m_idx]:
                    key = tuple(z_int)
                    if key not in z_enc:
                        z_enc[key] = ext.encode(
                            [np.array(c, dtype=object) for c in z_int]
                        )
                    ov = self._eval_at_ext(cf, z_enc[key])
                    m_open.append(ov)
                    ov_h = np.asarray(ov)  # one transfer for the whole block
                    for c in range(ov_h.shape[-1]):
                        for d in range(D):
                            challenger.observe(int(F.decode(ov_h[d, :, c])))
                r_open.append(tuple(m_open))
            opened.append(tuple(r_open))
        opened = tuple(opened)

        alpha_int = challenger.sample_ext(D)
        alpha = ext.encode([np.array(c, dtype=object) for c in alpha_int])

        # 2. reduced openings per LDE height:
        #    ro = sum_{(matrix, point, col)} a^k (M_col - y)/(x - z)
        blow = cfg.log_blowup
        max_h = max(
            m.shape[1] for data, _ in rounds for m in data.ldes
        )
        ro_by_height: dict[int, jnp.ndarray] = {}
        a_pow_offset = 0
        for r_idx, (data, pts) in enumerate(rounds):
            for m_idx, lde in enumerate(data.ldes):
                h = lde.shape[1]
                C = lde.shape[2]
                shift = self._shift_for_height(h, max_h)
                dom = self._domain(h)
                # coset points x_j = shift * w^j
                wp = dom.shift_powers(dom.omega_int, h)  # (L, h): w^j
                sc = F.encode(np.array(shift, dtype=object))
                xs = F.mul(wp, sc[:, None])
                x_ext = ext.embed(xs)  # (D, L, h)
                cols = ext.embed(lde)  # (D, L, h, C)
                for pt_idx, z_int in enumerate(pts[m_idx]):
                    z = z_enc[tuple(z_int)]
                    denom = ext.sub(x_ext, z[..., None])
                    inv_denom = ext.batch_inverse(denom, axis=-1)  # (D, L, h)
                    apows = ext_powers(ext, alpha, a_pow_offset + C)[
                        ..., a_pow_offset:
                    ]
                    y = opened[r_idx][m_idx][pt_idx]  # (D, L, C)
                    diff = ext.sub(cols, y[:, :, None, :])
                    num = ext.mul(diff, apows[:, :, None, :])
                    # tree-sum over columns C
                    mC = 1 << max(C - 1, 0).bit_length()
                    if mC != C:
                        pad = jnp.zeros(num.shape[:3] + (mC - C,), num.dtype)
                        num = jnp.concatenate([num, pad], axis=3)
                    while mC > 1:
                        half = mC // 2
                        num = ext.add(num[..., :half], num[..., half:])
                        mC = half
                    ro = ext.mul(num[..., 0], inv_denom)  # (D, L, h)
                    if h in ro_by_height:
                        ro_by_height[h] = ext.add(ro_by_height[h], ro)
                    else:
                        ro_by_height[h] = ro
                    a_pow_offset += C

        # 3. commit phase: fold from max height down to 2^log_blowup
        cur = ro_by_height.pop(max_h)
        betas: list[jnp.ndarray] = []
        fold_trees: list[merkle.FieldMerkleTree] = []
        h = max_h
        k = max_h.bit_length() - 1
        while h > (1 << blow):
            half = h // 2
            # commit pair matrix (rows j: [f[j] coords, f[j+half] coords])
            pair_cols = jnp.concatenate(
                [
                    jnp.moveaxis(cur[:, :, :half], 0, -1).reshape(
                        cur.shape[1], half, D
                    ),
                    jnp.moveaxis(cur[:, :, half:], 0, -1).reshape(
                        cur.shape[1], half, D
                    ),
                ],
                axis=2,
            )  # (L, half, 2D)
            tree = merkle.build(self.h, [pair_cols])
            fold_trees.append(tree)
            root = np.asarray(tree.root())
            for i in range(merkle.DIGEST):
                challenger.observe(int(F.decode(root[:, i])))
            beta_int = challenger.sample_ext(D)
            beta = ext.encode([np.array(c, dtype=object) for c in beta_int])
            cur = self._fold(cur, beta, h, max_h)
            betas.append(beta)
            h = half
            if h in ro_by_height:
                cur = ext.add(cur, ro_by_height.pop(h))
        assert not ro_by_height
        final = cur[..., 0]  # all entries equal (degree 0)
        final_h = np.asarray(final)
        for d in range(D):
            challenger.observe(int(F.decode(final_h[d])))

        # 4. PoW + queries
        pow_witness = challenger.grind(cfg.proof_of_work_bits)
        log_max = max_h.bit_length() - 1
        qs = [challenger.sample_bits(log_max) for _ in range(cfg.num_queries)]

        in_proofs, fold_proofs = [], []
        for q in qs:
            in_proofs.append(
                tuple(
                    tuple(
                        merkle.open_at(t, q % hgt)
                        for t, hgt in zip(data.trees, data.tree_heights)
                    )
                    for data, _ in rounds
                )
            )
            per_layer = []
            qi = q
            hh = max_h
            for tree in fold_trees:
                half = hh // 2
                per_layer.append(merkle.open_at(tree, qi % half))
                qi %= half
                hh = half
            fold_proofs.append(tuple(per_layer))

        return FRIProof(
            opened_values=opened,
            fold_roots=tuple(t.root() for t in fold_trees),
            final_poly=final,
            pow_witness=pow_witness,
            query_indices=tuple(qs),
            query_input_proofs=tuple(in_proofs),
            query_fold_proofs=tuple(fold_proofs),
        )

    def _fold(self, f: jnp.ndarray, beta, h: int, max_h: int) -> jnp.ndarray:
        """one fold layer: (D, L, h) -> (D, L, h/2)."""
        F, ext = self.F, self.ext
        half = h // 2
        shift = self._shift_for_height(h, max_h)
        p = F.p
        inv2 = pow(2, p - 2, p)
        dom = self._domain(h)
        winv = pow(dom.omega_int, h - 1, p)
        # 1/(2 x_j) = inv2 * shift^-1 * w^-j
        wj_inv = dom.shift_powers(winv, half)  # (L, half): w^-j
        c = F.encode(np.array((pow(shift, p - 2, p) * inv2) % p, dtype=object))
        inv_2x = F.mul(wj_inv, c.reshape((F.L,) + (1,) * (wj_inv.ndim - 1)))
        lo, hi = f[..., :half], f[..., half:]
        inv2c = F.encode(np.array(inv2, dtype=object))
        inv2b = inv2c.reshape((F.L,) + (1,) * (lo.ndim - 2))
        even = ext.mul_base(ext.add(lo, hi), inv2b)
        odd = ext.mul_base(ext.sub(lo, hi), inv_2x)
        return ext.add(even, ext.mul(odd, beta[..., None]))

    # ------------------------------------------------------------------ verify
    def verify(
        self,
        roots: Sequence[jnp.ndarray],  # per height group (descending height)
        dims: Sequence[tuple[int, int]],  # (lde_height, cols) per matrix
        z_int: list[int],
        proof: FRIProof,
        challenger: DuplexChallenger,
    ) -> bool:
        """Single-round sugar (see open)."""
        points = [[z_int]] * len(dims)
        return self.verify_rounds([(roots, dims, points)], proof, challenger)

    def verify_rounds(
        self,
        rounds: Sequence[tuple],
        proof: FRIProof,
        challenger: DuplexChallenger,
    ) -> bool:
        """rounds: list of (roots, dims, points); dims[m] = (lde_height,
        cols); points[m] = list of ext points (lists of D coeff ints)."""
        F, ext, cfg = self.F, self.ext, self.cfg
        D = ext.D
        # reconstruct the per-height grouping used at commit time, per round
        groupings = []
        for roots, dims, _pts in rounds:
            by_h: dict[int, list[int]] = {}
            for i, (h, _) in enumerate(dims):
                by_h.setdefault(h, []).append(i)
            group_heights = sorted(by_h, reverse=True)
            if len(roots) != len(group_heights):
                return False
            groupings.append((by_h, group_heights))
        z_enc: dict[tuple, jnp.ndarray] = {}
        for roots, _dims, _pts in rounds:
            for root in roots:
                root = np.asarray(root)
                for i in range(merkle.DIGEST):
                    challenger.observe(int(F.decode(root[:, i])))
        for r_idx, (_roots, dims, pts) in enumerate(rounds):
            for m_idx in range(len(dims)):
                for pt_idx, z_int in enumerate(pts[m_idx]):
                    key = tuple(z_int)
                    if key not in z_enc:
                        z_enc[key] = ext.encode(
                            [np.array(c, dtype=object) for c in z_int]
                        )
                    ov = np.asarray(proof.opened_values[r_idx][m_idx][pt_idx])
                    for c in range(ov.shape[-1]):
                        for d in range(D):
                            challenger.observe(int(F.decode(ov[d, :, c])))
        alpha_int = challenger.sample_ext(D)
        alpha = ext.encode([np.array(c, dtype=object) for c in alpha_int])

        max_h = max(h for _r, dims, _p in rounds for h, _ in dims)
        log_max = max_h.bit_length() - 1
        betas = []
        for r in proof.fold_roots:
            r = np.asarray(r)
            for i in range(merkle.DIGEST):
                challenger.observe(int(F.decode(r[:, i])))
            beta_int = challenger.sample_ext(D)
            betas.append(ext.encode([np.array(c, dtype=object) for c in beta_int]))
        final_h = np.asarray(proof.final_poly)
        for d in range(D):
            challenger.observe(int(F.decode(final_h[d])))
        if not challenger.check_witness(cfg.proof_of_work_bits, proof.pow_witness):
            return False
        qs = [challenger.sample_bits(log_max) for _ in range(cfg.num_queries)]
        if tuple(qs) != tuple(proof.query_indices):
            return False

        for qi_idx, q in enumerate(qs):
            # recompute reduced openings per height at this query
            ro_at: dict[int, jnp.ndarray] = {}
            a_off = 0
            for r_idx, (roots, dims, pts) in enumerate(rounds):
                inp = proof.query_input_proofs[qi_idx][r_idx]
                by_h, group_heights = groupings[r_idx]
                opened_by_matrix = {}
                for gi, hgt in enumerate(group_heights):
                    gdims = [(hgt, dims[i][1]) for i in by_h[hgt]]
                    if not merkle.verify(
                        self.h, roots[gi], gdims, q % hgt, inp[gi]
                    ):
                        return False
                    for k, i in enumerate(by_h[hgt]):
                        opened_by_matrix[i] = inp[gi].opened_rows[k]
                for m_idx, (h, C) in enumerate(dims):
                    idx = q % h
                    shift = self._shift_for_height(h, max_h)
                    dom = self._domain(h)
                    x_int = (shift * pow(dom.omega_int, idx, F.p)) % F.p
                    x = ext.embed(F.encode(np.array(x_int, dtype=object)))
                    row = opened_by_matrix[m_idx]  # (L, C)
                    for pt_idx, z_int in enumerate(pts[m_idx]):
                        z = z_enc[tuple(z_int)]
                        denom_inv = ext.inv(ext.sub(x, z))
                        y = proof.opened_values[r_idx][m_idx][pt_idx]
                        apows = ext_powers(ext, alpha, a_off + C)[..., a_off:]
                        diff = ext.sub(ext.embed(row), y)
                        num = ext_tree_sum(ext, ext.mul(diff, apows))
                        ro = ext.mul(num, denom_inv)
                        ro_at[h] = ext.add(ro_at[h], ro) if h in ro_at else ro
                        a_off += C
            # walk the fold chain
            cur_val = ro_at.pop(max_h)
            qi = q
            hh = max_h
            for li, layer_proof in enumerate(proof.query_fold_proofs[qi_idx]):
                half = hh // 2
                j = qi % half
                pair = layer_proof.opened_rows[0]  # (L, 2D)
                if not merkle.verify(
                    self.h,
                    proof.fold_roots[li],
                    [(half, 2 * D)],
                    j,
                    layer_proof,
                ):
                    return False
                f_lo = jnp.moveaxis(pair[:, :D], 1, 0)  # (D, L)
                f_hi = jnp.moveaxis(pair[:, D:], 1, 0)
                # check consistency with current value
                mine = f_lo if qi < half else f_hi
                if not bool(np.asarray(ext.eq(mine, cur_val)).all()):
                    return False
                # fold the pair
                shift = self._shift_for_height(hh, max_h)
                dom = self._domain(hh)
                p = F.p
                inv2 = pow(2, p - 2, p)
                x_j = (shift * pow(dom.omega_int, j, p)) % p
                inv_2x = F.encode(np.array((pow(x_j, p - 2, p) * inv2) % p, dtype=object))
                inv2c = F.encode(np.array(inv2, dtype=object))
                even = ext.mul_base(ext.add(f_lo, f_hi), inv2c)
                odd = ext.mul_base(ext.sub(f_lo, f_hi), inv_2x)
                cur_val = ext.add(even, ext.mul(odd, betas[li]))
                qi = j
                hh = half
                if hh in ro_at:
                    cur_val = ext.add(cur_val, ro_at.pop(hh))
            if ro_at:
                return False
            if not bool(np.asarray(ext.eq(cur_val, proof.final_poly)).all()):
                return False
        return True
