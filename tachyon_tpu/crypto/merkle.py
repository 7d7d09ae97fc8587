"""FieldMerkleTree MMCS (Plonky3-compatible mixed matrix commitment scheme).

TPU-native analog of the reference's FieldMerkleTree / FieldMerkleTreeMMCS
(reference: tachyon/crypto/commitments/merkle_tree/field_merkle_tree/
field_merkle_tree.h Build/CreateFirstDigestLayer/CompressAndInject,
field_merkle_tree_mmcs.h).  The reference packs 8 rows into SIMD lanes and
parallelizes chunks; here every digest layer is one batched Poseidon2 call
over all rows at once.

Semantics (bit-compatible with plonky3):
  * layer 0: digest_i = H(concat of row i of all tallest matrices)
  * next layers: d_i = C(prev_{2i}, prev_{2i+1}); if matrices of matching
    height are injected: d_i = C(C(prev_{2i}, prev_{2i+1}), H(row_i))
  * H = rate-8 padding-free sponge squeeze-8; C = truncated permutation.

Restriction (v1): matrix heights must be powers of two (always true for the
FRI/LDE path).  Digest layout: (L, DIGEST, n).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto.poseidon2 import Poseidon2

DIGEST = 8
RATE = 8


class FieldMerkleTree(NamedTuple):
    leaves: tuple  # matrices (L, rows, cols), original order
    digest_layers: tuple  # (L, DIGEST, n) per level, n halving

    def root(self) -> jnp.ndarray:
        return self.digest_layers[-1][:, :, 0]


def _hash_rows(h: Poseidon2, mats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Hash row-wise concat of same-height matrices -> (L, DIGEST, rows)."""
    rows = mats[0].shape[1]
    # (L, total_cols, rows): sponge absorbs along axis 1, batch = rows
    cat = jnp.concatenate([jnp.moveaxis(m, 1, -1) for m in mats], axis=1)
    return h.hash_no_pad(cat, DIGEST, rate=RATE)


def build(h: Poseidon2, matrices: Sequence[jnp.ndarray]) -> FieldMerkleTree:
    """matrices: list of (L, rows, cols) in caller order (kept for opening)."""
    assert matrices, "at least one matrix"
    for m in matrices:
        r = m.shape[1]
        assert r & (r - 1) == 0, "v1 requires power-of-two heights"
    order = sorted(range(len(matrices)), key=lambda i: -matrices[i].shape[1])
    sorted_mats = [matrices[i] for i in order]

    tallest_h = sorted_mats[0].shape[1]
    first = [m for m in sorted_mats if m.shape[1] == tallest_h]
    rest = [m for m in sorted_mats if m.shape[1] != tallest_h]

    layers = [_hash_rows(h, first)]
    while layers[-1].shape[-1] > 1:
        prev = layers[-1]
        n_next = prev.shape[-1] // 2
        left = prev[:, :, 0::2]
        right = prev[:, :, 1::2]
        d = h.compress(left, right)
        inject = [m for m in rest if m.shape[1] == n_next]
        if inject:
            rest = [m for m in rest if m.shape[1] != n_next]
            hr = _hash_rows(h, inject)
            d = h.compress(d, hr)
        layers.append(d)
    assert not rest, "matrix heights must divide down the tree"
    return FieldMerkleTree(tuple(matrices), tuple(layers))


class MerkleProof(NamedTuple):
    opened_rows: tuple  # per matrix (original order): (L, cols) row values
    siblings: tuple  # per level: (L, DIGEST) digests


def open_at(tree: FieldMerkleTree, index: int) -> MerkleProof:
    """Open all matrices at a leaf index (index in tallest-height units).

    Reference: field_merkle_tree_mmcs.h CreateOpeningProof.
    """
    max_h = max(m.shape[1] for m in tree.leaves)
    opened = []
    for m in tree.leaves:
        shift = (max_h // m.shape[1]).bit_length() - 1
        opened.append(m[:, index >> shift, :])
    sibs = []
    idx = index
    for layer in tree.digest_layers[:-1]:
        sibs.append(layer[:, :, idx ^ 1])
        idx >>= 1
    return MerkleProof(tuple(opened), tuple(sibs))


def verify(
    h: Poseidon2,
    root: jnp.ndarray,
    dims: Sequence[tuple[int, int]],  # (rows, cols) per matrix, caller order
    index: int,
    proof: MerkleProof,
) -> bool:
    """Recompute the root from opened rows + siblings (host-driven)."""
    F = h.F
    heights = [r for r, _ in dims]
    max_h = max(heights)
    order = sorted(range(len(dims)), key=lambda i: -heights[i])
    by_height: dict[int, list[jnp.ndarray]] = {}
    for i in order:
        by_height.setdefault(heights[i], []).append(
            proof.opened_rows[i][:, None, :]  # (L, 1 row, cols)
        )

    cur = _hash_rows(h, by_height.pop(max_h))  # (L, DIGEST, 1)
    idx = index
    level_h = max_h
    for sib in proof.siblings:
        sib = sib[:, :, None]
        if idx & 1:
            left, right = sib, cur
        else:
            left, right = cur, sib
        cur = h.compress(left, right)
        idx >>= 1
        level_h //= 2
        if level_h in by_height:
            hr = _hash_rows(h, by_height.pop(level_h))
            cur = h.compress(cur, hr)
    if by_height:
        return False
    return bool(np.asarray(F.eq(cur[:, :, 0], root)).all())
