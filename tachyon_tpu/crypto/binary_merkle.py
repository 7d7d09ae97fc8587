"""Simple binary Merkle tree over field-element leaves.

Analog of reference: tachyon/crypto/commitments/merkle_tree/
binary_merkle_tree/binary_merkle_tree.h (2-ary hash tree + inclusion proofs).
Generic over a 2-to-1 compressor (e.g. Poseidon2.compress) and a leaf
hasher; layers built fully batched.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp


class BinaryMerkleTree(NamedTuple):
    layers: tuple  # each (L, DIGEST, n)

    def root(self):
        return self.layers[-1][:, :, 0]


def build(compress: Callable, leaf_digests: jnp.ndarray) -> BinaryMerkleTree:
    """leaf_digests: (L, DIGEST, n) with n a power of two."""
    n = leaf_digests.shape[-1]
    assert n & (n - 1) == 0
    layers = [leaf_digests]
    cur = leaf_digests
    while cur.shape[-1] > 1:
        cur = compress(cur[:, :, 0::2], cur[:, :, 1::2])
        layers.append(cur)
    return BinaryMerkleTree(tuple(layers))


class BinaryMerkleProof(NamedTuple):
    siblings: tuple  # (L, DIGEST) per level


def open_at(tree: BinaryMerkleTree, index: int) -> BinaryMerkleProof:
    sibs = []
    idx = index
    for layer in tree.layers[:-1]:
        sibs.append(layer[:, :, idx ^ 1])
        idx >>= 1
    return BinaryMerkleProof(tuple(sibs))


def verify(
    compress: Callable,
    root,
    index: int,
    leaf_digest,
    proof: BinaryMerkleProof,
) -> bool:
    cur = leaf_digest[:, :, None]
    idx = index
    for sib in proof.siblings:
        sib = sib[:, :, None]
        if idx & 1:
            cur = compress(sib, cur)
        else:
            cur = compress(cur, sib)
        idx >>= 1
    return bool(np.asarray(cur[:, :, 0] == root).all())
