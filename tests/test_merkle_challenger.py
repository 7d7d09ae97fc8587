"""FieldMerkleTree MMCS + DuplexChallenger tests (golden vector from
reference: crypto/challenger/duplex_challenger_unittest.cc)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import merkle, poseidon2
from tachyon_tpu.crypto.challenger import DuplexChallenger


@pytest.fixture(scope="module")
def hasher():
    return poseidon2.baby_bear_p3_w16()


def _mat(F, rng, rows, cols):
    vals = np.array(
        [[rng.integers(0, F.p) for _ in range(cols)] for _ in range(rows)],
        dtype=object,
    )
    return F.encode(vals)


def test_single_matrix_tree(hasher, rng):
    F = hasher.F
    m = _mat(F, rng, 8, 3)
    tree = merkle.build(hasher, [m])
    assert len(tree.digest_layers) == 4
    root = tree.root()
    assert root.shape == (2, 8)
    for idx in [0, 3, 7]:
        proof = merkle.open_at(tree, idx)
        assert merkle.verify(hasher, root, [(8, 3)], idx, proof)
    # tampered root fails
    bad = F.add(root, F.ones((8,)))
    assert not merkle.verify(hasher, bad, [(8, 3)], 0, merkle.open_at(tree, 0))


def test_mixed_height_tree(hasher, rng):
    F = hasher.F
    mats = [_mat(F, rng, 8, 2), _mat(F, rng, 2, 5), _mat(F, rng, 8, 1)]
    tree = merkle.build(hasher, mats)
    root = tree.root()
    dims = [(8, 2), (2, 5), (8, 1)]
    for idx in range(8):
        proof = merkle.open_at(tree, idx)
        assert merkle.verify(hasher, root, dims, idx, proof)
    # wrong opened row value fails
    proof = merkle.open_at(tree, 0)
    bad_rows = list(proof.opened_rows)
    bad_rows[1] = F.add(bad_rows[1], F.ones((5,)))
    bad = merkle.MerkleProof(tuple(bad_rows), proof.siblings)
    assert not merkle.verify(hasher, root, dims, 0, bad)


def test_duplex_challenger_golden(hasher):
    ch = DuplexChallenger(hasher, rate=4)
    for i in range(20):
        ch.observe(i)
    answers = [
        1091695522, 747772208, 1145639564, 1789312616, 567623980,
        179016966, 125050365, 1725901131, 65962335, 1086560956,
    ]
    got = [ch.sample() for _ in range(10)]
    assert got == answers


def test_challenger_grind(hasher):
    ch = DuplexChallenger(hasher, rate=4)
    ch.observe(42)
    w = ch.grind(3, max_iter=200)
    ch2 = DuplexChallenger(hasher, rate=4)
    ch2.observe(42)
    assert ch2.check_witness(3, w)


def test_challenger_grind_matches_sequential(hasher):
    """Device-batched grind returns the FIRST valid witness — identical to
    the sequential host loop — including when inputs are pending (k > 0)
    and when the hit lands past the first device chunk."""
    for n_obs in (1, 2, 3):  # pending-input offsets inside the rate window
        ch = DuplexChallenger(hasher, rate=4)
        for i in range(n_obs):
            ch.observe(1000 + i)
        # oracle: sequential clone scan
        expected = None
        for w in range(4096):
            if ch.clone().check_witness(4, w):
                expected = w
                break
        got = ch.clone().grind(4, max_iter=4096, batch=64)
        assert got == expected
    # chunk-boundary: force a tiny batch so the hit is in a later chunk
    ch = DuplexChallenger(hasher, rate=4)
    ch.observe(7)
    seq = None
    for w in range(1 << 12):
        if ch.clone().check_witness(6, w):
            seq = w
            break
    assert seq is not None
    assert ch.clone().grind(6, max_iter=1 << 12, batch=16) == seq
