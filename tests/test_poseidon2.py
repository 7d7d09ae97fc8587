"""Poseidon2 permutation vs the reference's golden vectors
(reference: crypto/hashes/sponge/poseidon2/poseidon2_unittest.cc)."""
import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import poseidon2


def _perm(h, inputs):
    F = h.F
    st = F.encode(np.array(inputs, dtype=object))[:, :, None]  # batch of 1
    out = h.permute(st)
    return [int(v) for v in F.decode(out[:, :, 0])]


def test_goldilocks_w8_golden():
    h = poseidon2.goldilocks_w8()
    got = _perm(h, list(range(8)))
    assert got == [
        14266028122062624699,
        5353147180106052723,
        15203350112844181434,
        17630919042639565165,
        16601551015858213987,
        10184091939013874068,
        16774100645754596496,
        12047415603622314780,
    ]


def test_babybear_w16_horizen_ext_golden():
    h = poseidon2.baby_bear_w16_horizen_ext()
    got = _perm(h, list(range(16)))
    assert got == [
        1699737005, 296394369, 268410240, 828329642,
        1491697358, 1128780676, 287184043, 1806152977,
        1380147856, 345666717, 491196631, 1875224538,
        697740550, 1854502887, 1201727753, 1802410886,
    ]


def test_babybear_p3_batch_consistency(rng):
    """batched permute == per-element permute."""
    h = poseidon2.baby_bear_p3_w16()
    F = h.F
    batch = 5
    vals = np.array(
        [[rng.integers(0, F.p) for _ in range(batch)] for _ in range(16)],
        dtype=object,
    )
    st = F.encode(vals)  # (L, 16, batch)
    out = h.permute(st)
    for b in range(batch):
        single = h.permute(st[:, :, b : b + 1])
        assert bool(np.asarray(F.eq(single[:, :, 0], out[:, :, b])).all())


def test_compress_and_hash(rng):
    h = poseidon2.baby_bear_p3_w16()
    F = h.F
    l = F.encode(np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=object))[:, :, None]
    r = F.encode(np.array([9, 10, 11, 12, 13, 14, 15, 16], dtype=object))[:, :, None]
    d = h.compress(l, r)
    assert d.shape == (2, 8, 1)
    # must equal permute(concat)[first 8]
    st = jnp.concatenate([l, r], axis=1)
    want = h.permute(st)[:, :8]
    assert bool(np.asarray(F.eq(d, want)).all())
    # hash_no_pad shape
    inp = F.encode(np.array(list(range(20)), dtype=object))[:, :, None]
    out = h.hash_no_pad(inp, 8)
    assert out.shape == (2, 8, 1)
