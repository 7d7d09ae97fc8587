"""TwoAdicFRI PCS roundtrip tests (prove -> verify, tamper rejection)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import poseidon2
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
from tachyon_tpu.fields import presets, extensions
from tachyon_tpu.math.field import PrimeField


@pytest.fixture(scope="module")
def pcs():
    F = PrimeField(presets.BABY_BEAR)
    return TwoAdicFRIPCS(
        F,
        extensions.baby_bear4(),
        poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=1, num_queries=3, proof_of_work_bits=2),
    )


def _mats(F, rng, shapes):
    out = []
    for (n, c) in shapes:
        vals = np.array(
            [[rng.integers(0, F.p) for _ in range(c)] for _ in range(n)],
            dtype=object,
        )
        out.append(F.encode(vals))
    return out


def _challenger():
    return DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=4)


def test_fri_roundtrip_single(pcs, rng):
    F = pcs.F
    mats = _mats(F, rng, [(8, 2)])
    data = pcs.commit(mats)
    z = [5, 6, 7, 8]
    proof = pcs.open(data, z, _challenger())
    dims = [(lde.shape[1], lde.shape[2]) for lde in data.ldes]
    assert pcs.verify(data.roots(), dims, z, proof, _challenger())


def test_fri_roundtrip_mixed_heights(pcs, rng):
    F = pcs.F
    mats = _mats(F, rng, [(16, 3), (4, 2), (16, 1)])
    data = pcs.commit(mats)
    z = [11, 22, 33, 44]
    proof = pcs.open(data, z, _challenger())
    dims = [(lde.shape[1], lde.shape[2]) for lde in data.ldes]
    root = data.roots()
    assert pcs.verify(root, dims, z, proof, _challenger())
    # tamper: claimed opened value (round 0, matrix 0, point 0)
    ov = proof.opened_values[0][0][0]
    bad_ov = pcs.ext.add(ov, pcs.ext.ones(ov.shape[2:]))
    bad_r0 = list(proof.opened_values[0])
    bad_r0[0] = (bad_ov,)
    bad = proof._replace(opened_values=(tuple(bad_r0),))
    assert not pcs.verify(root, dims, z, bad, _challenger())
    # tamper: final poly
    bad = proof._replace(final_poly=pcs.ext.add(proof.final_poly, pcs.ext.ones(())))
    assert not pcs.verify(root, dims, z, bad, _challenger())


def test_fri_multi_round_multi_point(pcs, rng):
    """Plonky3-style rounds: two independent commits, trace opened at two
    points (zeta, zeta*g pattern of the uni-STARK) in one proof."""
    F = pcs.F
    d1 = pcs.commit(_mats(F, rng, [(16, 2)]))
    d2 = pcs.commit(_mats(F, rng, [(8, 1)]))
    z1, z2 = [3, 1, 4, 1], [2, 7, 1, 8]
    rounds = [(d1, [[z1, z2]]), (d2, [[z1]])]
    proof = pcs.open_rounds(rounds, _challenger())
    dims1 = [(l.shape[1], l.shape[2]) for l in d1.ldes]
    dims2 = [(l.shape[1], l.shape[2]) for l in d2.ldes]
    vr = [(d1.roots(), dims1, [[z1, z2]]), (d2.roots(), dims2, [[z1]])]
    assert pcs.verify_rounds(vr, proof, _challenger())
    # wrong point ordering must fail
    vr_bad = [(d1.roots(), dims1, [[z2, z1]]), (d2.roots(), dims2, [[z1]])]
    assert not pcs.verify_rounds(vr_bad, proof, _challenger())
