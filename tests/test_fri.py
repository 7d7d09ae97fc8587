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
    assert pcs.verify(data.tree.root(), dims, z, proof, _challenger())


def test_fri_roundtrip_mixed_heights(pcs, rng):
    F = pcs.F
    mats = _mats(F, rng, [(16, 3), (4, 2), (16, 1)])
    data = pcs.commit(mats)
    z = [11, 22, 33, 44]
    proof = pcs.open(data, z, _challenger())
    dims = [(lde.shape[1], lde.shape[2]) for lde in data.ldes]
    root = data.tree.root()
    assert pcs.verify(root, dims, z, proof, _challenger())
    # tamper: claimed opened value
    bad_vals = list(proof.opened_values)
    bad_vals[0] = pcs.ext.add(bad_vals[0], pcs.ext.ones(bad_vals[0].shape[2:]))
    bad = proof._replace(opened_values=tuple(bad_vals))
    assert not pcs.verify(root, dims, z, bad, _challenger())
    # tamper: final poly
    bad = proof._replace(final_poly=pcs.ext.add(proof.final_poly, pcs.ext.ones(())))
    assert not pcs.verify(root, dims, z, bad, _challenger())
