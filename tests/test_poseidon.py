"""Original Poseidon vs the reference's golden vector
(reference: crypto/hashes/sponge/poseidon/poseidon_unittest.cc:
BLS12-381 Fr, rate 2, alpha 17, 8 full / 31 partial rounds)."""
from tachyon_tpu.crypto.poseidon import Poseidon, PoseidonSpongeState
from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField


def test_bls12_381_absorb_squeeze_golden():
    F = PrimeField(presets.BLS12_381_FR)
    perm = Poseidon(F, rate=2, alpha=17, full_rounds=8, partial_rounds=31)
    sponge = PoseidonSpongeState(perm)
    sponge.absorb([0, 1, 2])
    got = sponge.squeeze(3)
    assert got == [
        40442793463571304028337753002242186710310163897048962278675457993207843616876,
        2664374461699898000291153145224099287711224021716202960480903840045233645301,
        50191078828066923662070228256530692951801504043422844038937334196346054068797,
    ]
