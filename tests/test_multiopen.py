"""SHPlonk / GWC multi-open roundtrips (reference: shplonk_unittest /
gwc_unittest pattern: prove with transcript writer, verify with reader)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg
from tachyon_tpu.crypto.multiopen import (
    GWC,
    SHPlonk,
    ProverOpening,
    VerifierOpening,
)
from tachyon_tpu.crypto.transcript import TranscriptReader, TranscriptWriter
from tachyon_tpu.fields import presets
from tachyon_tpu.math import curves, poly as poly_mod
from tachyon_tpu.ops import mont


@pytest.fixture(scope="module")
def params():
    return kzg.unsafe_setup(8, tau=0x5EED)


def _mk_openings(params, rng, point_sets):
    Fr = curves.bn254_fr()
    pro, ver = [], []
    for points in point_sets:
        coeffs_int = [int(rng.integers(1, 1 << 30)) for _ in range(8)]
        cm = Fr.encode(np.array(coeffs_int, dtype=object))
        commitment = kzg.to_int_point(
            kzg.commit(params, mont.mont_reduce(Fr.spec, cm))
        )
        values = [
            sum(c * pow(pt, i, Fr.p) for i, c in enumerate(coeffs_int)) % Fr.p
            for pt in points
        ]
        pro.append(ProverOpening(cm, tuple(points)))
        ver.append(VerifierOpening(commitment, tuple(points), tuple(values)))
    return pro, ver


def _writer():
    return TranscriptWriter(presets.BN254_FR, presets.BN254_FQ)


def _reader(proof):
    return TranscriptReader(proof, presets.BN254_FR, presets.BN254_FQ)


@pytest.mark.parametrize("scheme_cls", [SHPlonk, GWC])
def test_multiopen_roundtrip(scheme_cls, params, rng):
    scheme = scheme_cls(params)
    point_sets = [(3, 5), (3, 5), (7,)]
    pro, ver = _mk_openings(params, rng, point_sets)
    w = _writer()
    scheme.create_opening_proof(pro, w)
    assert scheme.verify_opening_proof(ver, _reader(bytes(w.proof)))
    # wrong value fails
    bad = list(ver)
    v0 = list(bad[0].values)
    v0[0] = (v0[0] + 1) % curves.bn254_fr().p
    bad[0] = VerifierOpening(bad[0].commitment, bad[0].points, tuple(v0))
    assert not scheme.verify_opening_proof(bad, _reader(bytes(w.proof)))


def test_transcript_challenge_stability():
    """same absorb sequence -> same challenge (and a known regression pin)."""
    w1, w2 = _writer(), _writer()
    for w in (w1, w2):
        w.common_scalar(42)
        w.common_point((1, 2))
    c1, c2 = w1.squeeze_challenge(), w2.squeeze_challenge()
    assert c1 == c2 != 0
