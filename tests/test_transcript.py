"""Halo2 transcript flavors: golden challenge vectors from the reference
unittests + writer/reader roundtrips.

Golden sources (absorb BN254 G1 generator (1,2), squeeze):
  * blake2b:  zk/plonk/halo2/blake2b_transcript_unittest.cc:57-70
  * sha256:   zk/plonk/halo2/sha256_transcript_unittest.cc:57-70
  * poseidon: zk/plonk/halo2/poseidon_transcript_unittest.cc:57-71
"""
import pytest

from tachyon_tpu.crypto.transcript import make_reader, make_writer
from tachyon_tpu.fields import presets

GEN = (1, 2)  # bn254 G1 generator

GOLDEN = {
    "blake2b": bytes([
        57, 2, 118, 182, 16, 184, 59, 179, 70, 176, 223, 71, 62, 168, 222,
        171, 85, 224, 83, 43, 148, 194, 132, 184, 65, 25, 1, 208, 123, 166,
        11, 12,
    ]),
    "sha256": bytes([
        144, 70, 170, 43, 125, 191, 116, 100, 115, 242, 37, 247, 43, 227,
        23, 192, 153, 176, 105, 131, 142, 165, 91, 3, 218, 85, 31, 89, 176,
        94, 171, 5,
    ]),
    "poseidon": bytes([
        25, 86, 205, 219, 59, 135, 187, 231, 192, 54, 23, 138, 114, 176, 9,
        157, 1, 97, 110, 174, 67, 9, 89, 85, 126, 129, 216, 121, 53, 99,
        227, 26,
    ]),
}


@pytest.mark.parametrize("kind", ["blake2b", "sha256", "poseidon"])
def test_squeeze_challenge_golden(kind):
    w = make_writer(kind, presets.BN254_FR, presets.BN254_FQ)
    w.write_point(GEN)
    expected = int.from_bytes(GOLDEN[kind], "little")
    assert w.squeeze_challenge() == expected


@pytest.mark.parametrize("kind", ["blake2b", "sha256", "poseidon"])
def test_writer_reader_roundtrip(kind):
    w = make_writer(kind, presets.BN254_FR, presets.BN254_FQ)
    w.write_point(GEN)
    w.write_scalar(123456789)
    c1 = w.squeeze_challenge()
    w.write_scalar(c1)
    c2 = w.squeeze_challenge()

    r = make_reader(kind, bytes(w.proof), presets.BN254_FR, presets.BN254_FQ)
    assert r.read_point() == GEN
    assert r.read_scalar() == 123456789
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == c1
    assert r.squeeze_challenge() == c2


def test_snark_verifier_poseidon_golden():
    """reference: snark_verifier_poseidon_transcript_unittest.cc
    SqueezeChallenge — absorb the generator TWICE, squeeze."""
    w = make_writer("snark_verifier", presets.BN254_FR, presets.BN254_FQ)
    w.write_point(GEN)
    w.write_point(GEN)
    expected = int.from_bytes(bytes([
        78, 246, 205, 146, 54, 16, 105, 106, 240, 24, 115, 146, 126, 203,
        44, 166, 34, 117, 244, 97, 33, 69, 158, 167, 254, 239, 174, 66,
        133, 142, 174, 27,
    ]), "little")
    assert w.squeeze_challenge() == expected


def test_snark_verifier_poseidon_roundtrip():
    w = make_writer("snark_verifier", presets.BN254_FR, presets.BN254_FQ)
    w.write_point(GEN)
    w.write_scalar(987654321)
    c1 = w.squeeze_challenge()
    c2 = w.squeeze_challenge()  # empty-buffer squeeze path

    r = make_reader("snark_verifier", bytes(w.proof),
                    presets.BN254_FR, presets.BN254_FQ)
    assert r.read_point() == GEN
    assert r.read_scalar() == 987654321
    assert r.squeeze_challenge() == c1
    assert r.squeeze_challenge() == c2
