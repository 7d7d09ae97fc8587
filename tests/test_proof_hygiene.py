"""Regression tests for proof hygiene (round-1 advisor findings):

* non-canonical scalar/point encodings are rejected (malleability);
* truncated proofs return False from verify, never raise;
* Groth16 r/s blinding defaults to fresh CSPRNG scalars;
* native zkey/wtns parser rejects truncated/malicious section tables.
"""
import os
import struct

import numpy as np
import pytest

from tachyon_tpu.crypto.transcript import (
    ProofDecodeError,
    TranscriptReader,
    TranscriptWriter,
    compress_g1,
)
from tachyon_tpu.fields import presets


FR = presets.BN254_FR
FQ = presets.BN254_FQ


def test_non_canonical_scalar_rejected():
    w = TranscriptWriter(FR, FQ)
    w.write_scalar(42)
    proof = bytearray(w.proof)
    # re-encode the same scalar as 42 + r (still fits in 32 bytes)
    proof[:32] = (42 + FR.p).to_bytes(32, "little")
    r = TranscriptReader(bytes(proof), FR, FQ)
    with pytest.raises(ProofDecodeError):
        r.read_scalar()


def test_canonical_scalar_roundtrip():
    w = TranscriptWriter(FR, FQ)
    w.write_scalar(FR.p - 1)
    r = TranscriptReader(bytes(w.proof), FR, FQ)
    assert r.read_scalar() == FR.p - 1


def test_non_canonical_x_rejected():
    # x = q is on-curve as x=0 mod q but must be rejected as non-canonical
    bad_x = FQ.p  # even top bit layout: q < 2^254 so flag bits are clear
    data = bad_x.to_bytes(32, "little")
    r = TranscriptReader(data, FR, FQ)
    with pytest.raises(ProofDecodeError):
        r.read_point()


def test_off_curve_x_rejected():
    # find an x whose x^3+3 is a QNR -> not on curve
    q = FQ.p
    for x in range(2, 50):
        rhs = (x * x * x + 3) % q
        if pow(rhs, (q - 1) // 2, q) != 1:
            data = x.to_bytes(32, "little")
            r = TranscriptReader(data, FR, FQ)
            with pytest.raises(ProofDecodeError):
                r.read_point()
            return
    pytest.fail("no QNR found in range")


def test_truncated_proof_rejected():
    r = TranscriptReader(b"\x01\x02", FR, FQ)
    with pytest.raises(ProofDecodeError):
        r.read_scalar()


def test_plonk_verify_returns_false_on_garbage():
    """end-to-end: a garbage/truncated proof must yield False, not raise."""
    from tachyon_tpu.crypto import kzg
    from tachyon_tpu.zk.plonk import expressions as ex
    from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
    from tachyon_tpu.zk.plonk.prover import (
        PlonkProver, PlonkVerifier, keygen,
    )

    n = 8
    params = kzg.unsafe_setup(n, tau=0xABCDE)
    cs = ConstraintSystem()
    qm = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    cs.create_gate("mul", [
        ex.Product(
            ex.Fixed(qm.index),
            ex.Sum(
                ex.Product(ex.Advice(a.index), ex.Advice(b.index)),
                ex.Negated(ex.Advice(c.index)),
            ),
        )
    ])
    qm_vals = np.array([1] * 4 + [0] * 4, dtype=object)
    pk = keygen(params, cs, n, [qm_vals])
    av = [2, 6, 4, 5, 0, 0, 0, 0]
    bv = [3, 5, 7, 8, 0, 0, 0, 0]
    cv = [x * y for x, y in zip(av, bv)]
    advice = [np.array(v, dtype=object) for v in (av, bv, cv)]
    prover = PlonkProver(params, pk)
    proof = prover.prove(advice, [])
    verifier = PlonkVerifier(params, pk)
    assert verifier.verify(proof, [])
    # truncation and bit flips: must return False, never raise
    assert verifier.verify(proof[: len(proof) // 2], []) is False
    bad = bytearray(proof)
    bad[5] ^= 0xFF
    assert verifier.verify(bytes(bad), []) is False


ZKEY = "/root/reference/vendors/circom/examples/multiplier_3.zkey"


@pytest.mark.skipif(not os.path.exists(ZKEY), reason="fixture unavailable")
def test_native_parser_rejects_truncated(tmp_path):
    from tachyon_tpu.io.native import NativeFile

    raw = open(ZKEY, "rb").read()
    # truncate mid-way: sections whose payload runs past EOF must vanish
    trunc = tmp_path / "trunc.zkey"
    trunc.write_bytes(raw[: len(raw) // 4])
    f = NativeFile(str(trunc))
    # probing all section types must never crash; repack beyond EOF raises
    for typ in range(1, 12):
        off, size = f.find_section(typ)
        if off is not None:
            assert off + size <= len(raw) // 4
    with pytest.raises(ValueError):
        f.repack_limbs(len(raw) // 4 - 8, 4, 32)
    with pytest.raises(ValueError):
        f.read_bytes(len(raw), 16)
    f.close()


@pytest.mark.skipif(not os.path.exists(ZKEY), reason="fixture unavailable")
def test_native_parser_rejects_lying_header(tmp_path):
    """a section declaring a huge size must be treated as absent."""
    from tachyon_tpu.io.native import NativeFile

    raw = bytearray(open(ZKEY, "rb").read())
    # first section header at offset 12: type u32, size u64
    typ = struct.unpack_from("<I", raw, 12)[0]
    struct.pack_into("<Q", raw, 16, 1 << 60)  # declared size: absurd
    lying = tmp_path / "lying.zkey"
    lying.write_bytes(bytes(raw))
    f = NativeFile(str(lying))
    off, _ = f.find_section(typ)
    assert off is None
    f.close()


def test_groth16_blinding_defaults_nonzero(monkeypatch):
    """prove() without explicit r/s must sample CSPRNG scalars (we can't
    observe r/s directly without running a proof, so assert on the sampling
    call)."""
    import secrets as _secrets

    from tachyon_tpu.zk.groth16 import prover as g16

    calls = []
    real = _secrets.randbelow

    def spy(n):
        v = real(n)
        calls.append(v)
        return v

    monkeypatch.setattr(g16.secrets, "randbelow", spy)

    class _Stop(Exception):
        pass

    class _FakeF:
        p = presets.BN254_FR.p

    class _FakeSelf:
        zkey = None
        Fr = _FakeF()

        def witness_map(self, w):
            raise _Stop  # stop right after blinding sampling

    w = np.zeros((16, 4), dtype=np.uint32)
    try:
        g16.CircomGroth16Prover.prove(_FakeSelf(), w)
    except Exception:
        pass
    assert len(calls) == 2  # r and s both sampled
    try:
        g16.CircomGroth16Prover.prove(_FakeSelf(), w, deterministic=True)
    except Exception:
        pass
    assert len(calls) == 2  # deterministic mode: no sampling
