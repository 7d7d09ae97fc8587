"""Binary Buffer/Copyable serialization (reference: base/buffer/buffer.h +
copyable.h — endian-aware write/read with per-type specializations).
Host-only: no device compiles."""
import pytest

from tachyon_tpu.base.buffer import (
    Buffer, ReadBuffer, serialize, deserialize,
    write_g1, read_g1, write_g2, read_g2,
    groth16_proof_to_bytes, groth16_proof_from_bytes,
)

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def test_primitive_roundtrip():
    buf = Buffer()
    buf.write_u8(7).write_u32(0xDEADBEEF).write_u64(1 << 63)
    buf.write_bytes(b"hello").write_field(P - 1, P)
    buf.write_vec([1, 2, 3], lambda b, v: b.write_u32(v))
    rd = ReadBuffer(buf.getvalue())
    assert rd.read_u8() == 7
    assert rd.read_u32() == 0xDEADBEEF
    assert rd.read_u64() == 1 << 63
    assert rd.read_bytes() == b"hello"
    assert rd.read_field(P) == P - 1
    assert rd.read_vec(lambda b: b.read_u32()) == [1, 2, 3]
    assert rd.done()


def test_truncation_and_canonicality():
    buf = Buffer().write_u64(42)
    data = buf.getvalue()[:-1]
    with pytest.raises(ValueError):
        ReadBuffer(data).read_u64()
    # non-canonical field element rejected on both sides
    with pytest.raises(ValueError):
        Buffer().write_field(P, P)
    raw = int(P).to_bytes((P.bit_length() + 7) // 8, "little")
    with pytest.raises(ValueError):
        ReadBuffer(raw).read_field(P)


def test_frame_checks():
    data = serialize("x.proof", lambda b: b.write_u32(5))
    rd = deserialize(data, "x.proof")
    assert rd.read_u32() == 5
    with pytest.raises(ValueError):
        deserialize(data, "y.proof")  # kind mismatch
    with pytest.raises(ValueError):
        deserialize(b"BAD!" + data[4:], "x.proof")  # magic


def test_point_roundtrip():
    buf = Buffer()
    write_g1(buf, (123, 456), P)
    write_g1(buf, None, P)
    write_g2(buf, ((1, 2), (3, 4)), P)
    write_g2(buf, None, P)
    rd = ReadBuffer(buf.getvalue())
    assert read_g1(rd, P) == (123, 456)
    assert read_g1(rd, P) is None
    assert read_g2(rd, P) == ((1, 2), (3, 4))
    assert read_g2(rd, P) is None
    assert rd.done()


def test_groth16_proof_roundtrip():
    from tachyon_tpu.zk.groth16.r1cs import Groth16Proof

    proof = Groth16Proof(
        a=(11, 22), b=((1, 2), (3, 4)), c=(33, 44))
    data = groth16_proof_to_bytes(proof, P)
    back = groth16_proof_from_bytes(data, P, Groth16Proof)
    assert back == proof
    with pytest.raises(ValueError):
        groth16_proof_from_bytes(data + b"\x00", P, Groth16Proof)


def test_log_helpers():
    """glog-analog VLOG/CHECK (reference: base/logging.h)."""
    from tachyon_tpu.base import log

    log.set_vlog_level(2)
    assert log.vlog_is_on(1) and log.vlog_is_on(2) and not log.vlog_is_on(3)
    log.vlog(1, "progress %d", 42)  # must not raise
    log.set_vlog_level(0)
    log.check(True)
    log.check_eq(3, 3)
    log.check_le(3, 3)
    for fn, args in [(log.check, (False,)), (log.check_eq, (1, 2)),
                     (log.check_ne, (1, 1)), (log.check_le, (2, 1)),
                     (log.check_lt, (1, 1))]:
        try:
            fn(*args)
            raise RuntimeError("should have raised")
        except log.CheckError:
            pass


def test_read_vec_hostile_count():
    """regression: count guard must bound by remaining bytes / min_size
    before any element reads happen."""
    import pytest
    from tachyon_tpu.base.buffer import Buffer, ReadBuffer

    buf = Buffer()
    buf.write_u64((1 << 60))  # absurd count, nearly empty payload
    buf.write_u32(7)
    rd = ReadBuffer(buf.getvalue())
    with pytest.raises(ValueError):
        rd.read_vec(lambda b: b.read_u32(), min_size=4)


def test_write_g1_g2_reject_non_canonical():
    """regression: serialization must raise on out-of-range coordinates
    instead of silently wrapping mod p (read side rejects them too)."""
    import pytest
    from tachyon_tpu.base.buffer import Buffer, write_g1, write_g2

    P = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
    with pytest.raises(ValueError):
        write_g1(Buffer(), (P + 1, 2), P)
    with pytest.raises(ValueError):
        write_g2(Buffer(), ((0, P), (1, 2)), P)
