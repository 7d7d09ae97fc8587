"""snarkjs .zkey / .wtns binary parsers (Groth16, BN254).

TPU-native analog of the reference's mmap parsers
(reference: vendors/circom/circomlib/zkey/zkey.{h,cc},
circomlib/wtns/wtns.h, circomlib/zkey/coefficient.h).  Field elements in the
zkey are little-endian *Montgomery* residues with R = 2^256 — identical to
this framework's internal Montgomery domain, so point coordinates are
repacked from bytes to 16-bit limbs with zero arithmetic.  Witness values
are standard form.

A C++ mmap fast-path lives in tachyon_tpu/io/native (same layout); this
module is the portable reference implementation.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

ZKEY_MAGIC = b"zkey"
WTNS_MAGIC = b"wtns"

# section ids (reference: zkey.h ZKeySectionType)
S_HEADER = 1
S_HEADER_GROTH = 2
S_IC = 3
S_COEFFS = 4
S_POINTS_A1 = 5
S_POINTS_B1 = 6
S_POINTS_B2 = 7
S_POINTS_C1 = 8
S_POINTS_H1 = 9


def _read_sections(data: bytes, magic: bytes):
    assert data[:4] == magic, f"bad magic {data[:4]!r}"
    version, num_sections = struct.unpack_from("<II", data, 4)
    sections = {}
    off = 12
    for _ in range(num_sections):
        typ, size = struct.unpack_from("<IQ", data, off)
        off += 12
        sections.setdefault(typ, []).append((off, size))
        off += size
    return version, sections


def bytes_to_limbs(buf: np.ndarray, n8: int) -> np.ndarray:
    """(n, n8) uint8 -> (n8//2, n) uint32 16-bit limbs (little-endian)."""
    n = buf.shape[0]
    u16 = buf.reshape(n, n8 // 2, 2).astype(np.uint32)
    limbs = u16[:, :, 0] | (u16[:, :, 1] << 8)
    return np.ascontiguousarray(limbs.T)  # (L, n)


@dataclass
class ZKeyData:
    n8q: int
    n8r: int
    q: int
    r: int
    num_vars: int
    num_public: int
    domain_size: int
    # verifying key points (Montgomery limb arrays)
    alpha_g1: np.ndarray  # (L, 2): x,y columns
    beta_g1: np.ndarray
    beta_g2: np.ndarray  # (L, 4): x0,x1,y0,y1
    gamma_g2: np.ndarray
    delta_g1: np.ndarray
    delta_g2: np.ndarray
    # query points: (L, n, 2) G1 / (L, n, 4) G2, Montgomery limbs
    ic: np.ndarray
    points_a1: np.ndarray
    points_b1: np.ndarray
    points_b2: np.ndarray
    points_c1: np.ndarray
    points_h1: np.ndarray
    # coefficients: (matrix, constraint, signal) int arrays + Montgomery values
    coeff_matrix: np.ndarray
    coeff_constraint: np.ndarray
    coeff_signal: np.ndarray
    coeff_values: np.ndarray  # (L, n) Montgomery limbs


def _parse_g1_array(data: bytes, off: int, count: int, n8: int) -> np.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8, count=count * 2 * n8, offset=off)
    coords = raw.reshape(count * 2, n8)
    limbs = bytes_to_limbs(coords, n8)  # (L, count*2)
    return limbs.reshape(limbs.shape[0], count, 2)


def _parse_g2_array(data: bytes, off: int, count: int, n8: int) -> np.ndarray:
    raw = np.frombuffer(data, dtype=np.uint8, count=count * 4 * n8, offset=off)
    coords = raw.reshape(count * 4, n8)
    limbs = bytes_to_limbs(coords, n8)
    return limbs.reshape(limbs.shape[0], count, 4)  # x0 x1 y0 y1


def parse_zkey(path: str) -> ZKeyData:
    with open(path, "rb") as f:
        data = f.read()
    version, sections = _read_sections(data, ZKEY_MAGIC)

    off, _ = sections[S_HEADER][0]
    (prover_type,) = struct.unpack_from("<I", data, off)
    assert prover_type == 1, "only Groth16 zkeys supported"

    off, _ = sections[S_HEADER_GROTH][0]
    (n8q,) = struct.unpack_from("<I", data, off)
    q = int.from_bytes(data[off + 4 : off + 4 + n8q], "little")
    off2 = off + 4 + n8q
    (n8r,) = struct.unpack_from("<I", data, off2)
    r = int.from_bytes(data[off2 + 4 : off2 + 4 + n8r], "little")
    off3 = off2 + 4 + n8r
    num_vars, num_public, domain_size = struct.unpack_from("<III", data, off3)
    off4 = off3 + 12
    # vk points: alpha1, beta1, beta2, gamma2, delta1, delta2
    alpha_g1 = _parse_g1_array(data, off4, 1, n8q)[:, 0]
    off4 += 2 * n8q
    beta_g1 = _parse_g1_array(data, off4, 1, n8q)[:, 0]
    off4 += 2 * n8q
    beta_g2 = _parse_g2_array(data, off4, 1, n8q)[:, 0]
    off4 += 4 * n8q
    gamma_g2 = _parse_g2_array(data, off4, 1, n8q)[:, 0]
    off4 += 4 * n8q
    delta_g1 = _parse_g1_array(data, off4, 1, n8q)[:, 0]
    off4 += 2 * n8q
    delta_g2 = _parse_g2_array(data, off4, 1, n8q)[:, 0]

    off, _ = sections[S_IC][0]
    ic = _parse_g1_array(data, off, num_public + 1, n8q)

    off, size = sections[S_COEFFS][0]
    (num_coeffs,) = struct.unpack_from("<I", data, off)
    entry = 12 + n8r
    raw = np.frombuffer(
        data, dtype=np.uint8, count=num_coeffs * entry, offset=off + 4
    ).reshape(num_coeffs, entry)
    coeff_matrix = raw[:, 0:4].copy().view("<u4").reshape(-1)
    coeff_constraint = raw[:, 4:8].copy().view("<u4").reshape(-1)
    coeff_signal = raw[:, 8:12].copy().view("<u4").reshape(-1)
    coeff_values = bytes_to_limbs(np.ascontiguousarray(raw[:, 12:]), n8r)
    # zkey coefficient values carry an extra Montgomery factor (the
    # reference demontgomerizes once more at parse: zkey.h CoefficientsSection
    # Read -> F::FromMontgomery).  Normalize to single-Montgomery form.
    from tachyon_tpu.fields.spec import int_to_limbs, limbs_to_int

    rinv = pow(1 << (8 * n8r), -1, r)
    for i in range(coeff_values.shape[1]):
        v = limbs_to_int(coeff_values[:, i]) * rinv % r
        coeff_values[:, i] = int_to_limbs(v, n8r // 2)

    off, _ = sections[S_POINTS_A1][0]
    points_a1 = _parse_g1_array(data, off, num_vars, n8q)
    off, _ = sections[S_POINTS_B1][0]
    points_b1 = _parse_g1_array(data, off, num_vars, n8q)
    off, _ = sections[S_POINTS_B2][0]
    points_b2 = _parse_g2_array(data, off, num_vars, n8q)
    off, _ = sections[S_POINTS_C1][0]
    points_c1 = _parse_g1_array(data, off, num_vars - num_public - 1, n8q)
    off, _ = sections[S_POINTS_H1][0]
    points_h1 = _parse_g1_array(data, off, domain_size, n8q)

    return ZKeyData(
        n8q=n8q, n8r=n8r, q=q, r=r,
        num_vars=num_vars, num_public=num_public, domain_size=domain_size,
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        gamma_g2=gamma_g2, delta_g1=delta_g1, delta_g2=delta_g2,
        ic=ic, points_a1=points_a1, points_b1=points_b1,
        points_b2=points_b2, points_c1=points_c1, points_h1=points_h1,
        coeff_matrix=coeff_matrix, coeff_constraint=coeff_constraint,
        coeff_signal=coeff_signal, coeff_values=coeff_values,
    )


def parse_wtns(path: str, native: bool | None = None) -> tuple[int, np.ndarray]:
    """returns (modulus, (L, n) standard-form limb array).

    Uses the native mmap parser (io/native) when available; the pure-python
    path is the fallback and oracle.
    """
    if native is not False:
        try:
            from tachyon_tpu.io.native import NativeFile, available

            if available():
                f = NativeFile(path)
                off, _ = f.find_section(1)
                n8 = struct.unpack("<I", f.read_bytes(off, 4))[0]
                modulus = int.from_bytes(f.read_bytes(off + 4, n8), "little")
                num = struct.unpack(
                    "<I", f.read_bytes(off + 4 + n8, 4)
                )[0]
                off2, _ = f.find_section(2)
                limbs = f.repack_limbs(off2, num, n8)
                f.close()
                return modulus, limbs
        except Exception:
            if native:
                raise
    with open(path, "rb") as f:
        data = f.read()
    version, sections = _read_sections(data, WTNS_MAGIC)
    off, _ = sections[1][0]
    (n8,) = struct.unpack_from("<I", data, off)
    modulus = int.from_bytes(data[off + 4 : off + 4 + n8], "little")
    (num,) = struct.unpack_from("<I", data, off + 4 + n8)
    off, _ = sections[2][0]
    raw = np.frombuffer(data, dtype=np.uint8, count=num * n8, offset=off)
    limbs = bytes_to_limbs(raw.reshape(num, n8), n8)
    return modulus, limbs
