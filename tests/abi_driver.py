"""ctypes driver for the ABI conformance test (run as a subprocess: the
shared library embeds its own CPython+JAX runtime).

Declares every function with EXACTLY the byte layouts the Rust crate
(rs/src/lib.rs) and Node addon (node/src/addon.c) assume, then drives the
data-path entries and self-checks the algebra.  Usage:
    python abi_driver.py <libpath> <symbol> <symbol> ...
Prints ABI_OK on success; any mismatch exits non-zero.
"""
import ctypes
import sys

lib_path = sys.argv[1]
symbols = sys.argv[2:]
lib = ctypes.CDLL(lib_path)

# 1. every symbol the rs/node bindings import must exist
for s in symbols:
    assert hasattr(lib, s), f"missing symbol: {s}"

c_char_p = ctypes.c_char_p
c_int = ctypes.c_int
c_u8p = ctypes.POINTER(ctypes.c_uint8)
c_size = ctypes.c_size_t

lib.tachyon_tpu_version.restype = ctypes.c_uint32
lib.tachyon_tpu_version_str.restype = c_char_p
lib.tachyon_tpu_init.argtypes = [c_char_p]
lib.tachyon_tpu_init.restype = c_int
lib.tachyon_tpu_last_error.restype = c_char_p
lib.tachyon_tpu_bn254_g1_msm.argtypes = [c_u8p, c_u8p, c_size, c_u8p]
lib.tachyon_tpu_bn254_g1_msm.restype = c_int
lib.tachyon_tpu_bn254_fft.argtypes = [c_u8p, c_size, c_int, c_u8p]
lib.tachyon_tpu_bn254_fft.restype = c_int
lib.tachyon_tpu_bn254_poseidon2_hash.argtypes = [c_u8p, c_size, c_u8p]
lib.tachyon_tpu_bn254_poseidon2_hash.restype = c_int

# 2. version sanity: int encodes major*10000 + minor*100 + patch and must
# match the dotted string (node addon surfaces both)
v = lib.tachyon_tpu_version()
vs = lib.tachyon_tpu_version_str().decode()
maj, mino, pat = (int(x) for x in vs.split("."))
assert v == maj * 10000 + mino * 100 + pat, (v, vs)

rc = lib.tachyon_tpu_init(b"cpu")
assert rc == 0, lib.tachyon_tpu_last_error().decode()


def buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


# 3. MSM through the rs layout: bases n x 64B (x||y LE), scalars n x 32B,
# result 64B affine.  msm([G,G,G],[1,2,3]) == msm([G],[6]).
G = (1).to_bytes(32, "little") + (2).to_bytes(32, "little")
out_a = (ctypes.c_uint8 * 64)()
out_b = (ctypes.c_uint8 * 64)()
scal3 = b"".join(int(k).to_bytes(32, "little") for k in (1, 2, 3))
rc = lib.tachyon_tpu_bn254_g1_msm(buf(G * 3), buf(scal3), 3, out_a)
assert rc == 0, lib.tachyon_tpu_last_error().decode()
rc = lib.tachyon_tpu_bn254_g1_msm(buf(G), buf((6).to_bytes(32, "little")), 1,
                                  out_b)
assert rc == 0, lib.tachyon_tpu_last_error().decode()
assert bytes(out_a) == bytes(out_b), "msm: G+2G+3G != 6G"

# 4. FFT roundtrip through the rs layout: n x 32B LE scalars
n = 8
data = b"".join(int(3 * i + 1).to_bytes(32, "little") for i in range(n))
freq = (ctypes.c_uint8 * (32 * n))()
back = (ctypes.c_uint8 * (32 * n))()
assert lib.tachyon_tpu_bn254_fft(buf(data), n, 0, freq) == 0
assert lib.tachyon_tpu_bn254_fft(
    (ctypes.c_uint8 * (32 * n)).from_buffer_copy(bytes(freq)), n, 1, back
) == 0
assert bytes(back) == data, "fft roundtrip mismatch"

# 5. Poseidon2: deterministic 32B digest
inp = b"".join(int(i + 1).to_bytes(32, "little") for i in range(4))
h1 = (ctypes.c_uint8 * 32)()
h2 = (ctypes.c_uint8 * 32)()
assert lib.tachyon_tpu_bn254_poseidon2_hash(buf(inp), 4, h1) == 0
assert lib.tachyon_tpu_bn254_poseidon2_hash(buf(inp), 4, h2) == 0
assert bytes(h1) == bytes(h2) and any(bytes(h1)), "poseidon2 not deterministic"

lib.tachyon_tpu_shutdown()
print("ABI_OK")
