"""Python side of the C ABI: byte-level marshalling into the framework.

Called only from the embedded interpreter inside libtachyon_tpu_c
(tachyon_tpu/c/c_api.cc).  Mirrors the conversion role of the reference's
c API shims (reference: tachyon/c/math/elliptic_curves/msm/
msm_input_provider.h, c/zk/plonk/halo2/bn254_prover.cc) — normalize the
caller's flat byte layout into device arrays, run, convert back.

Conventions (see api.h): field elements are 32-byte little-endian standard
form; affine points are x||y with x=y=0 for infinity.
"""
from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp


def _bytes_to_ints(data: bytes, n: int, width: int = 32) -> list[int]:
    return [
        int.from_bytes(data[i * width : (i + 1) * width], "little")
        for i in range(n)
    ]


def _int_limbs(x: int, L: int) -> list[int]:
    return [(x >> (16 * i)) & 0xFFFF for i in range(L)]


def msm_g1(bases: bytes, scalars: bytes, n: int) -> bytes:
    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ec import AffinePoint
    from tachyon_tpu.math.msm import msm

    g1 = curves.bn254_g1()
    Fq, Fr = g1.F, g1.SF
    xs, ys, infs = [], [], []
    for i in range(n):
        x = int.from_bytes(bases[i * 64 : i * 64 + 32], "little")
        y = int.from_bytes(bases[i * 64 + 32 : i * 64 + 64], "little")
        xs.append(x)
        ys.append(y)
        infs.append(x == 0 and y == 0)
    pts = AffinePoint(
        Fq.encode(np.array(xs, dtype=object)),
        Fq.encode(np.array(ys, dtype=object)),
        jnp.asarray(np.array(infs)),
    )
    sc = np.stack(
        [np.asarray(_int_limbs(v, Fr.spec.L), dtype=np.uint32)
         for v in _bytes_to_ints(scalars, n)],
        axis=1,
    )
    acc = g1.to_affine(msm(g1, pts, jnp.asarray(sc)))
    if bool(np.asarray(acc.inf)):
        return b"\x00" * 64
    x = int(Fq.decode(acc.x))
    y = int(Fq.decode(acc.y))
    return x.to_bytes(32, "little") + y.to_bytes(32, "little")


def fft(data: bytes, n: int, inverse: int) -> bytes:
    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ntt import Radix2Domain

    Fr = curves.bn254_fr()
    dom = Radix2Domain(Fr, n)
    vals = Fr.encode(np.array(_bytes_to_ints(data, n), dtype=object))
    out = dom.ifft(vals) if inverse else dom.fft(vals)
    ints = Fr.decode(out)
    return b"".join(int(v).to_bytes(32, "little") for v in ints)


def poseidon2_hash(inputs: bytes, n: int) -> bytes:
    from tachyon_tpu.crypto.poseidon2 import bn254_w3

    h = bn254_w3()
    p = h.F.p
    vals = _bytes_to_ints(inputs, n)
    # width-3 sponge, rate 2, capacity 1: absorb pairs additively then
    # squeeze state[1] (kroma/halo2-style duplex on the host-exact path)
    st = [0, 0, 0]
    for off in range(0, n, 2):
        chunk = vals[off : off + 2]
        for i, v in enumerate(chunk):
            st[i + 1] = (st[i + 1] + v) % p
        st = h.permute_host(st)
    return (st[1] % p).to_bytes(32, "little")


def groth16_prove(zkey_path: str, wtns_path: str, no_zk: int,
                  verify: int) -> tuple[str, str]:
    from tachyon_tpu.fields.spec import limbs_to_int
    from tachyon_tpu.io.zkey import parse_wtns, parse_zkey
    from tachyon_tpu.zk.groth16.prover import CircomGroth16Prover

    zkey = parse_zkey(zkey_path)
    _, wtns = parse_wtns(wtns_path)
    prover = CircomGroth16Prover(zkey)
    proof = prover.prove(wtns, deterministic=bool(no_zk))
    pub = [limbs_to_int(wtns[:, i + 1]) for i in range(zkey.num_public)]
    if verify and not prover.verify(proof, pub):
        raise RuntimeError("proof verification failed")

    def g1(pt):
        return (["0", "1", "0"] if pt is None
                else [str(pt[0]), str(pt[1]), "1"])

    def g2(pt):
        if pt is None:
            return [["0", "0"], ["1", "0"], ["0", "0"]]
        (x0, x1), (y0, y1) = pt
        return [[str(x0), str(x1)], [str(y0), str(y1)], ["1", "0"]]

    proof_json = json.dumps({
        "pi_a": g1(proof.a), "pi_b": g2(proof.b), "pi_c": g1(proof.c),
        "protocol": "groth16", "curve": "bn128",
    })
    public_json = json.dumps([str(v) for v in pub])
    return proof_json, public_json
