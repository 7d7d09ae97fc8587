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
import jax

# the embedded interpreter benefits from the persistent compile cache as
# much as the CLI does (XLA compiles are minutes-per-shape on small hosts)
from tachyon_tpu.base.cache import enable_persistent_cache

enable_persistent_cache(
    "cpu_bridge" if jax.config.jax_platforms == "cpu" else "tpu")
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
    from tachyon_tpu.io.replay import dump_msm

    dump_msm("bn254_g1", pts.x, pts.y, pts.inf, sc)
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


def halo2_prove(circuit_json: str) -> str:
    """JSON-described circuit -> halo2 bit-compatible proof (hex).

    Host-exact pipeline (tachyon_tpu/zk/plonk/halo2.py); proves then
    verifies before returning (reference: c/zk/plonk/halo2/bn254_prover.cc
    create-proof entry)."""
    import json as _json

    from tachyon_tpu.zk.plonk import expressions as ex
    from tachyon_tpu.zk.plonk import halo2
    from tachyon_tpu.zk.plonk.constraint_system import ColumnRef
    from tachyon_tpu.zk.plonk.layout import SimpleFloorPlanner

    from tachyon_tpu.io.replay import dump_halo2

    dump_halo2(circuit_json)
    spec = _json.loads(circuit_json)

    def build_expr(e, cols, sels):
        tag = e[0]
        if tag == "const":
            return ex.Constant(int(e[1]))
        if tag in ("fixed", "advice", "instance"):
            return {"fixed": ex.Fixed, "advice": ex.Advice,
                    "instance": ex.Instance}[tag](int(e[1]), int(e[2]))
        if tag == "challenge":
            return ex.Challenge(int(e[1]), int(e[2]))
        if tag == "selector":
            return sels[int(e[1])]
        if tag == "neg":
            return ex.Negated(build_expr(e[1], cols, sels))
        if tag == "sum":
            return ex.Sum(build_expr(e[1], cols, sels),
                          build_expr(e[2], cols, sels))
        if tag == "prod":
            return ex.Product(build_expr(e[1], cols, sels),
                              build_expr(e[2], cols, sels))
        if tag == "scaled":
            return ex.Scaled(build_expr(e[1], cols, sels), int(e[2]))
        raise ValueError(tag)

    class JsonCircuit:
        def floor_planner(self, cs, n):
            return SimpleFloorPlanner(cs, n)

        @staticmethod
        def configure(cs):
            cols = {
                "advice": [cs.advice_column() for _ in
                           range(spec.get("num_advice", 0))],
                "fixed": [cs.fixed_column() for _ in
                          range(spec.get("num_fixed", 0))],
                "instance": [cs.instance_column() for _ in
                             range(spec.get("num_instance", 0))],
            }
            sels = [
                cs.create_simple_selector() if kind == "simple"
                else cs.create_complex_selector()
                for kind in spec.get("selectors", [])
            ]
            for kind, idx in spec.get("equality", []):
                cs.enable_equality(ColumnRef(kind, idx))
            for kind, idx in spec.get("constants", []):
                cs.enable_constant(ColumnRef(kind, idx))
            for gi, polys in enumerate(spec.get("gates", [])):
                cs.create_gate(
                    f"gate{gi}", [build_expr(p, cols, sels) for p in polys])
            for lk in spec.get("lookups", []):
                pairs = [
                    (build_expr(i, cols, sels), build_expr(t, cols, sels))
                    for i, t in zip(lk["inputs"], lk["tables"])
                ]
                cs.lookup(lk.get("name", "lookup"), pairs)
            for sh in spec.get("shuffles", []):
                pairs = [
                    (build_expr(i, cols, sels), build_expr(t, cols, sels))
                    for i, t in zip(sh["inputs"], sh["shuffles"])
                ]
                cs.shuffle(sh.get("name", "shuffle"), pairs)
            cs.collect_queries()
            return {"cols": cols, "sels": sels}

        def synthesize(self, config, layouter):
            asg = spec.get("assignments", {})
            a = layouter.assignment
            for j, col in enumerate(asg.get("advice", [])):
                for r, v in enumerate(col):
                    a.advice[j][r] = int(v) % halo2.FR
            for j, col in enumerate(asg.get("fixed", [])):
                for r, v in enumerate(col):
                    a.fixed[j][r] = int(v) % halo2.FR
            for j, col in enumerate(asg.get("selectors", [])):
                for r, v in enumerate(col):
                    if v:
                        a.selectors[j][r] = True
            for (ka, ia, ra), (kb, ib, rb) in asg.get("copies", []):
                layouter.cs.copy((ColumnRef(ka, ia), ra),
                                 (ColumnRef(kb, ib), rb))

        def instance_columns(self):
            return spec.get("instances", [])

    circ = JsonCircuit()
    pk = halo2.keygen(circ, k=int(spec["k"]),
                      lookup_type=spec.get("lookup_type", "halo2"),
                      pcs=spec.get("pcs", "shplonk"))
    prover = halo2.Halo2Prover(pk, legacy_serialization=False)
    proof = prover.create_proof([circ], [circ.instance_columns()])
    ver = halo2.Halo2Verifier(pk, legacy_serialization=False)
    assert ver.verify(proof.proof, [circ.instance_columns()]), \
        "halo2 self-verification failed"
    return proof.proof.hex()


def _sp1_parse_and_commit(pcs, matrices_blob: bytes):
    """u32-LE matrix stream -> (matrices, committed ProverData)."""
    import numpy as np

    F = pcs.F
    vals = np.frombuffer(matrices_blob, dtype="<u4")
    off = 0
    num = int(vals[off]); off += 1
    mats = []
    for _ in range(num):
        rows, cols = int(vals[off]), int(vals[off + 1])
        off += 2
        m = vals[off:off + rows * cols].reshape(rows, cols)
        off += rows * cols
        mats.append(F.encode(np.array(m, dtype=object)))
    return mats, pcs.commit(mats)


def _sp1_pcs(log_blowup: int, num_queries: int, pow_bits: int):
    from tachyon_tpu.crypto import poseidon2
    from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
    from tachyon_tpu.fields import presets, extensions
    from tachyon_tpu.math.field import PrimeField

    F = PrimeField(presets.BABY_BEAR)
    return TwoAdicFRIPCS(
        F, extensions.baby_bear4(), poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=log_blowup, num_queries=num_queries,
                  proof_of_work_bits=pow_bits),
    )


def sp1_baby_bear_fri_commit(log_blowup: int, matrices_blob: bytes) -> bytes:
    """Commit-only entry for the SP1 PCS swap: coset-LDE batch + Poseidon2
    field-merkle-tree MMCS; returns the 8-u32-LE root (reference:
    c/zk/air/sp1/baby_bear_poseidon2_two_adic_fri.cc commit path, the call
    vendors/sp1/src/two_adic_fri_pcs.rs routes over FFI)."""
    import struct

    import numpy as np

    pcs = _sp1_pcs(log_blowup, 1, 0)  # queries/pow unused for commit
    _, data = _sp1_parse_and_commit(pcs, matrices_blob)
    F = pcs.F
    root = np.asarray(data.root())
    ints = [int(F.decode(root[:, i])) for i in range(root.shape[1])]
    return struct.pack("<8I", *ints)


def sp1_baby_bear_fri_prove_verify(
    log_blowup: int, num_queries: int, pow_bits: int, matrices_blob: bytes,
) -> bytes:
    """BabyBear Poseidon2 TwoAdicFRI commit -> open -> verify roundtrip
    (reference: c/zk/air/sp1/baby_bear_poseidon2_two_adic_fri.cc
    commit/open flow used by the SP1 vendor).

    matrices_blob: u32 LE stream: num_matrices, then per matrix
    (rows, cols, rows*cols row-major BabyBear values).
    Returns the 8-element Poseidon2 commitment of the tallest tree as
    32 bytes (u32 LE each); raises on verification failure.
    """
    import struct

    import numpy as np

    from tachyon_tpu.crypto import poseidon2
    from tachyon_tpu.crypto.challenger import DuplexChallenger

    pcs = _sp1_pcs(log_blowup, num_queries, pow_bits)
    F = pcs.F
    mats, data = _sp1_parse_and_commit(pcs, matrices_blob)

    def challenger():
        # SP1 convention: duplex rate 8 over the width-16 permutation
        # (reference: c/zk/air/sp1/baby_bear_poseidon2_constants.h).
        ch = DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=8)
        root = np.asarray(data.root())
        for i in range(root.shape[1]):
            ch.observe(int(F.decode(root[:, i])))
        return ch

    p_ch = challenger()
    zeta = p_ch.sample_ext(pcs.ext.D)
    points = [[[zeta]] * len(mats)]
    opened_values, proof = pcs.create_opening_proof([data], points, p_ch)
    v_ch = challenger()
    assert v_ch.sample_ext(pcs.ext.D) == zeta
    dims = [[(m.shape[1], m.shape[2]) for m in mats]]
    assert pcs.verify_opening_proof(
        [data.root()], dims, points, opened_values, proof, v_ch
    ), "FRI verification failed"
    root = np.asarray(data.root())
    ints = [int(F.decode(root[:, i])) for i in range(root.shape[1])]
    return struct.pack("<8I", *ints)
