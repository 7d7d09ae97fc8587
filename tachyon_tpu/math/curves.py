"""Concrete curve instances (parameters mirror the reference's curve configs).

Reference parameter sources (values only):
  * BN254 G1/G2: tachyon/math/elliptic_curves/bn/bn254/BUILD.bazel
  * BLS12-381:   tachyon/math/elliptic_curves/bls12/bls12_381/
  * secp256k1:   tachyon/math/elliptic_curves/secp/secp256k1/
  * Pasta:       tachyon/math/elliptic_curves/pasta/
"""
import functools

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.extfield import ExtField
from tachyon_tpu.math.ec import SWCurve


@functools.lru_cache(maxsize=None)
def bn254_fq() -> PrimeField:
    return PrimeField(presets.BN254_FQ)


@functools.lru_cache(maxsize=None)
def bn254_fr() -> PrimeField:
    return PrimeField(presets.BN254_FR)


@functools.lru_cache(maxsize=None)
def bn254_fq2() -> ExtField:
    # Fq2 = Fq[u]/(u^2 + 1)
    return ExtField(bn254_fq(), 2, -1, name="bn254_fq2")


@functools.lru_cache(maxsize=None)
def bn254_fq6() -> ExtField:
    # Fq6 = Fq2[v]/(v^3 - (9 + u))
    return ExtField(bn254_fq2(), 3, [9, 1], name="bn254_fq6")


@functools.lru_cache(maxsize=None)
def bn254_fq12() -> ExtField:
    # Fq12 = Fq6[w]/(w^2 - v): non-residue = v = (0, 1, 0) over Fq2 coeffs
    return ExtField(bn254_fq6(), 2, [[0, 0], [1, 0], [0, 0]], name="bn254_fq12")


@functools.lru_cache(maxsize=None)
def bn254_g1() -> SWCurve:
    return SWCurve(
        name="bn254_g1",
        field=bn254_fq(),
        a=0,
        b=3,
        gen_x=1,
        gen_y=2,
        scalar_field=bn254_fr(),
    )


def _bn254_g2_params():
    """b2 = 3/(9+u), generator from the standard bn254 G2 spec."""
    p = presets.BN254_FQ.p
    # (9+u)^-1 = (9-u)/82
    inv82 = pow(82, -1, p)
    b0 = (27 * inv82) % p
    b1 = (-3 * inv82) % p
    gx = [
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ]
    gy = [
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ]
    return [b0, b1], gx, gy


@functools.lru_cache(maxsize=None)
def bn254_g2() -> SWCurve:
    b, gx, gy = _bn254_g2_params()
    return SWCurve(
        name="bn254_g2",
        field=bn254_fq2(),
        a=[0, 0],
        b=b,
        gen_x=gx,
        gen_y=gy,
        scalar_field=bn254_fr(),
    )


@functools.lru_cache(maxsize=None)
def bls12_381_fq2() -> ExtField:
    # Fq2 = Fq[u]/(u^2 + 1)
    return ExtField(
        PrimeField(presets.BLS12_381_FQ), 2, -1, name="bls12_381_fq2"
    )


@functools.lru_cache(maxsize=None)
def bls12_381_g2() -> SWCurve:
    """BLS12-381 G2 on the M-twist y^2 = x^3 + 4(u+1)
    (reference: elliptic_curves/bls12/bls12_381/g2.h generated params)."""
    from tachyon_tpu.math import pairing_bls12_381 as bls

    return SWCurve(
        name="bls12_381_g2",
        field=bls12_381_fq2(),
        a=[0, 0],
        b=[4, 4],
        gen_x=list(bls.G2_GEN[0]),
        gen_y=list(bls.G2_GEN[1]),
        scalar_field=PrimeField(presets.BLS12_381_FR),
    )


@functools.lru_cache(maxsize=None)
def bls12_381_g1() -> SWCurve:
    return SWCurve(
        name="bls12_381_g1",
        field=PrimeField(presets.BLS12_381_FQ),
        a=0,
        b=4,
        gen_x=3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
        gen_y=1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
        scalar_field=PrimeField(presets.BLS12_381_FR),
    )


@functools.lru_cache(maxsize=None)
def secp256k1() -> SWCurve:
    return SWCurve(
        name="secp256k1",
        field=PrimeField(presets.SECP256K1_FQ),
        a=0,
        b=7,
        gen_x=55066263022277343669578718895168534326250603453777594175500187360389116729240,
        gen_y=32670510020758816978083085130507043184471273380659243275938904335757337482424,
        scalar_field=PrimeField(presets.SECP256K1_FR),
    )


@functools.lru_cache(maxsize=None)
def pallas() -> SWCurve:
    # gen = (-1, 2): (-1)^3 + 5 = 4 = 2^2
    fp = PrimeField(presets.PALLAS_FP)
    return SWCurve(
        name="pallas",
        field=fp,
        a=0,
        b=5,
        gen_x=presets.PALLAS_FP.p - 1,
        gen_y=2,
        scalar_field=PrimeField(presets.VESTA_FP),
    )


@functools.lru_cache(maxsize=None)
def vesta() -> SWCurve:
    return SWCurve(
        name="vesta",
        field=PrimeField(presets.VESTA_FP),
        a=0,
        b=5,
        gen_x=presets.VESTA_FP.p - 1,
        gen_y=2,
        scalar_field=PrimeField(presets.PALLAS_FP),
    )
