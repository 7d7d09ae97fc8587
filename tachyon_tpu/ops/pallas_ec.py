"""Pallas TPU kernels for whole elliptic-curve point operations (a = 0).

One XYZZ point add/double/mixed-add = ONE custom call: the complete limb
program (Montgomery muls + carry chains + case selects) runs inside a single
Mosaic kernel over a lane-blocked batch of points.  This is the TPU
equivalent of the reference's fused CUDA point kernels
(reference: tachyon/math/elliptic_curves/short_weierstrass/kernels/
elliptic_curve_ops.cu.h) and is what the MSM scan trees are built from.

Only short-Weierstrass curves with a == 0 over a PrimeField use these;
extension-field curves (G2) fall back to the jnp path in math/ec.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tachyon_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FieldSpec
from tachyon_tpu.ops.pallas_mont import _mul_body

MASK = np.uint32(LIMB_MASK)
BLOCK = 512


# ---- limb-row field helpers (lists of (1, B) uint32 rows) ---------------------
def _fadd(f: FieldSpec, a, b):
    L = f.L
    nl = [np.uint32(int(v)) for v in f.p_limbs]
    out, c = [], None
    for i in range(L):
        t = a[i] + b[i] + (c if c is not None else 0)
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return _csub(f, out, c)


def _csub(f: FieldSpec, a, extra):
    """conditional subtract p given L limbs + extra carry row."""
    L = f.L
    nl = [np.uint32(int(v)) for v in f.p_limbs]
    diff, borrow = [], None
    for i in range(L):
        t = a[i] - nl[i] - (borrow if borrow is not None else 0)
        diff.append(t & MASK)
        borrow = t >> 31
    t = extra - borrow
    borrow = t >> 31
    keep = borrow.astype(jnp.bool_)  # borrow -> value < p -> keep a
    return [jnp.where(keep, a[i], diff[i]) for i in range(L)]


def _fsub(f: FieldSpec, a, b):
    L = f.L
    nl = [np.uint32(int(v)) for v in f.p_limbs]
    out, borrow = [], None
    for i in range(L):
        t = a[i] - b[i] - (borrow if borrow is not None else 0)
        out.append(t & MASK)
        borrow = t >> 31
    # if borrow: add p
    res, c = [], None
    for i in range(L):
        t = out[i] + borrow * nl[i] + (c if c is not None else 0)
        res.append(t & MASK)
        c = t >> LIMB_BITS
    return res


def _fdbl(f: FieldSpec, a):
    return _fadd(f, a, a)


def _fmul(f: FieldSpec, a, b):
    return _mul_body(f, a, b)


def _fsq(f: FieldSpec, a):
    return _mul_body(f, a, a)


def _fzero_mask(f: FieldSpec, a):
    acc = a[0]
    for i in range(1, f.L):
        acc = acc | a[i]
    return acc == 0  # bool row


def _fsel(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _zeros_like(a):
    return [jnp.zeros_like(x) for x in a]


# ---- point op bodies (mirror math/ec.py, a = 0) --------------------------------
def _dbl_body(f, px, py, pzz, pzzz):
    u = _fdbl(f, py)
    v = _fsq(f, u)
    w = _fmul(f, u, v)
    s = _fmul(f, px, v)
    x2 = _fsq(f, px)
    m = _fadd(f, _fdbl(f, x2), x2)  # 3x^2 (a = 0)
    x3 = _fsub(f, _fsq(f, m), _fdbl(f, s))
    y3 = _fsub(f, _fmul(f, m, _fsub(f, s, x3)), _fmul(f, w, py))
    zz3 = _fmul(f, v, pzz)
    zzz3 = _fmul(f, w, pzzz)
    return x3, y3, zz3, zzz3


def _add_body(f, p, q):
    px, py, pzz, pzzz = p
    qx, qy, qzz, qzzz = q
    u1 = _fmul(f, px, qzz)
    u2 = _fmul(f, qx, pzz)
    s1 = _fmul(f, py, qzzz)
    s2 = _fmul(f, qy, pzzz)
    pp = _fsub(f, u2, u1)
    r = _fsub(f, s2, s1)
    same_x = _fzero_mask(f, pp)
    same_y = _fzero_mask(f, r)
    pp2 = _fsq(f, pp)
    ppp = _fmul(f, pp, pp2)
    qq = _fmul(f, u1, pp2)
    x3 = _fsub(f, _fsub(f, _fsq(f, r), ppp), _fdbl(f, qq))
    y3 = _fsub(f, _fmul(f, r, _fsub(f, qq, x3)), _fmul(f, s1, ppp))
    zz3 = _fmul(f, _fmul(f, pzz, qzz), pp2)
    zzz3 = _fmul(f, _fmul(f, pzzz, qzzz), ppp)

    dx, dy, dzz, dzzz = _dbl_body(f, px, py, pzz, pzzz)
    p_inf = _fzero_mask(f, pzz)
    q_inf = _fzero_mask(f, qzz)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    is_inf = same_x & ~same_y & ~p_inf & ~q_inf
    out = (x3, y3, zz3, zzz3)
    zero = _zeros_like(x3)
    out = tuple(_fsel(is_inf, zero, o) for o in out)
    out = tuple(_fsel(is_dbl, d, o) for d, o in zip((dx, dy, dzz, dzzz), out))
    out = tuple(_fsel(q_inf, pc, o) for pc, o in zip(p, out))
    out = tuple(_fsel(p_inf, qc, o) for qc, o in zip(q, out))
    return out


def _madd_body(f, p, q_aff):
    px, py, pzz, pzzz = p
    qx, qy, q_inf = q_aff  # q_inf: bool row
    u2 = _fmul(f, qx, pzz)
    s2 = _fmul(f, qy, pzzz)
    pp = _fsub(f, u2, px)
    r = _fsub(f, s2, py)
    same_x = _fzero_mask(f, pp)
    same_y = _fzero_mask(f, r)
    pp2 = _fsq(f, pp)
    ppp = _fmul(f, pp, pp2)
    qq = _fmul(f, px, pp2)
    x3 = _fsub(f, _fsub(f, _fsq(f, r), ppp), _fdbl(f, qq))
    y3 = _fsub(f, _fmul(f, r, _fsub(f, qq, x3)), _fmul(f, py, ppp))
    zz3 = _fmul(f, pzz, pp2)
    zzz3 = _fmul(f, pzzz, ppp)

    dx, dy, dzz, dzzz = _dbl_body(f, px, py, pzz, pzzz)
    p_inf = _fzero_mask(f, pzz)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    is_inf = same_x & ~same_y & ~p_inf & ~q_inf
    out = (x3, y3, zz3, zzz3)
    zero = _zeros_like(x3)
    out = tuple(_fsel(is_inf, zero, o) for o in out)
    out = tuple(_fsel(is_dbl, d, o) for d, o in zip((dx, dy, dzz, dzzz), out))
    out = tuple(_fsel(q_inf, pc, o) for pc, o in zip(p, out))
    # p inf -> q as xyzz: zz = zzz = mont(1), coords zeroed when q inf
    one_m = [jnp.full_like(qx[0], np.uint32(int(v))) for v in f.r_limbs]
    q_zz = _fsel(q_inf, zero, one_m)
    q_x = _fsel(q_inf, zero, qx)
    q_y = _fsel(q_inf, zero, qy)
    qx4 = (q_x, q_y, q_zz, q_zz)
    out = tuple(_fsel(p_inf, qc, o) for qc, o in zip(qx4, out))
    return out


# ---- pallas_call wrappers -------------------------------------------------------
def _rows(ref, L):
    return [ref[i : i + 1, :] for i in range(L)]


def _store(ref, rows, L):
    for i in range(L):
        ref[i : i + 1, :] = rows[i]


@functools.lru_cache(maxsize=None)
def _add_call(f: FieldSpec, n_blocks: int):
    L = f.L

    def kernel(px, py, pzz, pzzz, qx, qy, qzz, qzzz, ox, oy, ozz, ozzz):
        p = tuple(_rows(r, L) for r in (px, py, pzz, pzzz))
        q = tuple(_rows(r, L) for r in (qx, qy, qzz, qzzz))
        out = _add_body(f, p, q)
        for ref, rows in zip((ox, oy, ozz, ozzz), out):
            _store(ref, rows, L)

    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n_blocks * BLOCK), jnp.uint32)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[spec] * 8,
            out_specs=(spec,) * 4,
            out_shape=(shape,) * 4,
        )
    )


@functools.lru_cache(maxsize=None)
def _dbl_call(f: FieldSpec, n_blocks: int):
    L = f.L

    def kernel(px, py, pzz, pzzz, ox, oy, ozz, ozzz):
        p = tuple(_rows(r, L) for r in (px, py, pzz, pzzz))
        out = _dbl_body(f, *p)
        for ref, rows in zip((ox, oy, ozz, ozzz), out):
            _store(ref, rows, L)

    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n_blocks * BLOCK), jnp.uint32)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[spec] * 4,
            out_specs=(spec,) * 4,
            out_shape=(shape,) * 4,
        )
    )


@functools.lru_cache(maxsize=None)
def _madd_call(f: FieldSpec, n_blocks: int):
    L = f.L

    def kernel(px, py, pzz, pzzz, qx, qy, qinf, ox, oy, ozz, ozzz):
        p = tuple(_rows(r, L) for r in (px, py, pzz, pzzz))
        q = (_rows(qx, L), _rows(qy, L), qinf[0:1, :].astype(jnp.bool_))
        out = _madd_body(f, p, q)
        for ref, rows in zip((ox, oy, ozz, ozzz), out):
            _store(ref, rows, L)

    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n_blocks * BLOCK), jnp.uint32)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[spec] * 6 + [ispec],
            out_specs=(spec,) * 4,
            out_shape=(shape,) * 4,
        )
    )


def _flatten(f: FieldSpec, arrs):
    """(L, *batch) arrays -> padded (L, nb*BLOCK); returns (list, batch, n, nb)."""
    batch = arrs[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    nb = max(1, -(-n // BLOCK))
    out = []
    for a in arrs:
        a2 = a.reshape(a.shape[0], n)
        if nb * BLOCK != n:
            a2 = jnp.pad(a2, ((0, 0), (0, nb * BLOCK - n)))
        out.append(a2)
    return out, batch, n, nb


def add_xyzz(f: FieldSpec, p, q):
    """p, q: tuples of 4 coord arrays (L, *batch) -> tuple of 4."""
    coords, batch, n, nb = _flatten(f, list(p) + list(q))
    outs = _add_call(f, nb)(*coords)
    return tuple(o[:, :n].reshape((f.L,) + batch) for o in outs)


def dbl_xyzz(f: FieldSpec, p):
    coords, batch, n, nb = _flatten(f, list(p))
    outs = _dbl_call(f, nb)(*coords)
    return tuple(o[:, :n].reshape((f.L,) + batch) for o in outs)


def madd_xyzz(f: FieldSpec, p, qx, qy, qinf):
    coords, batch, n, nb = _flatten(f, list(p) + [qx, qy])
    inf2 = qinf.astype(jnp.uint32).reshape(1, n)
    if nb * BLOCK != n:
        # pad with inf=1 so padding lanes are no-ops
        inf2 = jnp.pad(inf2, ((0, 0), (0, nb * BLOCK - n)), constant_values=1)
    outs = _madd_call(f, nb)(*coords, inf2)
    return tuple(o[:, :n].reshape((f.L,) + batch) for o in outs)
