"""Pallas TPU kernels for the Pippenger MSM bucket phase (suffix-sweep design).

TPU-native re-design of the reference's bucket accumulation
(reference: tachyon/math/elliptic_curves/msm/algorithms/pippenger/pippenger.h
AccumulateSingleWindowNAFSum, pippenger_base.h AccumulateBuckets).  A vector
machine has no EC scatter-add, so buckets are eliminated entirely:

For one window, with points sorted ascending by digit d_0 <= ... <= d_{n-1}:

    window_sum = sum_i d_i * P_i = sum_{b=1}^{B-1} T[pos_b]

where T[j] = sum_{i>=j} P_i (global suffix point sums) and
pos_b = searchsorted(d_sorted, b) (first index with digit >= b) -- the
classic Pippenger running-sum identity read off the sorted array, with empty
buckets handled automatically (pos_b = pos_{b+1}) and T[n] := infinity.

The suffix sums are produced by ONE Pallas kernel: the sorted array is laid
out column-major into C lanes x R rows, and a sequential grid sweep (bottom
row up) accumulates a per-lane running sum, emitting it every step.  Each
step is a *blinded* mixed add: the accumulators start at a secret random
curve point D (subtracted in the glue), so the accumulator is never at
infinity and never (except with cryptographically negligible probability)
equal to +/- the incoming point -- the doubling/infinity branches of the
complete formulas vanish, leaving the minimal 11-mul madd-2008-s body.
Column totals are stitched into global suffix sums in the caller (msm.py).

Everything here is fixed-shape: one Mosaic compile per (field, R, C) and
the whole MSM graph stays small -- this is what makes 2^22 compile in
seconds instead of the reference associative-scan formulation's hours.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tachyon_tpu.fields.spec import FieldSpec
from tachyon_tpu.ops.pallas_ec import (
    _fadd,
    _fdbl,
    _fmul,
    _fsq,
    _fsub,
    _fsel,
    _fzero_mask,
    _rows,
    _store,
)


def _madd_blinded(f: FieldSpec, acc, qx, qy, qinf):
    """madd-2008-s without doubling/infinity branches (acc is blinded).

    acc: 4 coord lists of (1, C) rows; qx/qy: coord lists; qinf: bool row.
    Returns the new acc coord lists; lanes with qinf keep the old acc.
    """
    x, y, zz, zzz = acc
    u2 = _fmul(f, qx, zz)
    s2 = _fmul(f, qy, zzz)
    pp = _fsub(f, u2, x)
    r = _fsub(f, s2, y)
    pp2 = _fsq(f, pp)
    ppp = _fmul(f, pp, pp2)
    qq = _fmul(f, x, pp2)
    x3 = _fsub(f, _fsub(f, _fsq(f, r), ppp), _fdbl(f, qq))
    y3 = _fsub(f, _fmul(f, r, _fsub(f, qq, x3)), _fmul(f, y, ppp))
    zz3 = _fmul(f, zz, pp2)
    zzz3 = _fmul(f, zzz, ppp)
    keep = qinf
    return (
        _fsel(keep, x, x3),
        _fsel(keep, y, y3),
        _fsel(keep, zz, zz3),
        _fsel(keep, zzz, zzz3),
    )


def _add_blinded(f: FieldSpec, acc, q):
    """add-2008-s with only the q-at-infinity branch (acc is blinded)."""
    px, py, pzz, pzzz = acc
    qx, qy, qzz, qzzz = q
    u1 = _fmul(f, px, qzz)
    u2 = _fmul(f, qx, pzz)
    s1 = _fmul(f, py, qzzz)
    s2 = _fmul(f, qy, pzzz)
    pp = _fsub(f, u2, u1)
    r = _fsub(f, s2, s1)
    pp2 = _fsq(f, pp)
    ppp = _fmul(f, pp, pp2)
    qq = _fmul(f, u1, pp2)
    x3 = _fsub(f, _fsub(f, _fsq(f, r), ppp), _fdbl(f, qq))
    y3 = _fsub(f, _fmul(f, r, _fsub(f, qq, x3)), _fmul(f, s1, ppp))
    zz3 = _fmul(f, _fmul(f, pzz, qzz), pp2)
    zzz3 = _fmul(f, _fmul(f, pzzz, qzzz), ppp)
    keep = _fzero_mask(f, qzz)
    return (
        _fsel(keep, px, x3),
        _fsel(keep, py, y3),
        _fsel(keep, pzz, zz3),
        _fsel(keep, pzzz, zzz3),
    )


@functools.lru_cache(maxsize=None)
def _suffix_sweep_call(f: FieldSpec, R: int, C: int):
    """Kernel: sorted affine points (R, L, C) -> per-lane suffix sums.

    Grid iterates rows bottom-up; acc lives in VMEM scratch, initialized
    from the blind point D; every step emits acc into the suffix output row.
    suffix[r, :, c] = D + sum_{r'>=r} P[r', c].
    """
    L = f.L

    def kernel(xr, yr, infr, dx, dy, dzz, dzzz, sx, sy, szz, szzz,
               ax, ay, azz, azzz):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            ax[:] = dx[:]
            ay[:] = dy[:]
            azz[:] = dzz[:]
            azzz[:] = dzzz[:]

        acc = tuple(_rows(rf, L) for rf in (ax, ay, azz, azzz))
        qx = [xr[0, i, :][None] for i in range(L)]
        qy = [yr[0, i, :][None] for i in range(L)]
        qinf = (infr[0, 0, :] != 0)[None]
        out = _madd_blinded(f, acc, qx, qy, qinf)
        for rf, rows in zip((ax, ay, azz, azzz), out):
            _store(rf, rows, L)
        for rf, rows in zip((sx, sy, szz, szzz), out):
            for i in range(L):
                rf[0, i, :] = rows[i][0]

    pt_spec = pl.BlockSpec((1, L, C), lambda t: (R - 1 - t, 0, 0),
                           memory_space=pltpu.VMEM)
    inf_spec = pl.BlockSpec((1, 1, C), lambda t: (R - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((L, C), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, L, C), jnp.uint32)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(R,),
            in_specs=[pt_spec, pt_spec, inf_spec] + [d_spec] * 4,
            out_specs=(pt_spec,) * 4,
            out_shape=(out_shape,) * 4,
            scratch_shapes=[pltpu.VMEM((L, C), jnp.uint32)] * 4,
        )
    )


def suffix_sweep(f: FieldSpec, x, y, inf, d):
    """x, y: (R, L, C) sorted affine coords; inf: (R, 1, C) uint32 flags;
    d: 4-tuple of (L, C) blind-point coords.  Returns 4 suffix arrays
    (R, L, C) with suffix[r, :, c] = D + sum_{r'>=r} P[r', c]."""
    R, L, C = x.shape
    return _suffix_sweep_call(f, R, C)(x, y, inf, *d)


@functools.lru_cache(maxsize=None)
def _reduce_sweep_call(f: FieldSpec, R: int, C: int):
    """Kernel: XYZZ points (R, L, C) -> blinded per-lane totals (L, C)."""
    L = f.L

    def kernel(xr, yr, zzr, zzzr, dx, dy, dzz, dzzz, ox, oy, ozz, ozzz,
               ax, ay, azz, azzz):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            ax[:] = dx[:]
            ay[:] = dy[:]
            azz[:] = dzz[:]
            azzz[:] = dzzz[:]

        acc = tuple(_rows(rf, L) for rf in (ax, ay, azz, azzz))
        q = tuple(
            [rf[0, i, :][None] for i in range(L)]
            for rf in (xr, yr, zzr, zzzr)
        )
        out = _add_blinded(f, acc, q)
        for rf, rows in zip((ax, ay, azz, azzz), out):
            _store(rf, rows, L)

        @pl.when(t == pl.num_programs(0) - 1)
        def _emit():
            for rf, af in zip((ox, oy, ozz, ozzz), (ax, ay, azz, azzz)):
                rf[:] = af[:]

    pt_spec = pl.BlockSpec((1, L, C), lambda t: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((L, C), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((L, C), jnp.uint32)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(R,),
            in_specs=[pt_spec] * 4 + [d_spec] * 4,
            out_specs=(d_spec,) * 4,
            out_shape=(out_shape,) * 4,
            scratch_shapes=[pltpu.VMEM((L, C), jnp.uint32)] * 4,
        )
    )


def reduce_sweep(f: FieldSpec, xyzz, d):
    """xyzz: 4-tuple of (R, L, C) arrays; d: 4-tuple of (L, C) blind coords.
    Returns 4 arrays (L, C): D + column sums (complete w.r.t. infinity
    entries in the input; equal/opposite collisions are blinded away)."""
    R, L, C = xyzz[0].shape
    return _reduce_sweep_call(f, R, C)(*xyzz, *d)


# --------------------------------------------------------------------------
# jnp fallbacks (CPU mesh shards, non-TPU platforms): same semantics via
# lax.scan so the graph compiles once regardless of R.
# --------------------------------------------------------------------------

def suffix_sweep_jnp(curve, x, y, inf, d):
    """curve: SWCurve; same contract as suffix_sweep but on jnp ops with
    the complete (select-based) formulas; inputs row-major (R, ..., C),
    inf (R, 1, C); coords may carry extra leading axes (extension
    fields)."""
    from tachyon_tpu.math.ec import AffinePoint, PointXYZZ

    init = PointXYZZ(*d)

    def body(acc, row):
        rx, ry, rinf = row
        q = AffinePoint(rx, ry, rinf[0] != 0)
        nxt = curve._madd_xyzz_jnp(acc, q)
        return nxt, nxt

    rows = (x[::-1], y[::-1], inf[::-1])
    _, suf = jax.lax.scan(body, init, rows)
    # suf leaves: (R, ..., C) in bottom-up order -> top-down
    return tuple(t[::-1] for t in suf)


def reduce_sweep_jnp(curve, xyzz, d):
    from tachyon_tpu.math.ec import PointXYZZ

    init = PointXYZZ(*d)

    def body(acc, row):
        nxt = curve._add_xyzz_jnp(acc, PointXYZZ(*row))
        return nxt, None

    out, _ = jax.lax.scan(body, init, tuple(xyzz))
    return tuple(out)
