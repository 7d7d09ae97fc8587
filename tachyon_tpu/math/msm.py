"""Pippenger multi-scalar multiplication, TPU-vectorized.

TPU-native re-design of the reference's Pippenger stack (reference:
tachyon/math/elliptic_curves/msm/algorithms/pippenger/pippenger.h,
pippenger_base.h AccumulateBuckets/AccumulateWindowSums,
variable_base_msm.h).  The reference's bucket accumulation is a serial
scatter-add per OpenMP thread; a vector machine has no EC scatter-add, so
the bucket phase is restructured as:

  1. digit decomposition (c-bit unsigned windows) — elementwise;
  2. per window: sort points by digit (XLA sort), then a *segmented*
     work-efficient prefix scan (jax.lax.associative_scan over the XYZZ
     group law) — ~2n parallel point-adds per window, the same O(n)
     work as the serial reference but with log-depth parallelism;
  3. segment totals scattered into the 2^c bucket vector;
  4. bucket reduction Sum_b b*B_b via a parallel suffix scan + tree
     reduction (replacing the serial running-sum loop,
     pippenger_base.h:36-59);
  5. Horner across windows with lax.scan + fori doubling chains.

Everything is one jit; window iteration is a lax.scan so the heavy graph
compiles once.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.math.ec import AffinePoint, PointXYZZ, SWCurve


def optimal_window_bits(bits: int, n: int) -> int:
    """ln(n)+2 rule of the reference (msm_ctx.h:37), clamped to [4, 16]."""
    c = int(math.log(max(n, 2)) + 2.0)
    return max(4, min(c, 16))


def digit_decompose(scalars: jnp.ndarray, total_bits: int, c: int) -> jnp.ndarray:
    """(Ls, n) 16-bit limbs -> (W, n) uint32 digits in [0, 2^c)."""
    Ls, _ = scalars.shape[0], scalars.shape[1]
    W = (total_bits + c - 1) // c
    mask = np.uint32((1 << c) - 1)
    digs = []
    for w in range(W):
        o = w * c
        i0, sh = o // 16, o % 16
        v = scalars[i0] >> np.uint32(sh)
        if i0 + 1 < Ls and sh + c > 16:
            v = v | (scalars[i0 + 1] << np.uint32(16 - sh))
        digs.append(v & mask)
    return jnp.stack(digs, axis=0)


def _seg_scan_combine(curve: SWCurve):
    F = curve.F

    def combine(a, b):
        # keys have shape (1, n) so every pytree leaf scans along axis 1
        ka, pa = a
        kb, pb = b
        same = ka == kb  # (1, n) broadcasts over the limb axis
        added = curve.add_xyzz(pa, pb)
        out = PointXYZZ(
            *(jnp.where(same, x, y) for x, y in zip(added, pb))
        )
        return kb, out

    return combine


def _tree_reduce(curve: SWCurve, pts: PointXYZZ, axis_len: int) -> PointXYZZ:
    """Sum a (batch=axis_len) vector of XYZZ points to one point (last axis)."""
    m = 1 << max(axis_len - 1, 0).bit_length()  # next power of two
    if m != axis_len:
        pad = curve.infinity_xyzz((m - axis_len,))
        pts = jax.tree.map(
            lambda t, z: jnp.concatenate([t, z], axis=-1), pts, pad
        )
    while m > 1:
        half = m // 2
        lo = jax.tree.map(lambda t: t[..., :half], pts)
        hi = jax.tree.map(lambda t: t[..., half:], pts)
        pts = curve.add_xyzz(lo, hi)
        m = half
    return jax.tree.map(lambda t: t[..., 0], pts)


def _msm_naive(curve: SWCurve, points: AffinePoint, scalars: jnp.ndarray) -> PointXYZZ:
    """Small-n MSM: batched double-and-add scan + tree reduce.

    O(bits * n) point work but a TINY compile graph (the Pippenger scan
    trees cost minutes of XLA compile, absurd below a few hundred points —
    this also keeps G2/extension-curve MSMs compilable)."""
    n = scalars.shape[1]
    per_point = curve.scalar_mul(points, scalars)  # (batch n) of [s_i]P_i
    return _tree_reduce(curve, per_point, n)


MSM_NAIVE_THRESHOLD = 128


def msm(
    curve: SWCurve,
    points: AffinePoint,
    scalars: jnp.ndarray,
    c: int | None = None,
    total_bits: int | None = None,
) -> PointXYZZ:
    """Variable-base MSM: sum_i scalars_i * points_i -> one XYZZ point.

    points: AffinePoint with (L, n) coords; scalars: (Ls, n) plain 16-bit
    limbs of the scalar field.  jit-safe (static n).  total_bits overrides
    the scalar bit-width (GLV feeds half-width decomposed scalars).
    """
    F = curve.F
    n = scalars.shape[1]
    if n <= MSM_NAIVE_THRESHOLD:
        return _msm_naive(curve, points, scalars)
    total_bits = total_bits or curve.SF.spec.bits
    c = c or optimal_window_bits(total_bits, n)
    B = 1 << c
    digits = digit_decompose(scalars, total_bits, c)  # (W, n)
    pts_xyzz = curve.to_xyzz(points)
    combine = _seg_scan_combine(curve)

    def window_body(_, dw):
        order = jnp.argsort(dw)
        d_s = dw[order]
        p_s = jax.tree.map(
            lambda t: jnp.take(t, order, axis=t.ndim - 1), pts_xyzz
        )
        # inclusive segmented prefix scan along the point axis
        _, scanned = jax.lax.associative_scan(
            combine, (d_s[None], p_s), axis=p_s.x.ndim - 1
        )
        # segment ends hold bucket totals
        nxt = jnp.concatenate([d_s[1:], jnp.full((1,), B, d_s.dtype)])
        is_end = d_s != nxt
        idx = jnp.where(is_end, d_s, jnp.uint32(B)).astype(jnp.int32)
        zero_b = curve.infinity_xyzz((B + 1,))
        buckets = jax.tree.map(
            lambda z, v: z.at[..., idx].set(v, mode="drop"),
            zero_b,
            scanned,
        )
        # drop bucket 0 (digit 0 contributes nothing) and the dump slot B
        buckets = jax.tree.map(lambda t: t[..., 1:B], buckets)
        # suffix sums S_b = sum_{b'>=b} B_b'; window = sum_b S_b = sum b*B_b
        suffix = jax.lax.associative_scan(
            curve.add_xyzz, buckets, axis=buckets.x.ndim - 1, reverse=True
        )
        win = _tree_reduce(curve, suffix, B - 1)
        return None, win

    _, windows = jax.lax.scan(window_body, None, digits)  # leaves: (W, ...)

    # Horner over windows, most-significant first
    W = digits.shape[0]
    rev = jax.tree.map(lambda t: t[::-1], windows)

    def horner_body(acc, win):
        acc = jax.lax.fori_loop(
            0, c, lambda i, a: curve.dbl_xyzz(a), acc, unroll=False
        )
        return curve.add_xyzz(acc, win), None

    first = jax.tree.map(lambda t: t[0], rev)
    rest = jax.tree.map(lambda t: t[1:], rev)
    acc, _ = jax.lax.scan(horner_body, first, rest)
    return acc


def msm_host_reference(curve: SWCurve, point_ints, scalar_ints) -> tuple:
    """Exact python-int MSM for tests: returns affine (x, y) or None."""
    mod = curve.F.p
    a = curve.a_int if not isinstance(curve.a_int, (list, tuple)) else None
    assert a is not None, "host reference only for prime-field curves"

    def py_add(p, q):
        if p is None:
            return q
        if q is None:
            return p
        x1, y1 = p
        x2, y2 = q
        if x1 == x2 and (y1 + y2) % mod == 0:
            return None
        if p == q:
            lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, mod) % mod
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
        x3 = (lam * lam - x1 - x2) % mod
        y3 = (lam * (x1 - x3) - y1) % mod
        return (x3, y3)

    acc = None
    for (pt, s) in zip(point_ints, scalar_ints):
        if pt is None:
            continue
        add = pt
        k = int(s)
        while k:
            if k & 1:
                acc = py_add(acc, add)
            add = py_add(add, add)
            k >>= 1
    return acc
