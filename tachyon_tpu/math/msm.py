"""Pippenger multi-scalar multiplication, TPU-vectorized (suffix-sweep form).

TPU-native re-design of the reference's Pippenger stack (reference:
tachyon/math/elliptic_curves/msm/algorithms/pippenger/pippenger.h,
pippenger_base.h AccumulateBuckets/AccumulateWindowSums,
variable_base_msm.h).  The reference's bucket accumulation is a serial
scatter-add per OpenMP thread; a vector machine has no EC scatter-add, so
buckets are *eliminated*:

For one c-bit window with points sorted ascending by digit, the classic
running-sum identity collapses to

    window = sum_i d_i P_i = sum_{b=1}^{2^c - 1} T[pos_b]

where T[j] = sum_{i >= j} P_i (suffix point sums over the sorted array) and
pos_b = searchsorted(d_sorted, b).  Empty buckets cost nothing (pos_b =
pos_{b+1} just repeats a T value) and T[n] := infinity.

Pipeline per window (all inside ONE lax.scan over windows, so the heavy
graph compiles once):

  1. argsort digits (XLA sort) and gather points column-major into
     (L, R, C): lane c holds sorted items c*R .. c*R+R-1;
  2. a sequential-grid Pallas sweep (ops/pallas_msm.py) accumulates each
     lane bottom-up with a *blinded* 11-mul mixed add, emitting the running
     sum every step -> per-lane suffix sums, exactly n mixed adds total
     (the theoretical minimum);
  3. XLA glue stitches lane suffixes into global suffixes (a log C
     Hillis-Steele scan over column totals), gathers T at the 2^c - 1
     bucket-start positions, and a second blinded sweep + small tree
     reduces them to the window sum;
  4. Horner across windows: c doublings + one add per window.

Blinding: Pallas accumulators start at a secret random curve point D
(subtracted in the glue), so the kernel needs no doubling/infinity branches
(collision probability ~ 2^-250).  The jnp fallback paths (CPU shards,
extension-field curves) use the complete select-based formulas instead.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.math.ec import AffinePoint, PointXYZZ, SWCurve


def optimal_window_bits(bits: int, n: int) -> int:
    """ln(n)+2 rule of the reference (msm_ctx.h:37), clamped to [10, 17]
    (the suffix-sweep reduce phase wants 2^c >= 512 and the T-gather wants
    2^c << n-ish; both ends are soft)."""
    c = int(math.log(max(n, 2)) + 2.0)
    return max(10, min(c, 17))


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
        bits_have = 16 - sh
        i = i0 + 1
        while bits_have < c and i < Ls:
            v = v | (scalars[i] << np.uint32(bits_have))
            bits_have += 16
            i += 1
        digs.append(v & mask)
    return jnp.stack(digs, axis=0)


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

    O(bits * n) point work but a TINY compile graph; this also keeps
    G2/extension-curve MSMs at small n cheap to compile."""
    n = scalars.shape[1]
    per_point = curve.scalar_mul(points, scalars)  # (batch n) of [s_i]P_i
    return _tree_reduce(curve, per_point, n)


MSM_NAIVE_THRESHOLD = 128


def _host_point_mul(curve: SWCurve, k: int):
    """Exact python-int [k]G on a prime-field curve (for blind points)."""
    mod = curve.F.p
    a = curve.a_int

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

    acc, add = None, (int(curve.gen_x), int(curve.gen_y))
    while k:
        if k & 1:
            acc = py_add(acc, add)
        add = py_add(add, add)
        k >>= 1
    return acc


@functools.lru_cache(maxsize=None)
def _blind_points(curve: SWCurve):
    """Two fixed pseudo-random curve points (and their negations) used to
    blind the Pallas sweep accumulators.  Derived from [k]G with k from a
    seeded CSPRNG -- collisions with accumulator values require guessing a
    ~254-bit discrete log, probability ~2^-250 per MSM.

    Built entirely from HOST numpy arrays: the result is lru_cached, so
    any jnp value created here while tracing a jit would cache a tracer
    and leak into the next jit (observed as UnexpectedTracerError when
    two MSM sizes compile in one process)."""
    spec = curve.F.spec
    rng = np.random.default_rng(
        np.frombuffer(b"tachyon-tpu-msm-blind-0001", dtype=np.uint8)
    )

    def enc(v: int) -> np.ndarray:
        return spec.encode(np.array(int(v) % spec.p, dtype=object))

    pts = []
    for _ in range(2):
        k = int.from_bytes(rng.bytes(40), "little") % curve.SF.p
        x, y = _host_point_mul(curve, k)
        one = enc(1)
        p = PointXYZZ(enc(x), enc(y), one, one)
        npt = PointXYZZ(p.x, enc(-y), p.zz, p.zzz)
        pts.append((p, npt))
    return pts


def _bcast(p: PointXYZZ, shape) -> PointXYZZ:
    return PointXYZZ(
        *(
            jnp.broadcast_to(t.reshape(t.shape + (1,) * len(shape)),
                             t.shape + tuple(shape))
            for t in p
        )
    )


def _shift_left(p: PointXYZZ, s) -> PointXYZZ:
    """lane-shift along the last axis: out[..., c] = p[..., c+s], infinity
    (all-zero coords) shifted in at the end.  s may be a traced scalar —
    out-of-range lanes are zero-filled (= the XYZZ infinity encoding)."""
    C = p.x.shape[-1]
    lane = jnp.arange(C, dtype=jnp.int32)
    idx = lane + jnp.asarray(s, jnp.int32)
    ok = idx < C
    idx = jnp.where(ok, idx, 0)

    def sh(t):
        return jnp.where(ok, jnp.take(t, idx, axis=-1), 0)

    return PointXYZZ(*(sh(t) for t in p))


def _suffix_scan_lanes(curve: SWCurve, u: PointXYZZ) -> PointXYZZ:
    """EXCLUSIVE suffix sums over the last axis: out[c] = sum_{c'>c} u[c'].
    Hillis-Steele with dynamic shifts inside a fori_loop, so exactly ONE
    point-add graph is inlined (vs. log C of them unrolled)."""
    C = u.x.shape[-1]
    steps = max(C - 1, 0).bit_length()

    def body(i, wk):
        return curve.add_xyzz(wk, _shift_left(wk, jnp.int32(1) << i))

    return jax.lax.fori_loop(0, steps, body, _shift_left(u, 1))


def _fold_reduce_lanes(curve: SWCurve, pts: PointXYZZ) -> PointXYZZ:
    """Sum over the last axis (power-of-two length) by repeated fold-in-half
    with dynamic offsets: one inlined point-add graph, log C iterations at
    fixed width.  Result in lane 0."""
    C = pts.x.shape[-1]
    assert C & (C - 1) == 0
    steps = C.bit_length() - 1

    def body(i, acc):
        half = jnp.int32(C) >> (i + 1)
        return curve.add_xyzz(acc, _shift_left(acc, half))

    out = jax.lax.fori_loop(0, steps, body, pts)
    return jax.tree.map(lambda t: t[..., 0], out)


def _sweep_suffix(curve: SWCurve, gx, gy, ginf, d: PointXYZZ) -> PointXYZZ:
    """gx/gy: (..., R, C) sorted coords, ginf (R, C) -> suffix sums with
    suffix[..., r, c] = D + sum_{r' >= r} P[..., r', c]."""
    from tachyon_tpu.ops import pallas_msm

    C = gx.shape[-1]
    dc = _bcast(d, (C,))
    # row-major (R, ..., C) layout for the sequential-grid sweep
    gx_r = jnp.moveaxis(gx, -2, 0)
    gy_r = jnp.moveaxis(gy, -2, 0)
    ginf_r = ginf[:, None, :]
    if curve._pallas_ok:
        def tpu_fn(x, y, i, *dd):
            return PointXYZZ(*pallas_msm.suffix_sweep(curve.F.spec, x, y, i, dd))

        suf = jax.lax.platform_dependent(
            gx_r, gy_r, ginf_r, *dc,
            tpu=tpu_fn,
            default=lambda x, y, i, *dd: PointXYZZ(
                *pallas_msm.suffix_sweep_jnp(curve, x, y, i, dd)
            ),
        )
    else:
        suf = PointXYZZ(*pallas_msm.suffix_sweep_jnp(
            curve, gx_r, gy_r, ginf_r, tuple(dc)))
    return PointXYZZ(*(jnp.moveaxis(t, 0, -2) for t in suf))


def _sweep_reduce(curve: SWCurve, pts: PointXYZZ, d: PointXYZZ) -> PointXYZZ:
    """(..., R, C) XYZZ values -> (..., C) blinded column totals."""
    from tachyon_tpu.ops import pallas_msm

    C = pts.x.shape[-1]
    dc = _bcast(d, (C,))
    rows = tuple(jnp.moveaxis(t, -2, 0) for t in pts)
    if curve._pallas_ok:
        def tpu_fn(*args):
            return PointXYZZ(
                *pallas_msm.reduce_sweep(curve.F.spec, args[:4], args[4:])
            )

        return jax.lax.platform_dependent(
            *rows, *dc,
            tpu=tpu_fn,
            default=lambda *args: PointXYZZ(
                *pallas_msm.reduce_sweep_jnp(curve, args[:4], args[4:])
            ),
        )
    return PointXYZZ(*pallas_msm.reduce_sweep_jnp(curve, rows, tuple(dc)))


def _pack_points(px, py, pinf):
    """(L, n) x/y 16-bit limb coords + inf flags -> (L, n) packed u32 rows
    (two limbs per word: low-half limb | high-half limb << 16, x then y);
    infinity encodes as all-zero (x = y = 0 is never on a b != 0
    short-Weierstrass curve).  Halves the bytes the per-window random
    gather must move.  The halves packing (limb j with limb j+L/2, not
    j with j+1) makes unpack two SLICES + a concat — layout-preserving —
    instead of an interleaving stack/reshape that costs a cross-sublane
    shuffle over the whole gathered array."""
    L = px.shape[0]
    half = L // 2
    live = (pinf == 0).astype(jnp.uint32)

    def pack(t):
        return (t[:half] | (t[half:] << 16)) * live

    return jnp.concatenate([pack(px), pack(py)], axis=0)


def _unpack_points(packed):
    """(L, R, C) packed rows -> x, y (L, R, C) 16-bit limbs + inf (R, C)."""
    L = packed.shape[0]
    half = L // 2

    def unpack(rows):
        # limb j = low 16 bits of word j; limb j + L/2 = high 16 bits
        return jnp.concatenate([rows & jnp.uint32(0xFFFF), rows >> 16],
                               axis=0)

    x = unpack(packed[:half])
    y = unpack(packed[half:])
    inf = (jnp.max(packed, axis=0) == 0).astype(jnp.uint32)
    return x, y, inf


def _window_sum(curve: SWCurve, px, py, pinf, dw, C, R, B, blind1, blind2,
                packed=None) -> PointXYZZ:
    """One Pippenger window: sum_i dw_i * P_i via the sorted suffix-sum
    identity (see module docstring).  px/py: (..., R*C) coords, pinf:
    (R*C,) uint32 flags, dw: (R*C,) uint32 digits in [0, B); packed: the
    optional (L, R*C) 16-bit-packed x||y rows (prime-field curves) that
    halve the dominant random-gather traffic."""
    d1, nd1 = blind1
    d2, nd2 = blind2
    n_pad = R * C
    lead = px.shape[:-1]
    C2 = min(512, B)
    R2 = max(1, B // C2)
    # ONE sort yields both the sorted digits and the permutation — the
    # separate dw[order] re-gather costs ~1.5x the sort itself on TPU
    d_s, order = jax.lax.sort_key_val(
        dw, jnp.arange(dw.shape[0], dtype=jnp.uint32)
    )
    idx2 = jnp.transpose(order.reshape(C, R))  # (R, C): item c*R+r
    if packed is not None:
        gp = jnp.take(packed, idx2, axis=-1)   # (L, R, C) packed
        gx, gy, ginf = _unpack_points(gp)
    else:
        gx = jnp.take(px, idx2, axis=-1)       # (..., R, C)
        gy = jnp.take(py, idx2, axis=-1)
        ginf = pinf[idx2]
    suffix = _sweep_suffix(curve, gx, gy, ginf, d1)
    # true column totals U = suffix[..., 0, :] - D, then the exclusive
    # lane-suffix scan Wk[c] = sum_{c'>c} U[c'] (Hillis-Steele, log C)
    u = curve.add_xyzz(
        PointXYZZ(*(t[..., 0, :] for t in suffix)), _bcast(nd1, (C,))
    )
    wk = _suffix_scan_lanes(curve, u)
    wpp = curve.add_xyzz(wk, _bcast(nd1, (C,)))  # W'' = W - D
    # gather T at bucket starts: global sorted index k -> (r=k%R, c=k//R)
    bq = jnp.arange(1, B, dtype=dw.dtype)
    pos = jnp.searchsorted(d_s, bq)              # (B-1,) in [0, n_pad]
    valid = pos < n_pad
    posc = jnp.where(valid, pos, 0)
    flat = (posc % R) * C + (posc // R)
    suf_flat = jax.tree.map(lambda t: t.reshape(lead + (n_pad,)), suffix)
    tg = jax.tree.map(lambda t: jnp.take(t, flat, axis=-1), suf_flat)
    wg = jax.tree.map(lambda t: jnp.take(t, posc // R, axis=-1), wpp)
    tv = curve.add_xyzz(PointXYZZ(*tg), PointXYZZ(*wg))
    tv = PointXYZZ(*(jnp.where(valid, t, 0) for t in tv))
    # reduce the B-1 T values (pad one infinity to B, any order works)
    tv = jax.tree.map(
        lambda t: jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
        .reshape(lead + (R2, C2)),
        tv,
    )
    red = _sweep_reduce(curve, tv, d2)           # (..., C2), D2-biased lanes
    red = curve.add_xyzz(red, _bcast(nd2, (C2,)))  # unbias EVERY lane
    return _fold_reduce_lanes(curve, red)


def _layout_and_blinds(curve: SWCurve, n: int):
    """Pick the (R, C) sweep layout for n points and the blind points."""
    C = 4096 if n >= (1 << 15) else 512
    R = -(-n // C)
    if curve._pallas_ok:
        blinds = _blind_points(curve)
    else:  # complete jnp formulas: no blinding needed
        inf = curve.infinity_xyzz(())
        blinds = ((inf, inf), (inf, inf))
    return C, R, blinds


def msm(
    curve: SWCurve,
    points: AffinePoint,
    scalars: jnp.ndarray,
    c: int | None = None,
    total_bits: int | None = None,
) -> PointXYZZ:
    """Variable-base MSM: sum_i scalars_i * points_i -> one XYZZ point.

    points: AffinePoint with (..., n) coords; scalars: (Ls, n) plain 16-bit
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

    # column-major layout: C lanes, R rows per lane
    C, R, (blind1, blind2) = _layout_and_blinds(curve, n)
    n_pad = R * C
    px, py, pinf = points.x, points.y, points.inf.astype(jnp.uint32)
    if n_pad != n:
        pad = n_pad - n
        zpad = [(0, 0)] * (px.ndim - 1) + [(0, pad)]
        px = jnp.pad(px, zpad)
        py = jnp.pad(py, zpad)
        pinf = jnp.pad(pinf, [(0, pad)], constant_values=1)
        digits = jnp.pad(digits, [(0, 0), (0, pad)])

    packed = (
        _pack_points(px, py, pinf)
        if curve._pallas_ok and curve.F.L % 2 == 0 else None
    )

    def window_body(acc, dw):
        win = _window_sum(curve, px, py, pinf, dw, C, R, B, blind1, blind2,
                          packed=packed)
        # Horner fold: acc = 2^c * acc + win
        acc = jax.lax.fori_loop(
            0, c, lambda i, a: curve.dbl_xyzz(a), acc, unroll=False
        )
        return curve.add_xyzz(acc, win), None

    acc0 = curve.infinity_xyzz(())
    acc, _ = jax.lax.scan(window_body, acc0, digits[::-1])  # MSB first
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
