"""Vectorized multi-limb Montgomery arithmetic over jnp uint32 arrays.

TPU-native equivalent of the reference's PrimeField core
(reference: tachyon/math/finite_fields/prime_field_fallback.h DoFastMul /
MontgomeryReduce64, and tachyon/math/base/big_int.h) -- redesigned for a
vector machine: every op is elementwise over an arbitrary batch of elements
with the limb axis LEADING (shape (L, *batch)); there are no per-element
carry loops, only L-step unrolled limb sweeps that are full-width VPU ops.

All functions take a FieldSpec `f` closed over at trace time; everything is
jit-compatible (static shapes, no data-dependent control flow).

Bound analysis for `mul` (lazy-column SOS Montgomery):
  * initial product columns accumulate <= 2L lo/hi terms, each < 2^16
  * each of the L Montgomery rounds adds one lo and one hi term (< 2^16)
    to a column plus at most one ripple carry (< 2^7 * 2^16 / 2^16)
  * max column value < 4L * 2^16 + carries < 2^23 for L<=16  => uint32-safe.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tachyon_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FieldSpec

_U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


def _u(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


def const_limbs(f: FieldSpec, value_limbs: np.ndarray, like: jnp.ndarray):
    """Broadcast a (L,) constant limb vector to the batch shape of `like`."""
    c = jnp.asarray(value_limbs, dtype=_U32)
    return jnp.reshape(c, (f.L,) + (1,) * (like.ndim - 1))


def zeros(f: FieldSpec, batch_shape: Sequence[int]) -> jnp.ndarray:
    return jnp.zeros((f.L, *batch_shape), dtype=_U32)


def ones(f: FieldSpec, batch_shape: Sequence[int]) -> jnp.ndarray:
    one = jnp.asarray(f.r_limbs, dtype=_U32).reshape(
        (f.L,) + (1,) * len(batch_shape)
    )
    return jnp.broadcast_to(one, (f.L, *batch_shape))


# ----------------------------------------------------------------------------
# limb-list helpers (work on python lists of (batch,) arrays; unrolled at trace)
# ----------------------------------------------------------------------------

def _split(a: jnp.ndarray) -> list[jnp.ndarray]:
    return [a[i] for i in range(a.shape[0])]


def _join(limbs: list[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(limbs, axis=0)


def _carry_sweep(cols: list[jnp.ndarray], n_out: int) -> list[jnp.ndarray]:
    """Normalize lazy uint32 columns into n_out 16-bit limbs (drops overflow
    beyond n_out; callers must size n_out to hold the true value)."""
    out = []
    c = None
    for i in range(n_out):
        t = cols[i] if i < len(cols) else jnp.zeros_like(cols[0])
        if c is not None:
            t = t + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return out


def _sub_with_borrow(a: list, b: list) -> tuple[list, jnp.ndarray]:
    """a - b over 16-bit limbs; returns (diff limbs, borrow flag in {0,1})."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(len(a)):
        bi = b[i] if i < len(b) else jnp.zeros_like(a[0])
        t = a[i] - bi - borrow  # uint32 wraparound
        out.append(t & MASK)
        # inputs are 16-bit limbs: t fits 16 bits unless it underflowed
        borrow = jnp.where(t > MASK, _u(1), _u(0))
    return out, borrow


def _csub_p(f: FieldSpec, limbs: list, extra: jnp.ndarray | None) -> list:
    """Conditionally subtract p: input value < 2p (with optional extra top
    limb), output canonical (< p) in L limbs."""
    p = [jnp.full_like(limbs[0], int(v)) for v in f.p_limbs]
    a = list(limbs)
    if extra is not None:
        a = a + [extra]
        p = p + [jnp.zeros_like(limbs[0])]
    diff, borrow = _sub_with_borrow(a, p)
    keep = borrow.astype(jnp.bool_)  # borrow==1 -> a < p -> keep a
    out = [jnp.where(keep, a[i], diff[i]) for i in range(f.L)]
    return out


# ----------------------------------------------------------------------------
# public ops: all take/return (L, *batch) uint32 arrays in Montgomery form
# ----------------------------------------------------------------------------

def _p_stacked(f: FieldSpec, like: jnp.ndarray) -> jnp.ndarray:
    """(L, *batch) broadcast of the modulus limbs."""
    p = jnp.asarray(f.p_limbs, dtype=_U32).reshape(
        (f.L,) + (1,) * (like.ndim - 1)
    )
    return jnp.broadcast_to(p, like.shape)


def _csub_p_scan(f: FieldSpec, out: jnp.ndarray,
                 extra: jnp.ndarray) -> jnp.ndarray:
    """scan-form conditional subtract p (see _csub_p); out (L, *batch)."""
    def body(borrow, tp):
        t, pi = tp
        d = t - pi - borrow
        return d >> 31, d & MASK

    borrow, diff = jax.lax.scan(
        body, jnp.zeros_like(out[0]), (out, _p_stacked(f, out))
    )
    t = extra - borrow
    keep = (t >> 31).astype(jnp.bool_)  # borrowed -> value < p -> keep
    return jnp.where(keep, out, diff)


def _add_scan(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compile-compact add: the carry ripple is a lax.scan over the limb
    axis, so XLA sees ONE loop body per shape and dedupes it across every
    add in the graph — the unrolled form costs ~2s of XLA:CPU compile per
    call site (the round-4 dryrun/suite timeout root cause)."""
    def body(c, ab):
        ai, bi = ab
        t = ai + bi + c
        return t >> LIMB_BITS, t & MASK

    c, out = jax.lax.scan(body, jnp.zeros_like(a[0]), (a, b))
    return _csub_p_scan(f, out, c)


def _sub_scan(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    def body(borrow, ab):
        ai, bi = ab
        t = ai - bi - borrow
        return t >> 31, t & MASK

    borrow, diff = jax.lax.scan(body, jnp.zeros_like(a[0]), (a, b))

    def body2(c, dp):
        d, pi = dp
        t = d + borrow * pi + c  # borrow==1 -> add p back
        return t >> LIMB_BITS, t & MASK

    _, res = jax.lax.scan(
        body2, jnp.zeros_like(a[0]), (diff, _p_stacked(f, diff))
    )
    return res


def _add_unrolled(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    av, bv = _split(a), _split(b)
    cols = [x + y for x, y in zip(av, bv)]
    # normalize L limbs + top carry
    out = []
    c = jnp.zeros_like(cols[0])
    for i in range(f.L):
        t = cols[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return _join(_csub_p(f, out, c))


def _sub_unrolled(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    av, bv = _split(a), _split(b)
    diff, borrow = _sub_with_borrow(av, bv)
    # if borrow: add p
    addp = []
    c = jnp.zeros_like(diff[0])
    sel = borrow  # {0,1}
    for i in range(f.L):
        t = diff[i] + sel * _u(int(f.p_limbs[i])) + c
        addp.append(t & MASK)
        c = t >> LIMB_BITS
    return _join(addp)


def add(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b mod p.  TPU lowers the unrolled limb chain (parallel vector
    ops); other platforms take the scan form, whose single loop body keeps
    XLA:CPU compile time flat in the number of adds in a graph."""
    a, b = jnp.broadcast_arrays(a, b)
    return jax.lax.platform_dependent(
        a, b,
        tpu=partial(_add_unrolled, f),
        default=partial(_add_scan, f),
    )


def sub(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    return jax.lax.platform_dependent(
        a, b,
        tpu=partial(_sub_unrolled, f),
        default=partial(_sub_scan, f),
    )


def neg(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(f, jnp.zeros_like(a), a)


def double(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(f, a, a)


import functools


@functools.lru_cache(maxsize=None)
def _antidiag_idx(L: int, shifted: bool) -> np.ndarray:
    """(L, 2L+1) gather indices: idx[i, k] = k - i (or k-1-i when shifted),
    clamped to L which points at a zero pad column."""
    W = 2 * L + 1
    idx = np.full((L, W), L, dtype=np.int32)
    for i in range(L):
        for k in range(W):
            j = k - i - (1 if shifted else 0)
            if 0 <= j < L:
                idx[i, k] = j
    return idx


def _colsums(L: int, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Sum anti-diagonals of the (L, L, *batch) lo/hi partial-product
    matrices into (2L+1, *batch) lazy columns (uint32-exact: <= 2L terms
    of < 2^16 each)."""
    batch_ndim = lo.ndim - 2
    pad = jnp.zeros_like(lo[:, :1])
    lo_p = jnp.concatenate([lo, pad], axis=1)  # (L, L+1, *batch)
    hi_p = jnp.concatenate([hi, pad], axis=1)
    expand = (slice(None), slice(None)) + (None,) * batch_ndim
    idx_lo = jnp.asarray(_antidiag_idx(L, False))[expand]
    idx_hi = jnp.asarray(_antidiag_idx(L, True))[expand]
    g_lo = jnp.take_along_axis(lo_p, idx_lo, axis=1)  # (L, W, *batch)
    g_hi = jnp.take_along_axis(hi_p, idx_hi, axis=1)
    return g_lo.sum(axis=0) + g_hi.sum(axis=0)  # (W, *batch)


def _mul_jnp(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = f.L
    prod = a[:, None] * b[None, :]  # (L, L, *batch), exact: 16b x 16b
    cols = _colsums(L, prod & MASK, prod >> LIMB_BITS)
    return _mont_reduce_cols(f, cols)


_PALLAS_ENABLED = os.environ.get("TACHYON_PALLAS", "1") != "0"


def mul(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: mont(a) * mont(b) -> mont(a*b).

    On TPU this lowers to a single Pallas kernel (ops/pallas_mont.py); the
    portable jnp limb program is used elsewhere (selected per lowering
    platform, so cpu-mesh shard_map regions inside a tpu process work)."""
    a, b = jnp.broadcast_arrays(a, b)
    if not _PALLAS_ENABLED:
        return _mul_jnp(f, a, b)
    from tachyon_tpu.ops import pallas_mont

    return jax.lax.platform_dependent(
        a,
        b,
        tpu=partial(pallas_mont.mul, f),
        default=partial(_mul_jnp, f),
    )


def square(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mul(f, a, a)


def _mont_reduce_cols(f: FieldSpec, cols: jnp.ndarray) -> jnp.ndarray:
    """Reduce (2L+1, *batch) lazy columns (value < R*p) to L canonical limbs.

    The L Montgomery rounds run in a fori_loop (compiled once) instead of a
    Python-unrolled chain of scatter updates: one field mul costs ~30 HLO
    ops instead of ~200, which is what keeps the jnp point-op graphs (CPU
    shards, extension curves) compilable on a small host — XLA:CPU compile
    is minutes per unrolled point formula otherwise."""
    L = f.L
    batch_ndim = cols.ndim - 1
    n0inv = _u(int(f.n0inv))
    nl = jnp.asarray(f.p_limbs).reshape((L,) + (1,) * batch_ndim)

    def round_body(i, state):
        cols, c = state
        ti = jax.lax.dynamic_index_in_dim(cols, i, 0, keepdims=False) + c
        m = (ti * n0inv) & MASK
        pm = m[None] * nl  # (L, *batch)
        plo, phi = pm & MASK, pm >> LIMB_BITS
        ti = ti + plo[0]
        win = jax.lax.dynamic_slice_in_dim(cols, i + 1, L, axis=0)
        upd = win + phi
        upd = upd.at[: L - 1].add(plo[1:])
        cols = jax.lax.dynamic_update_slice_in_dim(cols, upd, i + 1, axis=0)
        return cols, ti >> LIMB_BITS  # low 16 bits of ti are now zero

    cols, c = jax.lax.fori_loop(
        0, L, round_body, (cols, jnp.zeros_like(cols[0]))
    )
    out = []
    for i in range(L, 2 * L):
        t = cols[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    extra = cols[2 * L] + c
    return _join(_csub_p(f, out, extra))


def mont_reduce(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """mont(x) -> x (divide by R): from-Montgomery conversion."""
    pad = jnp.zeros((f.L + 1,) + a.shape[1:], dtype=_U32)
    return _mont_reduce_cols(f, jnp.concatenate([a, pad], axis=0))


def to_mont(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """x (plain 16-bit limbs, < p) -> mont(x)."""
    return mul(f, a, const_limbs(f, f.r2_limbs, a))


def mul_small(f: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k for small non-negative python int k (repeated doubling)."""
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else add(f, acc, base)
        k >>= 1
        if k:
            base = double(f, base)
    return acc


def is_zero(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(batch,) bool — note: requires canonical form (always true here)."""
    return jnp.all(a == 0, axis=0)


def eq(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask of batch shape (broadcast over limbs)."""
    return jnp.where(mask[None], a, b)


def pow_const(f: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a ** e for a fixed python-int exponent, via lax.scan over the bits
    (compiles exactly one square + one mul regardless of exponent size)."""
    if e == 0:
        return ones(f, a.shape[1:])
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )

    def body(acc, bit):
        acc = square(f, acc)
        acc = select(bit.astype(jnp.bool_), mul(f, acc, a), acc)
        return acc, None

    init = ones(f, a.shape[1:])
    # first bit is always 1 for e>0: start from a to save one iteration
    acc, _ = jax.lax.scan(body, init, bits)
    return acc


def inv(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse; inv(0) = 0 (as in the reference's unchecked paths)."""
    return pow_const(f, a, f.p - 2)


def batch_inverse(f: FieldSpec, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Montgomery-trick batch inverse along a batch axis (zeros -> zeros).

    Reference: tachyon/math/base/field.h BatchInverse. Uses an inclusive
    prefix-product scan, one Fermat inverse, and a suffix pass.
    """
    if axis < 0:
        axis = a.ndim + axis
    assert axis != 0, "axis 0 is the limb axis"
    a_moved = jnp.moveaxis(a, axis, 1)  # (L, n, ...)
    n = a_moved.shape[1]
    zero_mask = is_zero(f, a_moved)  # (n, ...)
    safe = select(zero_mask, ones(f, a_moved.shape[1:]), a_moved)

    xs = jnp.moveaxis(safe, 1, 0)  # (n, L, ...)

    def fwd(carry, x):
        nxt = mul(f, carry, x)
        return nxt, carry  # exclusive prefix

    total, prefix = jax.lax.scan(fwd, ones(f, a_moved.shape[2:]), xs)
    total_inv = inv(f, total)

    def bwd(carry, xp):
        x, pref = xp
        out = mul(f, carry, pref)  # = inv(x) * (prod of later carried)
        nxt = mul(f, carry, x)
        return nxt, out

    _, inv_rev = jax.lax.scan(bwd, total_inv, (xs, prefix), reverse=True)
    out = jnp.moveaxis(inv_rev, 0, 1)  # (L, n, ...)
    out = select(zero_mask, jnp.zeros_like(out), out)
    return jnp.moveaxis(out, 1, axis)
