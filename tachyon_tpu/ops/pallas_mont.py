"""Pallas TPU kernels for Montgomery field arithmetic.

The pure-jnp limb code (ops/mont.py) emits ~150-250 HLO ops per field
multiply; inside MSM scan trees that multiplies into graphs XLA is slow to
compile and fuses suboptimally.  These kernels collapse one field op into
ONE custom call: the unrolled limb program lives inside a Pallas kernel
(straight-line vector code, fast Mosaic compile, everything in VMEM).

Same math as ops/mont.py (lazy-column SOS Montgomery, see bound analysis
there); layout (L, B) with B = flattened batch on the lane axis.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tachyon_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FieldSpec

MASK = np.uint32(LIMB_MASK)
BLOCK = 1024


def _mul_body(f: FieldSpec, a, b):
    """lists of (1, Bt) uint32 rows -> list of L canonical limb rows."""
    L = f.L
    nl = [np.uint32(int(v)) for v in f.p_limbs]
    n0inv = np.uint32(int(f.n0inv))
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * L + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
    # montgomery rounds
    c = zero
    for i in range(L):
        ti = cols[i] + c
        m = (ti * n0inv) & MASK
        for j in range(L):
            p = m * nl[j]
            if j == 0:
                ti = ti + (p & MASK)
            else:
                cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
        c = ti >> LIMB_BITS
    out = []
    for i in range(L, 2 * L):
        t = cols[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    extra = cols[2 * L] + c
    # conditional subtract p (borrow via sign bit: limbs are 16-bit)
    diff = []
    borrow = zero
    for i in range(L):
        t = out[i] - nl[i] - borrow
        diff.append(t & MASK)
        borrow = t >> 31
    t = extra - borrow
    borrow = t >> 31
    keep = borrow  # 1 -> value < p -> keep original
    return [jnp.where(keep.astype(jnp.bool_), out[i], diff[i]) for i in range(L)]


def _make_mul_kernel(f: FieldSpec):
    L = f.L

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i : i + 1, :] for i in range(L)]
        b = [b_ref[i : i + 1, :] for i in range(L)]
        out = _mul_body(f, a, b)
        for i in range(L):
            o_ref[i : i + 1, :] = out[i]

    return kernel


@functools.lru_cache(maxsize=None)
def _mul_call(f: FieldSpec, n_blocks: int):
    L = f.L
    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _make_mul_kernel(f),
        grid=(n_blocks,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n_blocks * BLOCK), jnp.uint32),
    )
    # inner jit so the kernel body is traced ONCE per (field, n_blocks) and
    # reused across the thousands of call sites in MSM/NTT scan graphs
    return jax.jit(call)


def mul(f: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product via one Pallas kernel; shapes (L, *batch)."""
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    n = int(np.prod(batch)) if batch else 1
    nb = max(1, -(-n // BLOCK))
    a2 = a.reshape(f.L, n)
    b2 = b.reshape(f.L, n)
    if nb * BLOCK != n:
        pad = nb * BLOCK - n
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    out = _mul_call(f, nb)(a2, b2)
    return out[:, :n].reshape((f.L,) + batch)
