"""Binary tower fields GF(2^k), k = 1..128 (Binius/Ulvetanna tower).

TPU-native analog of the reference's binary fields
(reference: tachyon/math/finite_fields/binary_fields/binary_field.h,
binary_tower_operations.h).  Same Wiedemann tower: each level doubles the
width via  F_{2k} = F_k[X]/(X^2 + alpha_{k}X + 1)  where alpha is the
previous level's generator, so

    (a0 + a1 X)(b0 + b1 X) = (z0+z1) + (z2 + alpha*z1) X
    z0 = a0 b0,  z1 = a1 b1,  z2 = (a0+a1)(b0+b1) + z0 + z1   (Karatsuba)

The reference dispatches to 4/8-bit lookup tables and SIMD carries; tables
are gathers on a TPU, so here the recursion bottoms out at the 1-bit AND
and every level is plain vector bit-twiddling inside uint32 lanes (k<=32)
or across a leading word axis (k = 64, 128) — the whole tower mul is one
fused XLA elementwise DAG over arbitrarily-shaped arrays.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _mask(k: int):
    return jnp.uint32((1 << k) - 1) if k < 32 else jnp.uint32(0xFFFFFFFF)


def _split(a, k: int):
    """halves of width-k elements: k<=32 within lanes, else word axis."""
    h = k // 2
    if k <= 32:
        return a & _mask(h), (a >> h) & _mask(h)
    wh = max(h // 32, 1)  # uint32 words per half
    return a[:wh], a[wh:]


def _join(lo, hi, k: int):
    h = k // 2
    if k <= 32:
        return lo | (hi << h)
    return jnp.concatenate([lo, hi], axis=0)


def _mul(a, b, k: int):
    if k == 1:
        return a & b
    h = k // 2
    a0, a1 = _split(a, k)
    b0, b1 = _split(b, k)
    z0 = _mul(a0, b0, h)
    z1 = _mul(a1, b1, h)
    z2 = _mul(a0 ^ a1, b0 ^ b1, h) ^ z0 ^ z1
    return _join(z0 ^ z1, z2 ^ _mul_alpha(z1, h), k)


def _mul_alpha(x, k: int):
    """multiply by this level's generator X (binary_tower_operations.h
    MulByAlpha): alpha at 1 bit is identity."""
    if k == 1:
        return x
    h = k // 2
    x0, x1 = _split(x, k)
    return _join(x1, x0 ^ _mul_alpha(x1, h), k)


def _square(x, k: int):
    if k == 1:
        return x
    h = k // 2
    x0, x1 = _split(x, k)
    z0 = _square(x0, h)
    z1 = _square(x1, h)
    return _join(z0 ^ z1, _mul_alpha(z1, h), k)


def _inv(x, k: int):
    if k == 1:
        return x  # 1^-1 = 1; 0 stays 0 (callers guard)
    h = k // 2
    x0, x1 = _split(x, k)
    x0x1a = x0 ^ _mul_alpha(x1, h)
    delta = _mul(x0, x0x1a, h) ^ _square(x1, h)
    dinv = _inv(delta, h)
    return _join(_mul(dinv, x0x1a, h), _mul(dinv, x1, h), k)


class BinaryField:
    """Vectorized GF(2^k).  Elements: uint32 arrays — plain shape for
    k <= 32, a leading word axis of k/32 words (little-endian) for 64/128.
    """

    def __init__(self, bits: int):
        assert bits in (1, 2, 4, 8, 16, 32, 64, 128)
        self.k = bits
        self.words = max(bits // 32, 1)

    # --- construction -----------------------------------------------------
    def _shape(self, shape):
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        return ((self.words,) + s) if self.k > 32 else s

    def zeros(self, shape=()):
        return jnp.zeros(self._shape(shape), jnp.uint32)

    def ones(self, shape=()):
        return self.encode(np.ones(shape if shape else (), dtype=object))

    def encode(self, xs) -> jnp.ndarray:
        """python ints -> device representation."""
        arr = np.atleast_1d(np.asarray(xs, dtype=object))
        scalar = np.asarray(xs, dtype=object).ndim == 0
        if self.k <= 32:
            out = (arr & ((1 << self.k) - 1)).astype(np.int64).astype(np.uint32)
            return jnp.asarray(out[0] if scalar else out)
        words = np.stack(
            [((arr >> (32 * i)) & 0xFFFFFFFF).astype(np.int64)
             for i in range(self.words)],
            axis=0,
        ).astype(np.uint32)
        return jnp.asarray(words[:, 0] if scalar else words)

    def decode(self, a) -> np.ndarray:
        arr = np.asarray(a)
        if self.k <= 32:
            return arr.astype(object)
        out = np.zeros(arr.shape[1:], dtype=object)
        for i in range(self.words):
            out |= arr[i].astype(object) << (32 * i)
        return out

    def random(self, shape=(), rng=None):
        rng = rng or np.random.default_rng()
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        n = int(np.prod(s)) if s else 1
        vals = np.empty((n,), dtype=object)
        for i in range(n):
            v = 0
            for w in range(self.words):
                v |= int(rng.integers(0, 1 << 32)) << (32 * w)
            vals[i] = v & ((1 << self.k) - 1)
        return self.encode(vals.reshape(s) if s else vals[0])

    # --- arithmetic ---------------------------------------------------------
    def add(self, a, b):
        return a ^ b

    sub = add

    def neg(self, a):
        return a

    def mul(self, a, b):
        return _mul(a, b, self.k)

    def square(self, a):
        return _square(a, self.k)

    def mul_by_alpha(self, a):
        return _mul_alpha(a, self.k)

    def inv(self, a):
        return _inv(a, self.k)

    def is_zero(self, a):
        if self.k <= 32:
            return a == 0
        return jnp.all(a == 0, axis=0)

    def pow_const(self, a, e: int):
        r = self.ones(np.asarray(a).shape[1:] if self.k > 32 else np.asarray(a).shape)
        base = a
        while e:
            if e & 1:
                r = self.mul(r, base)
            base = self.square(base)
            e >>= 1
        return r


@functools.lru_cache(maxsize=None)
def binary_field(bits: int) -> BinaryField:
    return BinaryField(bits)
