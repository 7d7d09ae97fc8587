"""PrimeField: ergonomic array-API over the mont limb kernels.

This is the user-facing field type (analog of the reference's
``PrimeField<Config>``, tachyon/math/finite_fields/prime_field_fallback.h),
but array-first: a "value" is always a jnp uint32 array of shape
``(L, *batch)`` in Montgomery form, and every method is vectorized over the
batch axes and jit-compatible.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.fields.spec import FieldSpec
from tachyon_tpu.ops import mont


class PrimeField:
    def __init__(self, spec: FieldSpec):
        self.spec = spec

    # --- construction -----------------------------------------------------
    @property
    def L(self) -> int:
        return self.spec.L

    @property
    def p(self) -> int:
        return self.spec.p

    @property
    def name(self) -> str:
        return self.spec.name

    @property
    def order(self) -> int:
        return self.spec.p

    # number of leading structure axes of an element (limb axis only)
    coeff_ndim = 1

    def __repr__(self):
        return f"PrimeField({self.spec.name})"

    def zeros(self, shape=()):
        return mont.zeros(self.spec, tuple(shape) if not isinstance(shape, int) else (shape,))

    def ones(self, shape=()):
        s = tuple(shape) if not isinstance(shape, int) else (shape,)
        return mont.ones(self.spec, s)

    def full(self, shape, value: int):
        s = tuple(shape) if not isinstance(shape, int) else (shape,)
        v = self.spec.encode(np.array(value % self.p, dtype=object))
        return jnp.broadcast_to(
            jnp.asarray(v).reshape((self.L,) + (1,) * len(s)), (self.L, *s)
        )

    def encode(self, xs):
        """host python ints -> device Montgomery limbs (L, *shape)."""
        return jnp.asarray(self.spec.encode(xs))

    def decode(self, limbs):
        """device Montgomery limbs -> numpy object array of python ints."""
        return self.spec.decode(np.asarray(limbs))

    def random(self, shape=(), rng: np.random.Generator | None = None):
        """Uniform random canonical elements (host-side sampling)."""
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        rng = rng or np.random.default_rng()
        n = int(np.prod(s)) if s else 1
        vals = np.empty((n,), dtype=object)
        nbytes = (self.spec.bits + 7) // 8 + 8
        for i in range(n):
            vals[i] = int.from_bytes(rng.bytes(nbytes), "little") % self.p
        return self.encode(vals.reshape(s) if s else vals[0])

    # --- arithmetic ---------------------------------------------------------
    def add(self, a, b):
        return mont.add(self.spec, a, b)

    def sub(self, a, b):
        return mont.sub(self.spec, a, b)

    def neg(self, a):
        return mont.neg(self.spec, a)

    def mul(self, a, b):
        return mont.mul(self.spec, a, b)

    def square(self, a):
        return mont.square(self.spec, a)

    def double(self, a):
        return mont.double(self.spec, a)

    def mul_small(self, a, k: int):
        return mont.mul_small(self.spec, a, k)

    def pow_const(self, a, e: int):
        return mont.pow_const(self.spec, a, e)

    def inv(self, a):
        return mont.inv(self.spec, a)

    def batch_inverse(self, a, axis=-1):
        return mont.batch_inverse(self.spec, a, axis=axis)

    def is_zero(self, a):
        return mont.is_zero(self.spec, a)

    def eq(self, a, b):
        return mont.eq(self.spec, a, b)

    def select(self, mask, a, b):
        return mont.select(mask, a, b)

    # --- roots of unity ------------------------------------------------------
    def root_of_unity(self, order: int):
        return self.encode(self.spec.root_of_unity(order))

    @property
    def two_adicity(self) -> int:
        return self.spec.two_adicity
