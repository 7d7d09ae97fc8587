"""Unit circle group x^2 + y^2 = 1 over Mersenne-31 (Circle-STARK substrate).

TPU-native analog of the reference's circle layer
(reference: tachyon/math/circle/circle.h, circle/affine_point.h,
circle/m31/BUILD.bazel — M31 G1 with generator (2, 1268011823), scalar
group Z/2^31).  The group law is rotation composition:
(x1,y1)+(x2,y2) = (x1 x2 - y1 y2, x1 y2 + y1 x2), identity (1, 0).
All ops are vectorized over limb arrays like the EC layer.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField


class CirclePoint(NamedTuple):
    x: jnp.ndarray  # (L, *batch)
    y: jnp.ndarray


class CircleGroup:
    # 2^31 = order of the M31 circle group (p + 1)
    ORDER = 1 << 31
    GEN = (2, 1268011823)

    def __init__(self, F: PrimeField):
        self.F = F

    def identity(self, shape=()) -> CirclePoint:
        return CirclePoint(self.F.ones(shape), self.F.zeros(shape))

    def generator(self, shape=()) -> CirclePoint:
        return CirclePoint(
            self.F.full(shape, self.GEN[0]), self.F.full(shape, self.GEN[1])
        )

    def encode(self, pts) -> CirclePoint:
        """pts: sequence of (x, y) int pairs."""
        xs = np.array([p[0] for p in pts], dtype=object)
        ys = np.array([p[1] for p in pts], dtype=object)
        return CirclePoint(self.F.encode(xs), self.F.encode(ys))

    def decode(self, p: CirclePoint):
        return self.F.decode(p.x), self.F.decode(p.y)

    def is_on_circle(self, p: CirclePoint):
        F = self.F
        one = F.ones(()).reshape((-1,) + (1,) * (p.x.ndim - 1))
        return F.eq(F.add(F.square(p.x), F.square(p.y)), one)

    def add(self, a: CirclePoint, b: CirclePoint) -> CirclePoint:
        F = self.F
        return CirclePoint(
            F.sub(F.mul(a.x, b.x), F.mul(a.y, b.y)),
            F.add(F.mul(a.x, b.y), F.mul(a.y, b.x)),
        )

    def double(self, a: CirclePoint) -> CirclePoint:
        F = self.F
        one = F.ones(()).reshape((-1,) + (1,) * (a.x.ndim - 1))
        # (2x^2 - 1, 2xy)
        return CirclePoint(
            F.sub(F.double(F.square(a.x)), one),
            F.double(F.mul(a.x, a.y)),
        )

    def neg(self, a: CirclePoint) -> CirclePoint:
        """conjugate = inverse rotation."""
        return CirclePoint(a.x, self.F.neg(a.y))

    def antipode(self, a: CirclePoint) -> CirclePoint:
        return CirclePoint(self.F.neg(a.x), self.F.neg(a.y))

    def scalar_mul(self, a: CirclePoint, k: int) -> CirclePoint:
        k %= self.ORDER
        acc = None
        add = a
        while k:
            if k & 1:
                acc = add if acc is None else self.add(acc, add)
            add = self.double(add)
            k >>= 1
        return acc if acc is not None else self.identity(
            np.asarray(a.x).shape[1:]
        )

    def subgroup_generator(self, log_size: int) -> tuple:
        """generator of the order-2^log_size subgroup, as host ints."""
        p = self.F.p
        x, y = self.GEN
        for _ in range(31 - log_size):
            x, y = (2 * x * x - 1) % p, (2 * x * y) % p
        return (x, y)


@functools.lru_cache(maxsize=None)
def m31_circle() -> CircleGroup:
    return CircleGroup(PrimeField(presets.MERSENNE31))
