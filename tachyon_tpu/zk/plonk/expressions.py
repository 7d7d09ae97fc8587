"""PLONK expression AST + vectorized evaluator.

Analog of the reference's expression layer
(reference: tachyon/zk/expressions/expression.h, zk/plonk/vanishing/
graph_evaluator.h).  The reference compiles the gate AST into a register
machine evaluated row-by-row with OpenMP; here evaluation IS vectorized —
every AST node evaluates to a whole (L, n) column, XLA fuses the resulting
elementwise DAG, and rotations are jnp.roll on the row axis.
"""
from __future__ import annotations

import dataclasses
from typing import Union

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Constant:
    value: int


@dataclasses.dataclass(frozen=True)
class Fixed:
    column: int
    rotation: int = 0


@dataclasses.dataclass(frozen=True)
class Advice:
    column: int
    rotation: int = 0


@dataclasses.dataclass(frozen=True)
class Instance:
    column: int
    rotation: int = 0


@dataclasses.dataclass(frozen=True)
class Challenge:
    index: int
    phase: int = 0


@dataclasses.dataclass(frozen=True)
class Selector:
    """Virtual selector reference (halo2 Expression::Selector; reference:
    tachyon/zk/expressions/expression.h kSelector).  Only valid before
    selector compression (keygen replaces every Selector with a fixed-column
    interpolation expression); evaluating one raises."""
    index: int
    is_simple: bool = True


@dataclasses.dataclass(frozen=True)
class Negated:
    expr: "Expr"


@dataclasses.dataclass(frozen=True)
class Sum:
    left: "Expr"
    right: "Expr"


@dataclasses.dataclass(frozen=True)
class Product:
    left: "Expr"
    right: "Expr"


@dataclasses.dataclass(frozen=True)
class Scaled:
    expr: "Expr"
    scale: int


Expr = Union[Constant, Fixed, Advice, Instance, Challenge, Selector, Negated,
             Sum, Product, Scaled]


def degree(e: Expr) -> int:
    """polynomial degree in the trace columns (reference: expression.h Degree)."""
    if isinstance(e, (Constant, Challenge)):
        return 0
    if isinstance(e, (Fixed, Advice, Instance, Selector)):
        return 1
    if isinstance(e, Negated):
        return degree(e.expr)
    if isinstance(e, Scaled):
        return degree(e.expr)
    if isinstance(e, Sum):
        return max(degree(e.left), degree(e.right))
    if isinstance(e, Product):
        return degree(e.left) + degree(e.right)
    raise TypeError(e)


class Evaluator:
    """Evaluates expressions over column tables.

    tables: dicts column -> (L, n) arrays (evaluation form over some domain);
    `rot_scale` maps rotation units to row offsets (extended-domain evals use
    rot_scale = blowup factor, as in the reference's CircuitPolynomialBuilder).
    """

    def __init__(self, F, fixed, advice, instance, challenges=None, rot_scale=1):
        self.F = F
        self.fixed = fixed
        self.advice = advice
        self.instance = instance
        self.challenges = challenges or {}
        self.rot_scale = rot_scale

    def _rot(self, col: jnp.ndarray, rotation: int) -> jnp.ndarray:
        if rotation == 0:
            return col
        return jnp.roll(col, -rotation * self.rot_scale, axis=1)

    def eval(self, e: Expr) -> jnp.ndarray:
        F = self.F
        if isinstance(e, Constant):
            n = (self.fixed or self.advice or self.instance)[0].shape[1]
            return F.full((n,), e.value)
        if isinstance(e, Fixed):
            return self._rot(self.fixed[e.column], e.rotation)
        if isinstance(e, Advice):
            return self._rot(self.advice[e.column], e.rotation)
        if isinstance(e, Instance):
            return self._rot(self.instance[e.column], e.rotation)
        if isinstance(e, Challenge):
            n = (self.fixed or self.advice or self.instance)[0].shape[1]
            return F.full((n,), self.challenges[e.index])
        if isinstance(e, Negated):
            return F.neg(self.eval(e.expr))
        if isinstance(e, Sum):
            return F.add(self.eval(e.left), self.eval(e.right))
        if isinstance(e, Product):
            return F.mul(self.eval(e.left), self.eval(e.right))
        if isinstance(e, Scaled):
            return F.mul(self.eval(e.expr), F.full((), e.scale)[:, None])
        raise TypeError(e)
