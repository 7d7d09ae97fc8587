"""Circuit synthesis API: Layouter / Region / SimpleFloorPlanner.

Analog of the reference's halo2 layout layer
(reference: tachyon/zk/plonk/layout/layouter.h, region.h,
floor_planner/simple_floor_planner.h, floor_planner/v1/ — the V1 planner's
region-packing optimization is a round-2 item; this is the Simple planner:
regions are laid out sequentially from row 0).

Usage mirrors halo2:

    class MyCircuit:
        def configure(self, cs) -> config        # register columns/gates
        def synthesize(self, config, layouter)   # assign witness by region

    planner = SimpleFloorPlanner(cs, n)
    assignment = planner.synthesize(circuit, config)
    # assignment.fixed / .advice / .instance -> keygen + prover inputs
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from tachyon_tpu.zk.plonk.constraint_system import ColumnRef, ConstraintSystem


@dataclasses.dataclass(frozen=True)
class Cell:
    column: ColumnRef
    row: int


class Assignment:
    """Collected column values (numpy object arrays of ints) + copies."""

    def __init__(self, cs: ConstraintSystem, n: int):
        self.cs = cs
        self.n = n
        self.fixed = [np.zeros(n, dtype=object) for _ in range(cs.num_fixed)]
        self.advice = [np.zeros(n, dtype=object) for _ in range(cs.num_advice)]
        self.instance = [
            np.zeros(n, dtype=object) for _ in range(cs.num_instance)
        ]

    def set(self, col: ColumnRef, row: int, value: int):
        assert 0 <= row < self.n, f"row {row} out of range"
        table = {"fixed": self.fixed, "advice": self.advice,
                 "instance": self.instance}[col.kind]
        table[col.index][row] = int(value)

    def get(self, col: ColumnRef, row: int) -> int:
        table = {"fixed": self.fixed, "advice": self.advice,
                 "instance": self.instance}[col.kind]
        return int(table[col.index][row])


class Region:
    """A contiguous row window; offsets are region-relative
    (reference: layout/region.h AssignAdvice/AssignFixed/ConstrainEqual)."""

    def __init__(self, planner: "SimpleFloorPlanner", start: int):
        self._p = planner
        self.start = start
        self.rows_used = 0

    def _touch(self, offset: int):
        self.rows_used = max(self.rows_used, offset + 1)

    def assign_advice(self, col: ColumnRef, offset: int, value: int) -> Cell:
        assert col.kind == "advice"
        self._touch(offset)
        self._p.assignment.set(col, self.start + offset, value)
        return Cell(col, self.start + offset)

    def assign_fixed(self, col: ColumnRef, offset: int, value: int) -> Cell:
        assert col.kind == "fixed"
        self._touch(offset)
        self._p.assignment.set(col, self.start + offset, value)
        return Cell(col, self.start + offset)

    def assign_advice_from_instance(
        self, inst: ColumnRef, inst_row: int, col: ColumnRef, offset: int
    ) -> Cell:
        """copy a public input into an advice cell (constrained equal)."""
        v = self._p.assignment.get(inst, inst_row)
        cell = self.assign_advice(col, offset, v)
        self._p.cs.copy((inst, inst_row), (col, cell.row))
        return cell

    def constrain_equal(self, a: Cell, b: Cell):
        self._p.cs.copy((a.column, a.row), (b.column, b.row))


class SimpleFloorPlanner:
    """Sequential region placement (simple_floor_planner.h): each region
    starts at the next free row."""

    def __init__(self, cs: ConstraintSystem, n: int):
        self.cs = cs
        self.n = n
        self.assignment = Assignment(cs, n)
        self._cursor = 0

    # Layouter surface ------------------------------------------------------
    def assign_region(self, name: str, fn: Callable[[Region], object]):
        region = Region(self, self._cursor)
        out = fn(region)
        self._cursor += region.rows_used
        return out

    def constrain_instance(self, cell: Cell, inst: ColumnRef, row: int):
        self.cs.copy((cell.column, cell.row), (inst, row))

    def set_instance(self, inst: ColumnRef, row: int, value: int):
        self.assignment.set(inst, row, value)

    def synthesize(self, circuit, config):
        circuit.synthesize(config, self)
        return self.assignment
