"""PLONK constraint system (halo2-style columns/gates/copy constraints).

Analog of the reference's halo2 constraint system
(reference: tachyon/zk/plonk/constraint_system/constraint_system.h, columns,
gates, selectors; permutation registration permutation/cycle_store.h).
Simplifications this round: selectors are plain fixed columns (no selector
compression yet); a single permutation argument covers all equality-enabled
columns.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from tachyon_tpu.zk.plonk import expressions as ex


class ColumnRef(NamedTuple):
    kind: str  # "fixed" | "advice" | "instance"
    index: int


@dataclasses.dataclass
class Gate:
    name: str
    polys: list  # list of Expr that must vanish on all rows


@dataclasses.dataclass
class LookupArgument:
    """input_exprs[i] must appear (as a theta-compressed tuple) among the
    rows of table_exprs (reference: zk/lookup/argument.h)."""

    name: str
    input_exprs: list
    table_exprs: list


@dataclasses.dataclass
class ShuffleArgument:
    """input_exprs rows are a permutation of shuffle_exprs rows
    (reference: zk/shuffle/argument.h)."""

    name: str
    input_exprs: list
    shuffle_exprs: list


@dataclasses.dataclass
class ConstraintSystem:
    num_fixed: int = 0
    num_advice: int = 0
    num_instance: int = 0
    gates: list = dataclasses.field(default_factory=list)
    # permutation: columns participating in equality
    permutation_columns: list = dataclasses.field(default_factory=list)
    copies: list = dataclasses.field(default_factory=list)  # ((col, row), (col, row))
    lookups: list = dataclasses.field(default_factory=list)  # LookupArgument
    shuffles: list = dataclasses.field(default_factory=list)  # ShuffleArgument
    # "halo2" (permuted pairs, lookup/halo2/) or "log_derivative"
    # (m-poly grand sum, lookup/log_derivative_halo2/)
    lookup_type: str = "halo2"
    # ZK blinding rows (reference: zk/base/blinder.h + halo2 usable-rows
    # convention: rows [n-t-1, n) are the "last" row + t blind rows;
    # 0 = deterministic proofs)
    blinding_factors: int = 0

    def usable_rows(self, n: int) -> int:
        """index u of the 'last' row: active rows are [0, u), blind rows
        (u, n); u itself carries the grand-product closing constraint."""
        if self.blinding_factors == 0:
            return n
        return n - self.blinding_factors - 1

    def fixed_column(self) -> ColumnRef:
        self.num_fixed += 1
        return ColumnRef("fixed", self.num_fixed - 1)

    def advice_column(self) -> ColumnRef:
        self.num_advice += 1
        return ColumnRef("advice", self.num_advice - 1)

    def instance_column(self) -> ColumnRef:
        self.num_instance += 1
        return ColumnRef("instance", self.num_instance - 1)

    def enable_equality(self, col: ColumnRef):
        if col not in self.permutation_columns:
            self.permutation_columns.append(col)

    def create_gate(self, name: str, polys: list):
        self.gates.append(Gate(name, polys))

    def lookup(self, name: str, pairs: list):
        """pairs: list of (input_expr, table_expr)."""
        self.lookups.append(
            LookupArgument(name, [p[0] for p in pairs], [p[1] for p in pairs])
        )

    def shuffle(self, name: str, pairs: list):
        """pairs: list of (input_expr, shuffle_expr)."""
        self.shuffles.append(
            ShuffleArgument(name, [p[0] for p in pairs], [p[1] for p in pairs])
        )

    def copy(self, a: tuple, b: tuple):
        """a, b: (ColumnRef, row)"""
        self.copies.append((a, b))

    def query(self, col: ColumnRef, rotation: int = 0):
        if col.kind == "fixed":
            return ex.Fixed(col.index, rotation)
        if col.kind == "advice":
            return ex.Advice(col.index, rotation)
        return ex.Instance(col.index, rotation)

    def max_gate_degree(self) -> int:
        return max(
            (ex.degree(p) for g in self.gates for p in g.polys), default=1
        )

    def required_degree(self) -> int:
        """max identity degree across gates/permutation/lookups/shuffles
        (reference: constraint_system.h ComputeDegree)."""
        deg = max(self.max_gate_degree(), 2)
        if self.permutation_columns:
            deg = max(deg, len(self.permutation_columns) + 2)
        for lk in self.lookups:
            din = max((ex.degree(e) for e in lk.input_exprs), default=1)
            dtb = max((ex.degree(e) for e in lk.table_exprs), default=1)
            if self.lookup_type == "halo2":
                # z(wx)(a'+beta)(s'+gamma) vs z(x)(A+beta)(S+gamma)
                deg = max(deg, 3, 1 + din + dtb)
            else:
                # (phi(wx)-phi(x))(A+beta)(S+beta) - ((S+beta) - m(A+beta))
                deg = max(deg, 1 + din + dtb, 2)
        for sh in self.shuffles:
            din = max((ex.degree(e) for e in sh.input_exprs), default=1)
            dsh = max((ex.degree(e) for e in sh.shuffle_exprs), default=1)
            deg = max(deg, 1 + max(din, dsh, 1))
        if self.blinding_factors > 0:
            deg += 1  # every transition identity gains the l_active factor
        return deg


class CycleStore:
    """union-find over (perm column position, row) building the sigma
    permutation (reference: zk/plonk/permutation/cycle_store.h)."""

    def __init__(self, num_cols: int, n: int):
        self.num_cols = num_cols
        self.n = n
        self.parent = np.arange(num_cols * n, dtype=np.int64)

    def _find(self, i):
        while self.parent[i] != i:
            self.parent[i] = self.parent[self.parent[i]]
            i = self.parent[i]
        return i

    def union(self, a, b):
        ra, rb = self._find(a), self._find(b)
        if ra != rb:
            self.parent[ra] = rb

    def to_mapping(self) -> np.ndarray:
        """sigma: position -> next position in its cycle (num_cols*n,)."""
        groups: dict[int, list[int]] = {}
        total = self.num_cols * self.n
        for i in range(total):
            groups.setdefault(self._find(i), []).append(i)
        mapping = np.arange(total, dtype=np.int64)
        for members in groups.values():
            for k, m in enumerate(members):
                mapping[m] = members[(k + 1) % len(members)]
        return mapping


def build_permutation_mapping(cs: ConstraintSystem, n: int) -> np.ndarray:
    """(num_perm_cols, n) mapping array; entry = col'*n + row'."""
    cols = cs.permutation_columns
    col_idx = {c: i for i, c in enumerate(cols)}
    store = CycleStore(len(cols), n)
    for (ca, ra), (cb, rb) in cs.copies:
        assert ca in col_idx and cb in col_idx, "enable_equality first"
        store.union(col_idx[ca] * n + ra, col_idx[cb] * n + rb)
    return store.to_mapping().reshape(len(cols), n)
