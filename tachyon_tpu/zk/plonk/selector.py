"""Selector compression: pack disjoint boolean selectors into shared
fixed columns.

Analog of the reference's SelectorCompressor
(reference: tachyon/zk/plonk/constraint_system/selector_compressor.h,
selector_assignment.h; halo2's compress_selectors).  Selectors that are
never active on the same row share one fixed "combination" column C whose
value at a row is the 1-based position of the active selector (0 = none).
Each selector expression q_j is rewritten to the interpolation polynomial

    P_j(C) = prod_{i in {0..k}, i != pos_j} (C - i) / (pos_j - i)

which is 1 exactly when C = pos_j and 0 on every other value C takes.
Grouping is greedy with a max group size bound standing in for the
reference's gate-degree budget (documented simplification; the degree
increase per gate is the group size k).
"""
from __future__ import annotations

import numpy as np

from tachyon_tpu.zk.plonk import expressions as ex


def _rewrite(e, mapping):
    """replace Selector-placeholder Fixed refs via mapping: old fixed index
    -> expression."""
    if isinstance(e, ex.Fixed) and e.column in mapping:
        assert e.rotation == 0, "selector queries have rotation 0"
        return mapping[e.column]
    if isinstance(e, ex.Negated):
        return ex.Negated(_rewrite(e.expr, mapping))
    if isinstance(e, ex.Scaled):
        return ex.Scaled(_rewrite(e.expr, mapping), e.scale)
    if isinstance(e, ex.Sum):
        return ex.Sum(_rewrite(e.left, mapping), _rewrite(e.right, mapping))
    if isinstance(e, ex.Product):
        return ex.Product(_rewrite(e.left, mapping), _rewrite(e.right, mapping))
    return e


def compress_selectors(
    cs,
    selector_cols: list[int],
    fixed_values: list,
    p: int,
    max_group: int = 3,
):
    """Compress the given fixed columns (0/1 selectors) in place.

    cs: ConstraintSystem whose gates reference the selectors as Fixed
    columns; selector_cols: indices of fixed columns that are boolean
    selectors; fixed_values: per fixed column numpy object arrays.
    Returns the new fixed_values list (selector columns replaced by fewer
    combination columns); cs.gates/lookups/shuffles are rewritten.
    """
    acts = {
        c: np.asarray(fixed_values[c], dtype=object) != 0
        for c in selector_cols
    }
    # greedy disjoint grouping
    groups: list[list[int]] = []
    for c in selector_cols:
        placed = False
        for g in groups:
            if len(g) >= max_group:
                continue
            if not any((acts[c] & acts[o]).any() for o in g):
                g.append(c)
                placed = True
                break
        if not placed:
            groups.append([c])
    # build combination columns + rewrite map
    n = len(fixed_values[selector_cols[0]]) if selector_cols else 0
    new_cols: list[np.ndarray] = []
    mapping: dict[int, object] = {}
    for g in groups:
        col = np.zeros(n, dtype=object)
        k = len(g)
        col_index = cs.num_fixed + len(new_cols)
        for pos, c in enumerate(g, start=1):
            col[acts[c]] = pos
        new_cols.append(col)
        cref = ex.Fixed(col_index)
        for pos, c in enumerate(g, start=1):
            # interpolation over the value set {0..k} hitting 1 at pos
            expr = None
            denom = 1
            for i in range(k + 1):
                if i == pos:
                    continue
                term = ex.Sum(cref, ex.Constant(-i % p))
                expr = term if expr is None else ex.Product(expr, term)
                denom = denom * (pos - i) % p
            scale = pow(denom, p - 2, p)
            mapping[c] = ex.Scaled(expr, scale)
    # rewrite all registered expressions
    for gate in cs.gates:
        gate.polys = [_rewrite(e, mapping) for e in gate.polys]
    for lk in cs.lookups:
        lk.input_exprs = [_rewrite(e, mapping) for e in lk.input_exprs]
        lk.table_exprs = [_rewrite(e, mapping) for e in lk.table_exprs]
    for sh in cs.shuffles:
        sh.input_exprs = [_rewrite(e, mapping) for e in sh.input_exprs]
        sh.shuffle_exprs = [_rewrite(e, mapping) for e in sh.shuffle_exprs]

    # drop the original selector columns, append combinations; reindex
    keep = [i for i in range(cs.num_fixed) if i not in set(selector_cols)]
    reindex = {old: new for new, old in enumerate(keep)}
    for i, col in enumerate(new_cols):
        reindex[cs.num_fixed + i] = len(keep) + i

    def reindex_expr(e):
        if isinstance(e, ex.Fixed):
            return ex.Fixed(reindex[e.column], e.rotation)
        if isinstance(e, ex.Negated):
            return ex.Negated(reindex_expr(e.expr))
        if isinstance(e, ex.Scaled):
            return ex.Scaled(reindex_expr(e.expr), e.scale)
        if isinstance(e, ex.Sum):
            return ex.Sum(reindex_expr(e.left), reindex_expr(e.right))
        if isinstance(e, ex.Product):
            return ex.Product(reindex_expr(e.left), reindex_expr(e.right))
        return e

    for gate in cs.gates:
        gate.polys = [reindex_expr(e) for e in gate.polys]
    for lk in cs.lookups:
        lk.input_exprs = [reindex_expr(e) for e in lk.input_exprs]
        lk.table_exprs = [reindex_expr(e) for e in lk.table_exprs]
    for sh in cs.shuffles:
        sh.input_exprs = [reindex_expr(e) for e in sh.input_exprs]
        sh.shuffle_exprs = [reindex_expr(e) for e in sh.shuffle_exprs]
    # permutation columns that were fixed get reindexed too
    from tachyon_tpu.zk.plonk.constraint_system import ColumnRef

    cs.permutation_columns = [
        ColumnRef("fixed", reindex[c.index]) if c.kind == "fixed" else c
        for c in cs.permutation_columns
    ]
    cs.copies = [
        tuple(
            ((ColumnRef("fixed", reindex[col.index]), row)
             if col.kind == "fixed" else (col, row))
            for (col, row) in pair
        )
        for pair in cs.copies
    ]

    new_fixed = [fixed_values[i] for i in keep] + new_cols
    cs.num_fixed = len(new_fixed)
    return new_fixed
