"""Python mirrors of the reference's halo2 example circuits
(reference: tachyon/zk/plonk/examples/simple_circuit.h — itself halo2's
simple-example.rs).  Used by tests/test_halo2_golden.py to drive the
bit-compatible pipeline in tachyon_tpu/zk/plonk/halo2.py.
"""
from __future__ import annotations

import dataclasses

from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.layout import SimpleFloorPlanner, V1FloorPlanner
from tachyon_tpu.zk.plonk.halo2 import FR


@dataclasses.dataclass
class FieldConfig:
    advice: list
    instance: object
    constant: object
    s_mul: ex.Selector


class SimpleCircuit:
    """c = constant * a^2 * b^2 via three mul gates
    (reference: simple_circuit.h:57-230)."""

    def __init__(self, constant=7, a=2, b=3, planner=SimpleFloorPlanner):
        self.constant = constant
        self.a = a
        self.b = b
        self._planner_cls = planner

    def floor_planner(self, cs, n):
        return self._planner_cls(cs, n)

    @staticmethod
    def configure(cs) -> FieldConfig:
        advice = [cs.advice_column(), cs.advice_column()]
        instance = cs.instance_column()
        constant = cs.fixed_column()
        # FieldChip::Configure (simple_circuit.h:63-113)
        cs.enable_equality(instance)
        cs.enable_constant(constant)
        for col in advice:
            cs.enable_equality(col)
        sel = cs.create_simple_selector()
        lhs = cs.query(advice[0], 0)
        rhs = cs.query(advice[1], 0)
        out = cs.query(advice[0], 1)
        s_mul = cs.query_selector(sel)
        cs.create_gate("mul", [
            ex.Product(s_mul, ex.Sum(ex.Product(lhs, rhs), ex.Negated(out)))
        ])
        return FieldConfig(advice=advice, instance=instance,
                           constant=constant, s_mul=sel)

    # chip ops --------------------------------------------------------------
    def _load_private(self, layouter, config, value):
        def fn(region):
            return region.assign_advice(config.advice[0], 0, value)
        cell = layouter.assign_region("load private", fn)
        return cell, value

    def _load_constant(self, layouter, config, value):
        def fn(region):
            return region.assign_advice_from_constant(
                value, config.advice[0], 0)
        cell = layouter.assign_region("load constant", fn)
        return cell, value

    def _mul(self, layouter, config, a, b):
        (a_cell, a_val), (b_cell, b_val) = a, b
        out_val = a_val * b_val % FR

        def fn(region):
            region.enable_selector(config.s_mul, 0)
            lhs = region.assign_advice(config.advice[0], 0, a_val)
            region.constrain_equal(lhs, a_cell)
            rhs = region.assign_advice(config.advice[1], 0, b_val)
            region.constrain_equal(rhs, b_cell)
            return region.assign_advice(config.advice[0], 1, out_val)

        cell = layouter.assign_region("mul", fn)
        return cell, out_val

    def synthesize(self, config, layouter):
        a = self._load_private(layouter, config, self.a)
        b = self._load_private(layouter, config, self.b)
        const = self._load_constant(layouter, config, self.constant)
        ab = self._mul(layouter, config, a, b)
        absq = self._mul(layouter, config, ab, ab)
        c = self._mul(layouter, config, const, absq)
        layouter.constrain_instance(c[0], config.instance, 0)

    def instance_columns(self):
        c = self.constant * self.a ** 2 * self.b ** 2 % FR
        return [[c]]


class SimpleLookupCircuit:
    """2^k advice rows each constrained into a 3-bit lookup table
    (reference: simple_lookup_circuit.h; kBits=3 per
    simple_lookup_circuit_test.cc:14, circuit k=4, domain n=32)."""

    BITS = 3

    def __init__(self, k=4, planner=SimpleFloorPlanner):
        self.k = k
        self._planner_cls = planner

    def floor_planner(self, cs, n):
        return self._planner_cls(cs, n)

    @staticmethod
    def configure(cs):
        sel = cs.create_complex_selector()
        table = cs.fixed_column()  # CreateLookupTableColumn
        advice = cs.advice_column()
        selector = cs.query_selector(sel)
        not_selector = ex.Sum(ex.Constant(1), ex.Negated(selector))
        adv = cs.query(advice, 0)
        table_expr = cs.query(table, 0)
        cs.lookup("lookup", [(
            ex.Sum(ex.Product(selector, adv), not_selector), table_expr)])
        return {"selector": sel, "table": table, "advice": advice}

    def synthesize(self, config, layouter):
        def load_table(table):
            for row in range(1 << self.BITS):
                table.assign_cell(config["table"], row, row + 1)
        layouter.assign_lookup_table(f"{self.BITS}-bit table", load_table)

        modulus = 1 << self.BITS

        def fn(region):
            for offset in range(1 << self.k):
                region.enable_selector(config["selector"], offset)
                region.assign_advice(config["advice"], offset,
                                     offset % modulus + 1)
        layouter.assign_region("assign values", fn)

    def instance_columns(self):
        return []
