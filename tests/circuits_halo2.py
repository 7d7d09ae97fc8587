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


class Fibonacci1Circuit:
    """f(0)=f(1)=1, 8 add rows, out = f(9) exposed at instance row 2
    (reference: fibonacci/fibonacci1_circuit.h)."""

    def __init__(self, planner=SimpleFloorPlanner):
        self._planner_cls = planner

    def floor_planner(self, cs, n):
        return self._planner_cls(cs, n)

    @staticmethod
    def configure(cs):
        advice = [cs.advice_column() for _ in range(3)]
        sel = cs.create_simple_selector()
        instance = cs.instance_column()
        for col in advice:
            cs.enable_equality(col)
        cs.enable_equality(instance)
        s = cs.query_selector(sel)
        a = cs.query(advice[0], 0)
        b = cs.query(advice[1], 0)
        c = cs.query(advice[2], 0)
        cs.create_gate("add", [
            ex.Product(s, ex.Sum(ex.Sum(a, b), ex.Negated(c)))
        ])
        return {"advice": advice, "selector": sel, "instance": instance}

    def synthesize(self, config, layouter):
        adv, sel, inst = config["advice"], config["selector"], config["instance"]

        state = {}

        def first_row(region):
            region.enable_selector(sel, 0)
            a_cell = region.assign_advice_from_instance(inst, 0, adv[0], 0)
            b_cell = region.assign_advice_from_instance(inst, 1, adv[1], 0)
            a_val = layouter.assignment.get(inst, 0)
            b_val = layouter.assignment.get(inst, 1)
            c_val = (a_val + b_val) % FR
            c_cell = region.assign_advice(adv[2], 0, c_val)
            state["prev"] = ((b_cell, b_val), (c_cell, c_val))

        layouter.assign_region("first row", first_row)

        for _i in range(3, 10):
            (b_cell, b_val), (c_cell, c_val) = state["prev"]

            def next_row(region, b_cell=b_cell, b_val=b_val,
                         c_cell=c_cell, c_val=c_val):
                region.enable_selector(sel, 0)
                a_new = region.assign_advice(adv[0], 0, b_val)
                region.constrain_equal(a_new, b_cell)
                b_new = region.assign_advice(adv[1], 0, c_val)
                region.constrain_equal(b_new, c_cell)
                out_val = (b_val + c_val) % FR
                out_cell = region.assign_advice(adv[2], 0, out_val)
                state["out"] = (out_cell, out_val)

            layouter.assign_region("next row", next_row)
            state["prev"] = (state["prev"][1], state["out"])

        layouter.constrain_instance(state["prev"][1][0], inst, 2)

    def instance_columns(self):
        f = [1, 1]
        for _ in range(8):
            f.append(f[-2] + f[-1])
        return [[1, 1, f[9]]]


class Fibonacci2Circuit:
    """single-column fibonacci with Rotation(1)/Rotation(2) gate
    (reference: fibonacci/fibonacci2_circuit.h)."""

    def __init__(self, planner=SimpleFloorPlanner):
        self._planner_cls = planner

    def floor_planner(self, cs, n):
        return self._planner_cls(cs, n)

    @staticmethod
    def configure(cs):
        advice = cs.advice_column()
        instance = cs.instance_column()
        sel = cs.create_simple_selector()
        cs.enable_equality(advice)
        cs.enable_equality(instance)
        s = cs.query_selector(sel)
        a = cs.query(advice, 0)
        b = cs.query(advice, 1)
        c = cs.query(advice, 2)
        cs.create_gate("add", [
            ex.Product(s, ex.Sum(ex.Sum(a, b), ex.Negated(c)))
        ])
        return {"advice": advice, "selector": sel, "instance": instance}

    def synthesize(self, config, layouter):
        adv, sel, inst = config["advice"], config["selector"], config["instance"]
        n_rows = 10
        out = {}

        def entire(region):
            region.enable_selector(sel, 0)
            region.enable_selector(sel, 1)
            a_cell = region.assign_advice_from_instance(inst, 0, adv, 0)
            b_cell = region.assign_advice_from_instance(inst, 1, adv, 1)
            a_val = layouter.assignment.get(inst, 0)
            b_val = layouter.assignment.get(inst, 1)
            for row in range(2, n_rows):
                if row < n_rows - 2:
                    region.enable_selector(sel, row)
                c_val = (a_val + b_val) % FR
                c_cell = region.assign_advice(adv, row, c_val)
                a_cell, a_val = b_cell, b_val
                b_cell, b_val = c_cell, c_val
            out["cell"] = b_cell

        layouter.assign_region("entire fibonacci table", entire)
        layouter.constrain_instance(out["cell"], inst, 2)

    def instance_columns(self):
        f = [1, 1]
        for _ in range(8):
            f.append(f[-2] + f[-1])
        return [[1, 1, f[9]]]


class Fibonacci3Circuit:
    """if a == b {c} else {a - b} with an is_zero chip
    (reference: fibonacci/fibonacci3_circuit.h + is_zero_chip.h)."""

    def __init__(self, a=10, b=12, c=15, planner=SimpleFloorPlanner):
        self.a, self.b, self.c = a, b, c
        self._planner_cls = planner

    def floor_planner(self, cs, n):
        return self._planner_cls(cs, n)

    @staticmethod
    def configure(cs):
        sel = cs.create_simple_selector()
        a = cs.advice_column()
        b = cs.advice_column()
        c = cs.advice_column()
        output = cs.advice_column()
        value_inv = cs.advice_column()
        # IsZeroChip::Configure (is_zero_chip.h:39-78)
        s = cs.query_selector(sel)
        a_q = cs.query(a, 0)
        b_q = cs.query(b, 0)
        value = ex.Sum(a_q, ex.Negated(b_q))
        inv_q = cs.query(value_inv, 0)
        is_zero = ex.Sum(ex.Constant(1),
                         ex.Negated(ex.Product(value, inv_q)))
        cs.create_gate("is_zero", [ex.Product(ex.Product(s, value), is_zero)])
        # main gate (fibonacci3_circuit.h:74-98)
        s2 = cs.query_selector(sel)
        a2 = cs.query(a, 0)
        b2 = cs.query(b, 0)
        c2 = cs.query(c, 0)
        out2 = cs.query(output, 0)
        cs.create_gate("f(a, b, c) = if a == b {c} else {a - b}", [
            ex.Product(s2, ex.Product(is_zero, ex.Sum(out2, ex.Negated(c2)))),
            ex.Product(
                ex.Product(s2, ex.Sum(ex.Constant(1), ex.Negated(is_zero))),
                ex.Sum(out2, ex.Negated(ex.Sum(a2, ex.Negated(b2))))),
        ])
        return {"selector": sel, "a": a, "b": b, "c": c,
                "output": output, "value_inv": value_inv}

    def synthesize(self, config, layouter):
        a, b, c = self.a % FR, self.b % FR, self.c % FR

        def fn(region):
            region.enable_selector(config["selector"], 0)
            region.assign_advice(config["a"], 0, a)
            region.assign_advice(config["b"], 0, b)
            region.assign_advice(config["c"], 0, c)
            diff = (a - b) % FR
            inv = pow(diff, FR - 2, FR) if diff else 0
            region.assign_advice(config["value_inv"], 0, inv)
            output = c if a == b else diff
            region.assign_advice(config["output"], 0, output)

        layouter.assign_region("f(a, b, c) = if a == b {c} else {a - b}", fn)

    def instance_columns(self):
        return []
