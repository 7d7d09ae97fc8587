"""Layouter/SimpleFloorPlanner -> keygen -> prove -> verify end-to-end
(reference pattern: zk/plonk/examples/simple_circuit with the halo2
region-based synthesis API)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem
from tachyon_tpu.zk.plonk.layout import SimpleFloorPlanner
from tachyon_tpu.zk.plonk.prover import PlonkProver, PlonkVerifier, keygen

N = 8


class MulCircuit:
    """c = a * b with c exposed as a public input."""

    def __init__(self, a: int, b: int):
        self.a = a
        self.b = b

    def configure(self, cs: ConstraintSystem):
        qm = cs.fixed_column()
        a = cs.advice_column()
        b = cs.advice_column()
        c = cs.advice_column()
        inst = cs.instance_column()
        for col in (a, b, c, inst):
            cs.enable_equality(col)
        cs.create_gate("mul", [
            ex.Product(
                ex.Fixed(qm.index),
                ex.Sum(
                    ex.Product(ex.Advice(a.index), ex.Advice(b.index)),
                    ex.Negated(ex.Advice(c.index)),
                ),
            )
        ])
        return dict(qm=qm, a=a, b=b, c=c, inst=inst)

    def synthesize(self, cfg, layouter: SimpleFloorPlanner):
        a, b = self.a, self.b

        def region_fn(region):
            region.assign_fixed(cfg["qm"], 0, 1)
            region.assign_advice(cfg["a"], 0, a)
            region.assign_advice(cfg["b"], 0, b)
            return region.assign_advice(cfg["c"], 0, a * b)

        c_cell = layouter.assign_region("mul", region_fn)
        layouter.set_instance(cfg["inst"], 0, a * b)
        layouter.constrain_instance(c_cell, cfg["inst"], 0)


def test_layout_end_to_end():
    params = kzg.unsafe_setup(N, tau=0x54321)
    circuit = MulCircuit(6, 7)
    cs = ConstraintSystem()
    cfg = circuit.configure(cs)
    planner = SimpleFloorPlanner(cs, N)
    asg = planner.synthesize(circuit, cfg)

    pk = keygen(params, cs, N, asg.fixed)
    proof = PlonkProver(params, pk).prove(asg.advice, asg.instance)
    assert PlonkVerifier(params, pk).verify(proof, asg.instance)
    # a different public input must fail
    bad_inst = [np.array([43] + [0] * (N - 1), dtype=object)]
    assert not PlonkVerifier(params, pk).verify(proof, bad_inst)


def test_regions_stack_rows():
    cs = ConstraintSystem()
    a = cs.advice_column()
    planner = SimpleFloorPlanner(cs, N)

    def r1(region):
        region.assign_advice(a, 0, 11)
        region.assign_advice(a, 1, 22)

    def r2(region):
        return region.assign_advice(a, 0, 33)

    planner.assign_region("r1", r1)
    cell = planner.assign_region("r2", r2)
    assert cell.row == 2  # placed after r1's two rows
    assert int(planner.assignment.advice[0][2]) == 33


def test_v1_planner_packs_disjoint_columns():
    from tachyon_tpu.zk.plonk.layout import V1FloorPlanner

    cs = ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column()

    class TwoColCircuit:
        def synthesize(self, config, layouter):
            # two tall regions on disjoint columns: V1 overlaps them at
            # row 0; the Simple planner would stack them (4 rows)
            layouter.assign_region(
                "ra", lambda r: [r.assign_advice(a, i, 10 + i)
                                 for i in range(2)])
            layouter.assign_region(
                "rb", lambda r: [r.assign_advice(b, i, 20 + i)
                                 for i in range(2)])

    planner = V1FloorPlanner(cs, N)
    asg = planner.synthesize(TwoColCircuit(), None)
    assert int(asg.advice[0][0]) == 10 and int(asg.advice[0][1]) == 11
    assert int(asg.advice[1][0]) == 20 and int(asg.advice[1][1]) == 21


def test_v1_planner_same_column_no_overlap():
    from tachyon_tpu.zk.plonk.layout import V1FloorPlanner

    cs = ConstraintSystem()
    a = cs.advice_column()

    class OneColCircuit:
        def synthesize(self, config, layouter):
            layouter.assign_region(
                "big", lambda r: [r.assign_advice(a, i, 100 + i)
                                  for i in range(3)])
            layouter.assign_region(
                "small", lambda r: r.assign_advice(a, 0, 55))

    planner = V1FloorPlanner(cs, N)
    asg = planner.synthesize(OneColCircuit(), None)
    vals = [int(v) for v in asg.advice[0][:4]]
    assert sorted(vals) == [55, 100, 101, 102]  # no clobbering
