"""Pinned VK stringifier golden tests.

The expected strings are the reference's own golden vectors for the halo2
SimpleCircuit (reference: zk/plonk/examples/simple_circuit_test_data.h
kPinnedVerifyingKey, itself pinned against upstream halo2), reconstructed
here for the post-selector-compression constraint system.
"""
from tachyon_tpu.fields import presets
from tachyon_tpu.zk.plonk import expressions as ex
from tachyon_tpu.zk.plonk import stringifier
from tachyon_tpu.zk.plonk.constraint_system import ConstraintSystem


# the cs: field of simple_circuit_test_data.h kPinnedVerifyingKey
GOLDEN_SIMPLE_CS = (
    "PinnedConstraintSystem { "
    "num_fixed_columns: 2, "
    "num_advice_columns: 2, "
    "num_instance_columns: 1, "
    "num_selectors: 1, "
    "gates: [Product("
    "Fixed { query_index: 1, column_index: 1, rotation: Rotation(0) }, "
    "Sum("
    "Product("
    "Advice { query_index: 0, column_index: 0, rotation: Rotation(0) }, "
    "Advice { query_index: 1, column_index: 1, rotation: Rotation(0) }"
    "), "
    "Negated(Advice { query_index: 2, column_index: 0, rotation: Rotation(1) })"
    ")"
    ")], "
    "advice_queries: ["
    "(Column { index: 0, column_type: Advice }, Rotation(0)), "
    "(Column { index: 1, column_type: Advice }, Rotation(0)), "
    "(Column { index: 0, column_type: Advice }, Rotation(1))"
    "], "
    "instance_queries: [(Column { index: 0, column_type: Instance }, Rotation(0))], "
    "fixed_queries: ["
    "(Column { index: 0, column_type: Fixed }, Rotation(0)), "
    "(Column { index: 1, column_type: Fixed }, Rotation(0))"
    "], "
    "permutation: Argument { columns: ["
    "Column { index: 0, column_type: Instance }, "
    "Column { index: 0, column_type: Fixed }, "
    "Column { index: 0, column_type: Advice }, "
    "Column { index: 1, column_type: Advice }"
    "] }, "
    "lookups: [], "
    "constants: [Column { index: 0, column_type: Fixed }], "
    "minimum_degree: None "
    "}"
)


def _simple_circuit_cs() -> ConstraintSystem:
    """the halo2 SimpleCircuit constraint system AFTER selector compression
    (the state the pinned VK sees): fixed0 = constants column, fixed1 =
    compressed selector column; configure order mirrors
    examples/simple_circuit.h FieldConfig::Configure."""
    cs = ConstraintSystem()
    inst = cs.instance_column()
    const_col = cs.fixed_column()
    a0 = cs.advice_column()
    a1 = cs.advice_column()
    sel = cs.fixed_column()  # the compressed selector combination column
    cs.enable_equality(inst)
    cs.enable_constant(const_col)
    cs.enable_equality(a0)
    cs.enable_equality(a1)
    cs.create_gate("mul", [
        ex.Product(
            ex.Fixed(sel.index),
            ex.Sum(
                ex.Product(ex.Advice(a0.index), ex.Advice(a1.index)),
                ex.Negated(ex.Advice(a0.index, 1)),
            ),
        )
    ])
    cs.num_selectors = 1
    return cs


def test_pinned_constraint_system_golden():
    cs = _simple_circuit_cs()
    assert stringifier.pinned_constraint_system_str(cs) == GOLDEN_SIMPLE_CS


def test_pinned_vk_header_golden():
    """moduli + domain: matches simple_circuit_test_data.h
    kPinnedVerifyingKey's opening fields (k=4, extended_k=5, halo2 omega)."""
    cs = _simple_circuit_cs()
    from tachyon_tpu.math.ntt import Radix2Domain
    from tachyon_tpu.math import curves

    dom = Radix2Domain(curves.bn254_fr(), 16)
    s = stringifier.pinned_vk_str(
        cs, 4, 5, dom.omega_int, [], [],
        base_modulus=presets.BN254_FQ.p, scalar_modulus=presets.BN254_FR.p,
    )
    assert s.startswith(
        "PinnedVerificationKey { "
        'base_modulus: "0x30644e72e131a029b85045b68181585d'
        '97816a916871ca8d3c208c16d87cfd47", '
        'scalar_modulus: "0x30644e72e131a029b85045b68181585d'
        '2833e84879b9709143e1f593f0000001", '
        "domain: PinnedEvaluationDomain { "
        "k: 4, "
        "extended_k: 5, "
        "omega: 0x21082ca216cbbf4e1c6e4f4594dd508c"
        "996dfbe1174efb98b11509c6e306460b "
        "}, "
    )
    assert s.endswith(
        "fixed_commitments: [], "
        "permutation: VerifyingKey { commitments: [] } }"
    )


def test_transcript_repr_hash_shape():
    # length-prefixed blake2b with the Halo2-Verify-Key personalization
    r = presets.BN254_FR.p
    v = stringifier.transcript_repr_from_str("x", r)
    assert 0 <= v < r
    assert v != stringifier.transcript_repr_from_str("y", r)
