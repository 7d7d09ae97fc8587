"""Pinned TwoAdicFRI transcript fixture.

The reference pins its PCS against p3_fri outputs on a seeded RNG
(reference: vendors/sp1/src/two_adic_fri_pcs.rs:26-105); no Rust toolchain
exists in this image, so the pin is a committed fixture of OUR transcript
artifacts on a fixed seed — any drift in the challenger schedule, fold
order, merkle layout, PoW grind, or serialization changes these bytes and
fails this test.  Regenerate deliberately with
TACHYON_REGEN_FIXTURES=1 python -m pytest tests/test_fri_pinned.py -q
(and justify the change in the commit message)."""
import json
import os

import numpy as np
import pytest

from tachyon_tpu.crypto import poseidon2
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
from tachyon_tpu.fields import presets, extensions
from tachyon_tpu.math.field import PrimeField

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "fri_babybear_pinned.json")


def _nested_ints(o, ints):
    if isinstance(o, (list, tuple)):
        return [_nested_ints(v, ints) for v in o]
    return ints(o)


def _artifacts():
    F = PrimeField(presets.BABY_BEAR)
    pcs = TwoAdicFRIPCS(
        F, extensions.baby_bear4(), poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=1, num_queries=3, proof_of_work_bits=2),
    )
    rng = np.random.default_rng(20260819)
    shapes = [[(32, 3), (16, 2)], [(8, 4)]]
    datas = []
    for round_shapes in shapes:
        mats = []
        for (n, c) in round_shapes:
            vals = np.array(
                [[int(rng.integers(0, F.p)) for _ in range(c)]
                 for _ in range(n)], dtype=object)
            mats.append(F.encode(vals))
        datas.append(pcs.commit(mats))

    ch = DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=8)
    for d in datas:
        root = np.asarray(d.root())
        for i in range(root.shape[1]):
            ch.observe(int(F.decode(root[:, i])))
    zeta = ch.sample_ext(4)
    points = [[[zeta] for _ in d.ldes] for d in datas]
    opened, proof = pcs.create_opening_proof(datas, points, ch)

    def ints(arr):
        a = np.asarray(arr)
        L = F.spec.L
        if a.ndim >= 2 and a.shape[0] != L and a.shape[1] == L:
            # extension layout (D, L, ...): decode per degree component
            return [int(v) for d in range(a.shape[0])
                    for v in np.atleast_1d(F.decode(a[d])).reshape(-1)]
        return [int(v) for v in np.atleast_1d(F.decode(a)).reshape(-1)]

    return {
        "roots": [ints(d.root()) for d in datas],
        "commit_phase_commits": [ints(c) for c in
                                 proof.commit_phase_commits],
        "final_eval": ints(proof.final_eval),
        "pow_witness": int(proof.pow_witness),
        "opened": _nested_ints(opened, ints),
        "first_query_siblings": [
            ints(step.sibling_value)
            for step in proof.query_proofs[0].commit_phase_openings
        ],
    }


def test_fri_transcript_pinned():
    art = _artifacts()
    if os.environ.get("TACHYON_REGEN_FIXTURES"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(art, f, indent=1)
    assert os.path.exists(FIXTURE), (
        "fixture missing — run with TACHYON_REGEN_FIXTURES=1 once and "
        "commit tests/fixtures/fri_babybear_pinned.json")
    with open(FIXTURE) as f:
        want = json.load(f)
    assert art == want, "FRI transcript drifted from the pinned fixture"
