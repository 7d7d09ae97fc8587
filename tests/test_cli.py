"""CLI end-to-end: prove multiplier_3 via `python -m tachyon_tpu.cli`,
verify, check snarkjs-format proof.json (reference:
vendors/circom/prover_main.cc flag surface + circomlib/json output)."""
import json
import os
import subprocess
import sys

import pytest

# a cold CLI subprocess recompiles the whole Groth16 pipeline (~17 min on
# the 1-core CPU fallback); the TPU path runs it in a couple of minutes
pytestmark = pytest.mark.slow

ZKEY = "/root/reference/vendors/circom/examples/multiplier_3.zkey"
WTNS = "/root/reference/vendors/circom/circomlib/wtns/multiplier_3.wtns"


def test_cli_prove(tmp_path):
    proof_p = tmp_path / "proof.json"
    public_p = tmp_path / "public.json"
    res = subprocess.run(
        [sys.executable, "-m", "tachyon_tpu.cli", "prove", ZKEY, WTNS,
         "--proof", str(proof_p), "--public", str(public_p),
         "--no-zk", "--verify"]
        + (["--platform", "cpu"] if os.environ.get("TACHYON_TEST_CPU")
           else []),
        capture_output=True, text=True, timeout=3000, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    proof = json.loads(proof_p.read_text())
    assert proof["protocol"] == "groth16"
    assert len(proof["pi_a"]) == 3 and proof["pi_a"][2] == "1"
    assert len(proof["pi_b"]) == 3 and len(proof["pi_b"][0]) == 2
    pub = json.loads(public_p.read_text())
    assert len(pub) >= 1 and all(v.isdigit() for v in pub)
