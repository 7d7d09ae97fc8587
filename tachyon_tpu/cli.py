"""Groth16 prover CLI — analog of the reference's circom prover
(reference: vendors/circom/prover_main.cc: flags zkey/wtns/proof/public,
--curve, --no_zk, --verify, -n/--num_runs, --trace_path; snarkjs-compatible
proof.json / public.json output, circomlib/json/groth16_proof.h).

The reference rolls its own FlagParser (base/flag/flag_parser.cc); argparse
is the idiomatic Python equivalent and keeps the same flag surface.

Usage:
    python -m tachyon_tpu.cli prove multiplier_3.zkey witness.wtns \
        --proof proof.json --public public.json --verify --num-runs 3
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _json_g1(pt) -> list:
    if pt is None:
        return ["0", "1", "0"]
    return [str(pt[0]), str(pt[1]), "1"]


def _json_g2(pt) -> list:
    if pt is None:
        return [["0", "0"], ["1", "0"], ["0", "0"]]
    (x0, x1), (y0, y1) = pt
    return [[str(x0), str(x1)], [str(y0), str(y1)], ["1", "0"]]


def _resolve_platform(choice: str) -> str | None:
    """'auto' probes the accelerator in a killable subprocess (the axon
    tunnel HANGS rather than erroring while wedged) and falls back to cpu;
    explicit choices pin jax_platforms directly."""
    if choice != "auto":
        return choice
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=180,
        )
        if r.returncode == 0 and b"ok" in r.stdout:
            return None  # default platform works
    except subprocess.TimeoutExpired:
        pass
    print("# accelerator unavailable; using cpu", file=sys.stderr)
    return "cpu"


def cmd_prove(args) -> int:
    import jax

    platform = _resolve_platform(args.platform)
    if platform:
        jax.config.update("jax_platforms", platform)
    from tachyon_tpu.base.cache import machine_fingerprint

    if (platform or "tpu") == "cpu":
        # own tag: the CLI process runs WITHOUT the test/driver XLA flag
        # env (no --xla_force_host_platform_device_count), and entries
        # written under one flag env can crash deserialization in another
        args.jax_cache = (args.jax_cache.rstrip("/")
                          + "_cpu_cli_" + machine_fingerprint())
    jax.config.update("jax_compilation_cache_dir", args.jax_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from tachyon_tpu.base import profiler
    from tachyon_tpu.fields.spec import limbs_to_int
    from tachyon_tpu.io.zkey import parse_wtns, parse_zkey
    from tachyon_tpu.zk.groth16.prover import CircomGroth16Prover

    prof = None
    if args.trace_path:
        prof = profiler.Profiler(args.trace_path)
        prof.start()

    t0 = time.perf_counter()
    zkey = parse_zkey(args.zkey)
    print(f"parse zkey: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    t0 = time.perf_counter()
    _, wtns = parse_wtns(args.wtns)
    print(f"parse wtns: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    prover = CircomGroth16Prover(zkey)
    proof = None
    for i in range(args.num_runs):
        t0 = time.perf_counter()
        with profiler.trace_event(profiler.CATEGORY_PROOF_GENERATION,
                                  "groth16_prove"):
            # prove() samples fresh CSPRNG r/s unless deterministic
            proof = prover.prove(wtns, deterministic=args.no_zk)
        print(f"prove[{i}]: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    pub = [limbs_to_int(wtns[:, i + 1]) for i in range(zkey.num_public)]
    if args.verify:
        t0 = time.perf_counter()
        with profiler.trace_event(profiler.CATEGORY_PROOF_VERIFICATION,
                                  "groth16_verify"):
            ok = prover.verify(proof, pub)
        print(f"verify: {time.perf_counter() - t0:.3f}s -> {ok}",
              file=sys.stderr)
        if not ok:
            print("PROOF VERIFICATION FAILED", file=sys.stderr)
            return 1

    proof_json = {
        "pi_a": _json_g1(proof.a),
        "pi_b": _json_g2(proof.b),
        "pi_c": _json_g1(proof.c),
        "protocol": "groth16",
        "curve": "bn128",
    }
    with open(args.proof, "w") as f:
        json.dump(proof_json, f, indent=1)
    with open(args.public, "w") as f:
        json.dump([str(v) for v in pub], f, indent=1)
    if prof:
        prof.stop()
        print(f"trace written to {args.trace_path}", file=sys.stderr)
    print(f"proof -> {args.proof}, public -> {args.public}", file=sys.stderr)
    return 0


def cmd_prove_halo2(args) -> int:
    """halo2 bit-compatible prove over a JSON circuit (host-exact path;
    self-verifies before writing)."""
    from tachyon_tpu.c.bridge import halo2_prove

    with open(args.circuit) as f:
        hexproof = halo2_prove(f.read())
    with open(args.proof, "w") as f:
        f.write(hexproof + "\n")
    print(f"proof: {args.proof} ({len(hexproof) // 2} bytes, verified)")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tachyon_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prove", help="create a Groth16 proof from zkey+wtns")
    pp.add_argument("zkey", help="path to .zkey (circom/snarkjs)")
    pp.add_argument("wtns", help="path to .wtns witness")
    pp.add_argument("--proof", default="proof.json")
    pp.add_argument("--public", default="public.json")
    pp.add_argument("--curve", default="bn254", choices=["bn254"],
                    help="(bls12_381 arrives with its G2/pairing in round 2)")
    pp.add_argument("--no-zk", action="store_true",
                    help="deterministic proof (r = s = 0), matches the "
                         "reference's --no_zk")
    pp.add_argument("--verify", action="store_true",
                    help="verify after proving (recommended)")
    pp.add_argument("-n", "--num-runs", type=int, default=1)
    pp.add_argument("--trace-path", default=None,
                    help="write a jax profiler trace to this directory")
    pp.add_argument("--jax-cache", default="/root/repo/.jax_cache")
    pp.add_argument("--platform", default="auto",
                    help="jax platform name (cpu/tpu/...); 'auto' probes "
                         "the default platform and falls back to cpu when "
                         "the accelerator is unreachable")
    pp.set_defaults(fn=cmd_prove)

    hp = sub.add_parser(
        "prove-halo2",
        help="create a halo2 bit-compatible proof from a JSON circuit "
             "description (schema: tachyon_tpu/c/api.h "
             "tachyon_tpu_halo2_bn254_prove)")
    hp.add_argument("circuit", help="path to the circuit JSON")
    hp.add_argument("--proof", default="halo2_proof.hex",
                    help="output file for the hex-encoded proof bytes")
    hp.set_defaults(fn=cmd_prove_halo2)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
