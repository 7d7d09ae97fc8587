"""Halo2 CreateProof benchmark with the device backend at k >= 14.

The reference doesn't publish an end-to-end halo2 prove time (its benches
are per-kernel), so this reports raw seconds (vs_baseline null) and is the
round-over-round tracking number for the device-side quotient build
(reference hot path: zk/plonk/halo2/prover.h CreateProof steps 4-8 —
commits = MSMs, TransformEvalsToPoly = batch iFFT, BuildExtendedCircuitColumn
= coset-FFT + gate eval over the extended domain, here
halo2_device.DeviceBackend.build_h_coeffs).

The circuit is SimpleCircuit (3 mul gates) at a large k: every prover cost
that matters — column iFFTs, KZG MSMs over 2^k points, the extended-coset
quotient build, the multiopen — scales with the domain size n = 2^k, not
with the number of assigned rows, so a sparse circuit on a big domain is a
faithful kernel-load benchmark.
"""
import os
import sys
import time

from benchmarks.harness import report, setup_jax


def main():
    setup_jax()
    sys.path.insert(0, "/root/repo")
    from tests.circuits_halo2 import SimpleCircuit
    from tachyon_tpu.zk.plonk import halo2
    from tachyon_tpu.zk.plonk.halo2_device import DeviceBackend

    k = int(os.environ.get("BENCH_HALO2_K", "14"))
    t0 = time.time()
    circuit = SimpleCircuit()
    # device=True: fixed/permutation commitments + keygen IFFTs on device
    pk = halo2.keygen(circuit, k=k, device=True)
    print(f"# halo2 keygen k={k} (device): {time.time() - t0:.1f}s",
          flush=True)

    prover = halo2.Halo2Prover(pk, backend=DeviceBackend(pk))
    circuits, insts = [circuit], [circuit.instance_columns()]

    t0 = time.time()
    proof = prover.create_proof(circuits, insts)
    compile_s = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        proof = prover.create_proof(circuits, insts)
        times.append(time.time() - t0)
    ok = halo2.Halo2Verifier(pk).verify(proof.proof, insts)
    report(
        f"halo2_prove_k{k}_device" + ("" if ok else "_UNVERIFIED"),
        min(times), None, compile_s,
    )


if __name__ == "__main__":
    main()
