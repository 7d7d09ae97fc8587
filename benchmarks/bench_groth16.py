"""End-to-end native Groth16 prove benchmark at sha256-512-class scale
(reference: vendors/circom/benchmark/README.md:36-55 — sha256-512 proves in
0.0394s on the i9; that circuit is ~2^15 R1CS constraints, so the synthetic
circuit here defaults to the same size.  The zkey itself isn't committed in
the reference, hence synthetic R1CS of equal size + the full device prove
path: QAP witness map (iFFT/coset-FFT) + 4 G1 MSMs + 1 G2 MSM)."""
import os
import time

from benchmarks.harness import report, setup_jax

BASELINE_SHA256_512 = 0.039411  # i9, circom sha256-512 (similar size)


def build_r1cs(k_log: int):
    from tachyon_tpu.zk.groth16.r1cs import R1CS

    n_constraints = (1 << k_log) - 2
    r1cs = R1CS(num_public=1)
    xs = [r1cs.new_private() for _ in range(n_constraints + 1)]
    # x_{i+1} = x_i * x_i (squaring chain), last value exposed via public
    for i in range(n_constraints):
        r1cs.constrain({xs[i]: 1}, {xs[i]: 1}, {xs[i + 1]: 1})
    # public = last
    r1cs.constrain({xs[-1]: 1}, {0: 1}, {1: 1})
    return r1cs, xs


def main():
    setup_jax()
    from tachyon_tpu.zk.groth16.r1cs import Groth16, setup

    k_log = int(os.environ.get("BENCH_GROTH16_LOG_N", "14"))
    r1cs, xs = build_r1cs(k_log)
    t0 = time.time()
    pp = setup(r1cs, "bn254", rng=iter([3, 5, 7, 11, 13]).__next__)
    print(f"# groth16 setup ({1 << k_log} constraints): "
          f"{time.time() - t0:.1f}s", flush=True)
    g16 = Groth16(pp)

    p = g16.f.R  # scalar field order (pairing module of the curve family)
    vals = [2]
    for _ in range(len(xs) - 1):
        vals.append(vals[-1] * vals[-1] % p)
    public = [vals[-1]]
    private = vals

    t0 = time.time()
    proof = g16.prove(public, private, r=1234, s=5678)
    compile_s = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        proof = g16.prove(public, private, r=1234, s=5678)
        times.append(time.time() - t0)
    ok = g16.verify(proof, public)
    report(
        f"groth16_prove_2^{k_log}" + ("" if ok else "_UNVERIFIED"),
        min(times), BASELINE_SHA256_512, compile_s,
    )


if __name__ == "__main__":
    main()
