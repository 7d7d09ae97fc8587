"""Run every per-kernel benchmark sequentially (analog of the reference's
benchmark/ binaries; see each bench_* module for its baseline source).

    python -m benchmarks.run_all            # default sizes
    BENCH_LOG_N=20 python -m benchmarks.run_all
"""
from benchmarks import (
    bench_ec,
    bench_fri,
    bench_groth16,
    bench_halo2,
    bench_msm,
    bench_ntt,
    bench_poseidon2,
)


def main():
    for mod in (bench_msm, bench_ec, bench_ntt, bench_poseidon2, bench_fri,
                bench_groth16, bench_halo2):
        mod.main()
        if hasattr(mod, "main_prove"):
            mod.main_prove()


if __name__ == "__main__":
    main()
