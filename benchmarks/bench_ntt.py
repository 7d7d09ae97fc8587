"""NTT/FFT benchmarks (analog of reference benchmark/fft + fft_batch:
BN254 Fr FFT/IFFT 2^20..2^23, BabyBear FFTBatch/CosetLDEBatch).
Baselines: BASELINE.md (i9-13900K rows, benchmark/fft/README.md:34,73;
benchmark/fft_batch/README.md:40,76)."""
import os

import numpy as np

from benchmarks.harness import report, setup_jax, time_fn

# reference i9-13900K seconds
BASE_FFT = {20: 0.01617, 21: 0.032785, 22: 0.066596, 23: 0.134626}
BASE_IFFT = {20: 0.037167, 21: 0.075981, 22: 0.154731, 23: 0.3174}


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ntt import Radix2Domain

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    n = 1 << log_n
    Fr = curves.bn254_fr()
    dom = Radix2Domain(Fr, n)
    rng = np.random.default_rng(7)
    vals = Fr.random((n,), rng)

    fft = jax.jit(dom.fft)
    c, best = time_fn(fft, vals)
    report(f"bn254_fft_2^{log_n}", best, BASE_FFT.get(log_n), c)

    ifft = jax.jit(dom.ifft)
    c, best = time_fn(ifft, vals)
    report(f"bn254_ifft_2^{log_n}", best, BASE_IFFT.get(log_n), c)


if __name__ == "__main__":
    main()
