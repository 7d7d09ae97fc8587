"""FRI/LDE-batch benchmarks (analog of reference benchmark/fri +
benchmark/fft_batch — BabyBear CosetLDEBatch is the STARK prover hot loop).
Baselines: benchmark/fft_batch/README.md:76 (2^25·? cols), benchmark/fri/
README.md:33; scaled variants keyed by (log_n, cols)."""
import os

import numpy as np

from benchmarks.harness import report, setup_jax, time_fn

# reference CosetLDEBatch seconds on i9 (rows = 2^k, 100 columns-ish table);
# only the (22, 100) and (25, 100) rows have published anchors.
BASE_LDE = {(22, 100): 2.805, (25, 100): 25.67}


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    from tachyon_tpu.fields import presets
    from tachyon_tpu.math.field import PrimeField
    from tachyon_tpu.math.ntt import Radix2Domain, coset_lde_batch

    log_n = int(os.environ.get("BENCH_LOG_N", "16"))
    cols = int(os.environ.get("BENCH_COLS", "32"))
    n = 1 << log_n
    F = PrimeField(presets.BABY_BEAR)
    rng = np.random.default_rng(7)
    mat = F.random((n, cols), rng)
    dom = Radix2Domain(F, n)
    shift = F.spec.generator

    def lde(m):
        cf = dom.ifft(m)
        big = Radix2Domain(F, n * 2)
        pad = jnp.zeros((cf.shape[0], n) + cf.shape[2:], cf.dtype)
        return big.coset_fft(jnp.concatenate([cf, pad], axis=1), shift)

    fn = jax.jit(lde)
    c, best = time_fn(fn, mat)
    report(
        f"baby_bear_coset_lde_2^{log_n}x{cols}",
        best,
        BASE_LDE.get((log_n, cols)),
        c,
    )


def main_prove():
    """Full FRI batch prove (commit + open), the analog of reference
    benchmark/fri (47.65s at 2^22 rows x 100 cols, blowup 4, i9-13900K)."""
    jax = setup_jax()
    import numpy as np

    from tachyon_tpu.crypto import poseidon2
    from tachyon_tpu.crypto.challenger import DuplexChallenger
    from tachyon_tpu.crypto.fri import FRIConfig, TwoAdicFRIPCS
    from tachyon_tpu.fields import presets, extensions
    from tachyon_tpu.math.field import PrimeField
    import os, time

    log_n = int(os.environ.get("BENCH_LOG_N", "12"))
    cols = int(os.environ.get("BENCH_COLS", "16"))
    n = 1 << log_n
    F = PrimeField(presets.BABY_BEAR)
    pcs = TwoAdicFRIPCS(
        F, extensions.baby_bear4(), poseidon2.baby_bear_p3_w16(),
        FRIConfig(log_blowup=2, num_queries=10, proof_of_work_bits=8),
    )
    rng = np.random.default_rng(7)
    mat = F.random((n, cols), rng)

    t0 = time.time()
    data = pcs.commit([mat])
    ch = DuplexChallenger(poseidon2.baby_bear_p3_w16(), rate=4)
    _ov, proof = pcs.create_opening_proof(
        [data], [[[[3, 1, 4, 1]]]], ch
    )
    jax.block_until_ready(proof.final_eval)
    total = time.time() - t0
    base = {(22, 100): 47.65}.get((log_n, cols))
    report(f"fri_prove_2^{log_n}x{cols}", total, base)


if __name__ == "__main__":
    main()
    main_prove()
