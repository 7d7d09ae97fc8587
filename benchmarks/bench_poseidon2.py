"""Poseidon2 hash benchmarks (analog of reference benchmark/poseidon2:
10k permutations, BabyBear w16 + BN254 w3).
Baselines: benchmark/poseidon2/README.md:40,86 (i9-13900K)."""
import numpy as np

from benchmarks.harness import report, setup_jax, time_fn

BASE = {"baby_bear": 0.0113, "bn254": 0.0613}  # 10k hashes, seconds


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    from tachyon_tpu.crypto import poseidon2

    n = 10_000
    rng = np.random.default_rng(7)

    for name, perm in (
        ("baby_bear", poseidon2.baby_bear_p3_w16()),
        ("bn254", poseidon2.bn254_w3()),
    ):
        F = perm.F
        st = F.random((perm.t, n), rng)
        fn = jax.jit(perm.permute)
        c, best = time_fn(fn, st)
        report(f"poseidon2_{name}_10k", best, BASE.get(name), c)


if __name__ == "__main__":
    main()
