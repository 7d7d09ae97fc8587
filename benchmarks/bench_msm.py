"""BN254 G1 variable-base MSM benchmark with exact-answer verification
(analog of reference benchmark/msm/msm_benchmark.cc with --check_results;
baselines: benchmark/msm/README.md i9-13900K uniform rows, BASELINE.md)."""
import functools
import os

import numpy as np

from benchmarks.harness import report, setup_jax, time_fn

BASELINES = {16: 0.037107, 18: 0.10235, 20: 0.352276, 22: 1.22393,
             23: 2.34737}


def build_inputs(curve, n, rng):
    """n pseudo-random points (256 exact multiples of G tiled) + uniform
    scalars, plus the exact expected answer computed on host ints."""
    import jax.numpy as jnp
    from tachyon_tpu.math.ec import AffinePoint
    from tachyon_tpu.math.msm import _host_point_mul, msm_host_reference
    from tachyon_tpu.fields.spec import limbs_to_int

    Fq, Fr = curve.F, curve.SF
    ks = rng.integers(1, 1 << 30, 256)
    base = [_host_point_mul(curve, int(k)) for k in ks]
    xs = np.array([p[0] for p in base], dtype=object)
    ys = np.array([p[1] for p in base], dtype=object)
    bx, by = Fq.encode(xs), Fq.encode(ys)
    reps = n // 256
    points = AffinePoint(
        jnp.tile(bx, (1, reps)), jnp.tile(by, (1, reps)),
        jnp.zeros((n,), bool),
    )
    Ls = Fr.spec.L
    sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
    sc[-1] &= 0x3FFF  # below the modulus
    s_ints = [limbs_to_int(sc[:, i]) for i in range(n)]
    k_total = sum(int(ks[i % 256]) * s_ints[i] for i in range(n)) % Fr.p
    expected = _host_point_mul(curve, k_total)
    return points, jnp.asarray(sc), expected


def main():
    jax = setup_jax()

    from tachyon_tpu.math import curves
    from tachyon_tpu.math.msm import msm

    log_ns = [int(v) for v in
              os.environ.get("BENCH_MSM_LOG_NS", "16,20").split(",")]
    curve = curves.bn254_g1()
    rng = np.random.default_rng(42)
    for log_n in log_ns:
        n = 1 << log_n
        points, scal, expected = build_inputs(curve, n, rng)
        run = jax.jit(functools.partial(msm, curve))
        c, best = time_fn(run, points, scal)
        aff = curve.to_affine(run(points, scal))
        got = (int(curve.F.decode(np.asarray(aff.x))),
               int(curve.F.decode(np.asarray(aff.y))))
        ok = got == expected if expected else bool(np.asarray(aff.inf))
        report(f"bn254_msm_2^{log_n}" + ("" if ok else "_UNVERIFIED"),
               best, BASELINES.get(log_n), c)


if __name__ == "__main__":
    main()
