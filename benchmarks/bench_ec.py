"""EC point-op benchmark (analog of reference benchmark/ec: batched adds).
No published single-op baseline; reports raw throughput."""
import os

import numpy as np

from benchmarks.harness import report, setup_jax, time_fn


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ec import AffinePoint

    log_n = int(os.environ.get("BENCH_LOG_N", "18"))
    n = 1 << log_n
    curve = curves.bn254_g1()
    Fq = curve.F
    rng = np.random.default_rng(7)
    # random field values as coords: add_xyzz is coordinate arithmetic, so
    # throughput is independent of curve membership
    x = Fq.random((n,), rng)
    y = Fq.random((n,), rng)
    pts = curve.to_xyzz(AffinePoint(x, y, jnp.zeros((n,), bool)))

    fn = jax.jit(curve.add_xyzz)
    c, best = time_fn(fn, pts, pts)
    report(f"bn254_xyzz_add_2^{log_n}", best, None, c)


if __name__ == "__main__":
    main()
