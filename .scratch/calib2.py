import time, sys
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from tachyon_tpu.math import curves
from tachyon_tpu.ops import pallas_ec, pallas_mont
curve = curves.bn254_g1()
f = curve.F.spec
rng = np.random.default_rng(0)

def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:, :1])  # force completion
    times = []
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0][:, :1])
        times.append(time.time() - t0)
    return min(times)

for logn in (16, 20):
    N = 1 << logn
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(f.L, N), dtype=np.uint32))
    p = (a, a, a, a)
    def chain_add(p, q):
        for _ in range(8):
            p = pallas_ec.add_xyzz(f, p, q)
        return p
    t = timeit(jax.jit(chain_add), p, p)
    print(f"addx8 n=2^{logn}: run={t*1e3:.3f}ms -> {8*N/t/1e6:.1f} Madd/s")
    def chain_mul(x, y):
        for _ in range(8):
            x = pallas_mont.mul(f, x, y)
        return x
    t = timeit(jax.jit(chain_mul), a, a)
    print(f"mulx8 n=2^{logn}: run={t*1e3:.3f}ms -> {8*N/t/1e6:.1f} Mmul/s")
