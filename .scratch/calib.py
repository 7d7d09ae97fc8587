"""Calibration: Mosaic compile time + throughput of pallas EC add / field mul."""
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
Fq = curve.F
f = Fq.spec
print("L =", f.L, file=sys.stderr)

N = 1 << 16
rng = np.random.default_rng(0)
# random field-ish values (any residues ok for throughput)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(f.L, N), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(f.L, N), dtype=np.uint32))

def timeit(fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return compile_s, min(times)

# field mul
mulfn = jax.jit(lambda x, y: pallas_mont.mul(f, x, y))
c, t = timeit(mulfn, a, b)
print(f"mul   n=2^16: compile={c:.1f}s run={t*1e3:.3f}ms -> {N/t/1e6:.1f} Mmul/s")

# chain of 8 muls to reduce dispatch overhead share
def chain(x, y):
    for _ in range(8):
        x = pallas_mont.mul(f, x, y)
    return x
c, t = timeit(jax.jit(chain), a, b)
print(f"mulx8 n=2^16: compile={c:.1f}s run={t*1e3:.3f}ms -> {8*N/t/1e6:.1f} Mmul/s")

# EC add
p = (a, b, a, b)
q = (b, a, b, a)
addfn = jax.jit(lambda p, q: pallas_ec.add_xyzz(f, p, q))
c, t = timeit(addfn, p, q)
print(f"add   n=2^16: compile={c:.1f}s run={t*1e3:.3f}ms -> {N/t/1e6:.2f} Madd/s")

def chain_add(p, q):
    for _ in range(8):
        p = pallas_ec.add_xyzz(f, p, q)
    return p
c, t = timeit(jax.jit(chain_add), p, q)
print(f"addx8 n=2^16: compile={c:.1f}s run={t*1e3:.3f}ms -> {8*N/t/1e6:.2f} Madd/s")

# bigger batch
N2 = 1 << 20
a2 = jnp.asarray(rng.integers(0, 1 << 16, size=(f.L, N2), dtype=np.uint32))
p2 = (a2, a2, a2, a2)
c, t = timeit(jax.jit(lambda p, q: pallas_ec.add_xyzz(f, p, q)), p2, p2)
print(f"add   n=2^20: compile={c:.1f}s run={t*1e3:.3f}ms -> {N2/t/1e6:.2f} Madd/s")

# XLA sort of uint32 at 2^22 (per-window cost estimate)
keys = jnp.asarray(rng.integers(0, 1 << 16, size=(1 << 22,), dtype=np.uint32))
c, t = timeit(jax.jit(jnp.argsort), keys)
print(f"argsort 2^22: compile={c:.1f}s run={t*1e3:.3f}ms")
