import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
rng = np.random.default_rng(0)

def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

def timeit(fn, *args, reps=5):
    out = fn(*args); fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    return min(ts)

M = 1 << 20
B = 1 << 14
a = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M), dtype=np.uint32))
spec = pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM)
K = 128

# mul-heavy dependent chain: x = x*y; y = y + (x>>16)  (2 ops + shift per iter)
def mk_mix():
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        for _ in range(K):
            x = x * y
            y = y + (x >> 16)
        o_ref[:] = x + y
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), jnp.uint32)))
t = timeit(mk_mix(), a, b)
print(f"mix (1mul+1add+1shr)x{K}: {t*1e3:7.3f}ms -> mul-rate {K*8*M/t/1e9:6.1f} G/s, total {3*K*8*M/t/1e9:6.1f} Gop/s")

# pure dependent mul: x = x * y; y = x (swap) -> alternating, unfoldable
def mk_mul():
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        for _ in range(K):
            x, y = x * y, x
        o_ref[:] = x + y
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), jnp.uint32)))
t = timeit(mk_mul(), a, b)
print(f"dep mul x{K}:             {t*1e3:7.3f}ms -> {K*8*M/t/1e9:6.1f} Gmul/s")

# pure dependent add
def mk_add():
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        for _ in range(K):
            x, y = x + y, x
        o_ref[:] = x + y
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), jnp.uint32)))
t = timeit(mk_add(), a, b)
print(f"dep add x{K}:             {t*1e3:7.3f}ms -> {K*8*M/t/1e9:6.1f} Gadd/s")

# 16x16 -> 32 full product + hi/lo split (the real inner op of mont mul)
def mk_prod():
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        acc_lo = jnp.zeros_like(x); acc_hi = jnp.zeros_like(x)
        for _ in range(K):
            p = x * y
            acc_lo = acc_lo + (p & jnp.uint32(0xFFFF))
            acc_hi = acc_hi + (p >> 16)
            x = x + jnp.uint32(1)
        o_ref[:] = acc_lo ^ acc_hi
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), jnp.uint32)))
t = timeit(mk_prod(), a, b)
print(f"prod+split+acc x{K}:      {t*1e3:7.3f}ms -> {K*8*M/t/1e9:6.1f} Gprod/s ({5*K*8*M/t/1e9:6.1f} Gop/s)")
