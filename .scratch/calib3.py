"""Calibration 3: argsort/gather cost, u32 mul-vs-add VPU cost, sweep-kernel madd rate."""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

rng = np.random.default_rng(0)

def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

def timeit(fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    fetch(out)
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        ts.append(time.time() - t0)
    return comp, min(ts)

# ---- 1. argsort 2^22 u32 + gather of (16, n) by order -------------------
N = 1 << 22
keys = jnp.asarray(rng.integers(0, 1 << 16, size=(N,), dtype=np.uint32))
vals = jnp.asarray(rng.integers(0, 1 << 16, size=(16, N), dtype=np.uint32))
c, t = timeit(jax.jit(jnp.argsort), keys)
print(f"argsort 2^22: compile={c:.1f}s run={t*1e3:.1f}ms")
order = jnp.argsort(keys)

@jax.jit
def gather(v, o):
    return jnp.take(v, o, axis=1)

c, t = timeit(gather, vals, order)
print(f"gather (16,2^22): compile={c:.1f}s run={t*1e3:.1f}ms")

@jax.jit
def sort_gather_transpose(k, v):
    o = jnp.argsort(k)
    g = jnp.take(v, o, axis=1)           # (16, n)
    g3 = g.reshape(16, 2048, 2048)       # (L, C, R)
    return jnp.transpose(g3, (2, 0, 1))  # (R, L, C)

c, t = timeit(sort_gather_transpose, keys, vals)
print(f"sort+gather+transpose: compile={c:.1f}s run={t*1e3:.1f}ms")

# ---- 2. u32 mul vs add cost in a pallas kernel ---------------------------
M = 1 << 20
a = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M // 8), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M // 8), dtype=np.uint32))

def mk(op, k):
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]
        y = b_ref[:]
        for _ in range(k):
            x = op(x, y)
        o_ref[:] = x
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

K = 256
for name, op in (("add", lambda x, y: x + y), ("mul", lambda x, y: x * y),
                 ("shr", lambda x, y: x >> 16), ("and", lambda x, y: x & y)):
    c, t = timeit(jax.jit(mk(op, K)), a, b)
    print(f"u32 {name} x{K} on 2^20: run={t*1e3:.3f}ms -> {K*M/t/1e9:.1f} Gop/s")

# f32 mul for comparison
af = a.astype(jnp.float32); bf = b.astype(jnp.float32)
def mkf(k):
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        for _ in range(k):
            x = x * y
        o_ref[:] = x
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(af.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
c, t = timeit(jax.jit(mkf(K)), af, bf)
print(f"f32 mul x{K} on 2^20: run={t*1e3:.3f}ms -> {K*M/t/1e9:.1f} Gop/s")
