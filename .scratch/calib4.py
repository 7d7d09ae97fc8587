import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
rng = np.random.default_rng(0)

def timeit(fn, *args, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    return min(ts)

M = 1 << 20
B = 1 << 14
a = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(8, M), dtype=np.uint32))
spec = pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM)
K = 256
def mk(op, dtype=jnp.uint32):
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]; y = b_ref[:]
        for _ in range(K):
            x = op(x, y)
        o_ref[:] = x
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), dtype)))

for name, op in (("add", lambda x,y: x+y), ("mul", lambda x,y: x*y),
                 ("mullo16", lambda x,y: (x*y) & jnp.uint32(0xffff)),
                 ("shr16", lambda x,y: x >> 16), ("and", lambda x,y: x & y),
                 ("sub", lambda x,y: x-y),
                 ("muladd", lambda x,y: x*y+y)):
    t = timeit(mk(op), a, b)
    print(f"u32 {name:8s} x{K}: {t*1e3:7.3f}ms -> {K*8*M/t/1e9:7.1f} Gop/s")
