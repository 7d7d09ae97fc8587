import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
rng = np.random.default_rng(0)

def fetch(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

def timeit(fn, *args, reps=3):
    t0=time.time(); out = fn(*args); fetch(out); print(f"  compile+1st={time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    return min(ts)

M = 1 << 20
B = 1 << 14
K = 64
def mk(dtype, op):
    spec = pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM)
    def kernel(a_ref, b_ref, o_ref):
        xs = [a_ref[:] + jnp.asarray(i + 1, dtype) for i in range(4)]
        y = b_ref[:]
        for _ in range(K):
            xs = [op(x, y) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc
    return jax.jit(pl.pallas_call(kernel, grid=(M // B,), in_specs=[spec]*2,
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, M), dtype)))

import itertools
cfg = sys.argv[1]
dname, dtype = {"u32": ("u32", jnp.uint32), "i32": ("i32", jnp.int32), "f32": ("f32", jnp.float32)}[cfg]
a = jnp.asarray(rng.integers(1, 1 << 15, size=(8, M), dtype=np.uint32)).astype(dtype)
b = jnp.asarray(rng.integers(1, 3, size=(8, M), dtype=np.uint32)).astype(dtype)
for oname, op in (("mul", lambda x,y: x*y), ("add", lambda x,y: x+y)):
    t = timeit(mk(dtype, op), a, b)
    print(f"{dname} {oname} ILP4 x{K}: {t*1e3:7.3f}ms -> {4*K*8*M/t/1e9:7.1f} G/s")
