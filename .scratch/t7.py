import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import PointXYZZ
from tachyon_tpu.math.msm import _blind_points, _suffix_scan_lanes, _fold_reduce_lanes, _bcast
curve = curves.bn254_g1()
f = curve.F.spec
L = f.L
rng = np.random.default_rng(0)
def fetch(out): np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
def timeit(name, fn, *args, reps=3):
    t0=time.time(); out = fn(*args); fetch(out); c = time.time()-t0
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    print(f"{name}: compile={c:.1f}s run={min(ts)*1e3:.2f}ms", flush=True)

n = 1 << 20
keys = jnp.asarray(rng.integers(0, 1 << 15, size=(n,), dtype=np.uint32))
vals = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
timeit("argsort 2^20", jax.jit(jnp.argsort), keys)
order = jnp.argsort(keys)
timeit("gather (L,2^20)", jax.jit(lambda v, o: jnp.take(v, o, axis=-1)), vals, order)
C, R = 4096, n // 4096
idx2 = jnp.transpose(order.reshape(C, R))
timeit("gather2d+transpose", jax.jit(lambda v, i: jnp.moveaxis(jnp.take(v, i, axis=-1), -2, 0)), vals, idx2)
timeit("searchsorted 2^15 q", jax.jit(lambda d: jnp.searchsorted(jnp.sort(d), jnp.arange(1, 1<<15, dtype=jnp.uint32))), keys)

(d1, nd1), (d2, nd2) = _blind_points(curve)
u = PointXYZZ(*(jnp.asarray(rng.integers(0, 1<<16, size=(L, C), dtype=np.uint32)) for _ in range(4)))
timeit("hillis C=4096 (12 adds)", jax.jit(lambda q: _suffix_scan_lanes(curve, q)), u)
u2 = PointXYZZ(*(jnp.asarray(rng.integers(0, 1<<16, size=(L, 512), dtype=np.uint32)) for _ in range(4)))
timeit("fold C2=512 (9 adds)", jax.jit(lambda q: _fold_reduce_lanes(curve, q)), u2)
# width-1 dbl chain: 16 sequential dispatches
one = PointXYZZ(*(jnp.asarray(rng.integers(0, 1<<16, size=(L,), dtype=np.uint32)) for _ in range(4)))
def dblchain(p):
    return jax.lax.fori_loop(0, 16, lambda i, a: curve.dbl_xyzz(a), p)
timeit("dbl chain x16 width-1", jax.jit(dblchain), one)
def dblchain254(p):
    return jax.lax.fori_loop(0, 254, lambda i, a: curve.dbl_xyzz(a), p)
timeit("dbl chain x254 width-1", jax.jit(dblchain254), one)
