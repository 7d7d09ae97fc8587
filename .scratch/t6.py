import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.ops import pallas_msm, pallas_ec
from tachyon_tpu.math.msm import _blind_points
curve = curves.bn254_g1()
f = curve.F.spec
L = f.L
rng = np.random.default_rng(0)

def fetch(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

def timeit(fn, *args, reps=3):
    t0=time.time(); out = fn(*args); fetch(out); c = time.time()-t0
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    return c, min(ts)

(d1, nd1), _ = _blind_points(curve)
C = 4096
R = 256   # n = 2^20
x = jnp.asarray(rng.integers(0, 1 << 16, size=(R, L, C), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(R, L, C), dtype=np.uint32))
inf = jnp.zeros((R, 1, C), jnp.uint32)
dc = tuple(jnp.broadcast_to(t[:, None], (L, C)) for t in d1)
fn = jax.jit(lambda a, b, i: pallas_msm.suffix_sweep(f, a, b, i, dc))
c, t = timeit(fn, x, y, inf)
n = R * C
print(f"suffix_sweep n=2^20: compile={c:.1f}s run={t*1e3:.1f}ms -> {n/t/1e6:.1f} Mmadd/s")

# compare: batch madd kernel (old style, full batch at once)
px = (x[:, :, :].reshape(L, -1)[:, :1<<20],)*1  # reshape hack
a2 = jnp.asarray(rng.integers(0, 1 << 16, size=(L, 1 << 20), dtype=np.uint32))
p4 = (a2, a2, a2, a2)
qinf = jnp.zeros((1 << 20,), bool)
fn2 = jax.jit(lambda p, qx, qy, qi: pallas_ec.madd_xyzz(f, p, qx, qy, qi))
c, t = timeit(fn2, p4, a2, a2, qinf)
print(f"batch madd n=2^20: compile={c:.1f}s run={t*1e3:.1f}ms -> {(1<<20)/t/1e6:.1f} Mmadd/s")

# batch full add for reference
fn3 = jax.jit(lambda p, q: pallas_ec.add_xyzz(f, p, q))
c, t = timeit(fn3, p4, p4)
print(f"batch add  n=2^20: compile={c:.1f}s run={t*1e3:.1f}ms -> {(1<<20)/t/1e6:.1f} Madd/s")
