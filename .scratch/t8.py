import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import PointXYZZ
from tachyon_tpu.math import msm as M
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
    print(f"{name}: compile={c:.1f}s run={min(ts)*1e3:.1f}ms", flush=True)

n = 1 << 20
W = 17
c_bits = 15
digits = jnp.asarray(rng.integers(0, 1 << c_bits, size=(W, n), dtype=np.uint32))
px = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
py = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
pinf = jnp.zeros((n,), jnp.uint32)
C, R = 4096, n // 4096
(d1, nd1), (d2, nd2) = M._blind_points(curve)

def sweep_only(digits):
    def body(_, dw):
        order = jnp.argsort(dw)
        idx2 = jnp.transpose(order.reshape(C, R))
        gx = jnp.take(px, idx2, axis=-1)
        gy = jnp.take(py, idx2, axis=-1)
        ginf = pinf[idx2]
        suffix = M._sweep_suffix(curve, gx, gy, ginf, d1)
        return None, jax.tree.map(lambda t: t[..., 0, 0], suffix)
    _, outs = jax.lax.scan(body, None, digits)
    return outs

timeit("17x sort+gather+sweep", jax.jit(sweep_only), digits)

def sortgather_only(digits):
    def body(_, dw):
        order = jnp.argsort(dw)
        idx2 = jnp.transpose(order.reshape(C, R))
        gx = jnp.take(px, idx2, axis=-1)
        gy = jnp.take(py, idx2, axis=-1)
        ginf = pinf[idx2]
        return None, (gx[0, 0, 0], gy[0, 0, 0], ginf[0, 0])
    _, outs = jax.lax.scan(body, None, digits)
    return outs

timeit("17x sort+gather only", jax.jit(sortgather_only), digits)

B = 1 << c_bits
def window_full(digits):
    def body(_, dw):
        w = M._window_sum(curve, px, py, pinf, dw, C, R, B, (d1, nd1), (d2, nd2))
        return None, w
    _, outs = jax.lax.scan(body, None, digits)
    return outs
timeit("17x full window", jax.jit(window_full), digits)
