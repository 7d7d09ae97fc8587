import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
rng = np.random.default_rng(0)
def fetch(out): np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
def timeit(name, fn, *args, reps=3):
    t0=time.time(); out = fn(*args); fetch(out); c = time.time()-t0
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    print(f"{name}: compile={c:.1f}s run={min(ts)*1e3:.1f}ms", flush=True)

n = 1 << 20
L = 16
W = 17
digits = jnp.asarray(rng.integers(0, 1 << 15, size=(W, n), dtype=np.uint32))
ptsT = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 2 * L + 1), dtype=np.uint32))  # row-major points
pts = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))

def sorts_only(digits):
    def body(_, dw):
        o = jnp.argsort(dw)
        return None, o[0]
    _, outs = jax.lax.scan(body, None, digits)
    return outs
timeit("17x argsort", jax.jit(sorts_only), digits)

def sort_g_rowmajor(digits):
    def body(_, dw):
        o = jnp.argsort(dw)
        g = jnp.take(ptsT, o, axis=0)   # (n, 33) row gather
        return None, g[0, 0]
    _, outs = jax.lax.scan(body, None, digits)
    return outs
timeit("17x argsort+rowgather", jax.jit(sort_g_rowmajor), digits)

def sort_g_minor(digits):
    def body(_, dw):
        o = jnp.argsort(dw)
        g = jnp.take(pts, o, axis=-1)   # (L, n) minor gather (x only)
        return None, g[0, 0]
    _, outs = jax.lax.scan(body, None, digits)
    return outs
timeit("17x argsort+minorgather(x only)", jax.jit(sort_g_minor), digits)

# sort_key_val of a packed u64? TPU no u64. try lax.sort with 2 operands
def sort_pairs(digits):
    def body(_, dw):
        d_s, o = jax.lax.sort((dw, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return None, o[0]
    _, outs = jax.lax.scan(body, None, digits)
    return outs
timeit("17x lax.sort(key,idx)", jax.jit(sort_pairs), digits)
