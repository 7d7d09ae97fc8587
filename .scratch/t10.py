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
K = 8  # average over 8 gathers in one jit
idxs = jnp.asarray(rng.permuted(np.tile(np.arange(n), (K, 1)), axis=1).astype(np.int32))

for cols in (16, 32, 64, 128):
    src = jnp.asarray(rng.integers(0, 1 << 16, size=(n, cols), dtype=np.uint32))
    def f(idxs, src=src):
        def body(_, o):
            return None, jnp.take(src, o, axis=0)[0, 0]
        _, outs = jax.lax.scan(body, None, idxs)
        return outs
    timeit(f"8x rowgather (n,{cols})", jax.jit(f), idxs)

src = jnp.asarray(rng.integers(0, 1 << 16, size=(n, 128), dtype=np.uint32)).astype(jnp.float32)
def f32g(idxs):
    def body(_, o):
        return None, jnp.take(src, o, axis=0)[0, 0]
    _, outs = jax.lax.scan(body, None, idxs)
    return outs
timeit("8x rowgather f32 (n,128)", jax.jit(f32g), idxs)

# one-hot matmul gather for comparison on a small slice? skip.
# minor-axis for reference
src2 = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
def fm(idxs):
    def body(_, o):
        return None, jnp.take(src2, o, axis=-1)[0, 0]
    _, outs = jax.lax.scan(body, None, idxs)
    return outs
timeit("8x minorgather (16,n)", jax.jit(fm), idxs)
