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
W = 8
digits = jnp.asarray(rng.integers(0, 1 << 15, size=(W, n), dtype=np.uint32))
# packed payload: x||y as 16 u32 rows (two 16-bit limbs per u32)
payload = [jnp.asarray(rng.integers(0, 1 << 32, size=(n,), dtype=np.uint32))
           for _ in range(16)]

def sort_payload(digits):
    def body(_, dw):
        outs = jax.lax.sort((dw, *payload), num_keys=1)
        return None, outs[1][0]
    _, o = jax.lax.scan(body, None, digits)
    return o
timeit(f"{W}x sort with 16-op payload", jax.jit(sort_payload), digits)

def sort_payload33(digits):
    pay33 = payload + payload + [payload[0]]
    def body(_, dw):
        outs = jax.lax.sort((dw, *pay33), num_keys=1)
        return None, outs[1][0]
    _, o = jax.lax.scan(body, None, digits)
    return o
timeit(f"{W}x sort with 33-op payload", jax.jit(sort_payload33), digits)
