"""3D-layout (L, 8, B) mont mul kernel vs current (L, B) row layout."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
sys.path.insert(0, "/root/repo")
from tachyon_tpu.math import curves
from tachyon_tpu.fields.spec import LIMB_BITS, LIMB_MASK

MASK = np.uint32(LIMB_MASK)
f = curves.bn254_g1().F.spec
L = f.L
rng = np.random.default_rng(0)

def fetch(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

def timeit(fn, *args, reps=3):
    t0=time.time(); out = fn(*args); fetch(out); print(f"  compile+1st={time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); fetch(out); ts.append(time.time()-t0)
    return min(ts)

def _mul_body(a, b):
    nl = [np.uint32(int(v)) for v in f.p_limbs]
    n0inv = np.uint32(int(f.n0inv))
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * L + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
    c = zero
    for i in range(L):
        ti = cols[i] + c
        m = (ti * n0inv) & MASK
        for j in range(L):
            p = m * nl[j]
            if j == 0:
                ti = ti + (p & MASK)
            else:
                cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
        c = ti >> LIMB_BITS
    out = []
    for i in range(L, 2 * L):
        t = cols[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    extra = cols[2 * L] + c
    diff = []
    borrow = zero
    for i in range(L):
        t = out[i] - nl[i] - borrow
        diff.append(t & MASK)
        borrow = t >> 31
    t = extra - borrow
    borrow = t >> 31
    keep = borrow
    return [jnp.where(keep.astype(jnp.bool_), out[i], diff[i]) for i in range(L)]

N = 1 << 20
BS = 1 << 11   # lanes per block (x8 sublanes = 16384 elements/block)
a3 = jnp.asarray(rng.integers(0, 1 << 16, size=(L, 8, N // 8), dtype=np.uint32))
b3 = jnp.asarray(rng.integers(0, 1 << 16, size=(L, 8, N // 8), dtype=np.uint32))

spec3 = pl.BlockSpec((L, 8, BS), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
def kernel3(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    out = _mul_body(a, b)
    for i in range(L):
        o_ref[i] = out[i]

call3 = jax.jit(pl.pallas_call(kernel3, grid=(N // 8 // BS,),
    in_specs=[spec3]*2, out_specs=spec3,
    out_shape=jax.ShapeDtypeStruct((L, 8, N // 8), jnp.uint32)))

def chain3(x, y):
    for _ in range(8):
        x = call3(x, y)
    return x
t = timeit(jax.jit(chain3), a3, b3)
print(f"mul3d x8 n=2^20: {t*1e3:8.3f}ms -> {8*N/t/1e6:8.1f} Mmul/s")
