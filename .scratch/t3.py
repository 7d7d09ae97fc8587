import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.ops import mont
from tachyon_tpu.fields.spec import LIMB_BITS, LIMB_MASK
F = curves.bn254_g1().F
f = F.spec
L = f.L
MASK = np.uint32(LIMB_MASK)

def tc(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile {t1:.2f}s run {(time.time()-t0)/5*1e3:.2f}ms", flush=True)

a = F.zeros((512,)) ; b = F.zeros((512,))
tc("mul_jnp cur", lambda x, y: mont._mul_jnp(f, x, y), a, b)

def mul_lean(f, a, b):
    L = f.L
    prod = a[:, None] * b[None, :]
    cols = mont._colsums(L, prod & MASK, prod >> LIMB_BITS)  # (2L+1, batch)
    n0inv = np.uint32(int(f.n0inv))
    nl = jnp.asarray(f.p_limbs, jnp.uint32)  # (L,)
    batch_ndim = cols.ndim - 1
    nl_b = nl.reshape((L,) + (1,) * batch_ndim)

    def round_body(i, state):
        cols, c = state
        ti = jax.lax.dynamic_index_in_dim(cols, i, 0, keepdims=False) + c
        m = (ti * n0inv) & MASK
        pm = m[None] * nl_b
        plo, phi = pm & MASK, pm >> LIMB_BITS
        ti = ti + plo[0]
        win = jax.lax.dynamic_slice_in_dim(cols, i + 1, L, axis=0)
        upd = win + phi
        upd = upd.at[: L - 1].add(plo[1:])
        cols = jax.lax.dynamic_update_slice_in_dim(cols, upd, i + 1, axis=0)
        return cols, ti >> LIMB_BITS

    cols, c = jax.lax.fori_loop(0, L, round_body, (cols, jnp.zeros_like(cols[0])))
    out = []
    for i in range(L, 2 * L):
        t = cols[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    extra = cols[2 * L] + c
    return mont._join(mont._csub_p(f, out, extra))

tc("mul_lean", lambda x, y: mul_lean(f, x, y), a, b)
# correctness
rng = np.random.default_rng(0)
av = F.encode(np.array([int.from_bytes(rng.bytes(31), "little") % f.p for _ in range(64)], dtype=object))
bv = F.encode(np.array([int.from_bytes(rng.bytes(31), "little") % f.p for _ in range(64)], dtype=object))
w = mont._mul_jnp(f, av, bv)
g = mul_lean(f, av, bv)
print("lean matches:", bool(jnp.all(w == g)), flush=True)
