import sys; sys.path.insert(0, "/root/repo")
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp
print("import ok", flush=True)
from tachyon_tpu.math import curves
from tachyon_tpu.math.msm import msm, msm_host_reference
from tachyon_tpu.fields.spec import int_to_limbs
curve = curves.bn254_g1()
t0 = time.time()
rng = np.random.default_rng(0)
mod = curve.F.p
def py_mul(G, k, a, p):
    def add(pp, qq):
        if pp is None: return qq
        if qq is None: return pp
        x1,y1 = pp; x2,y2 = qq
        if x1==x2 and (y1+y2)%p==0: return None
        lam = ((3*x1*x1+a)*pow(2*y1,-1,p) if pp==qq else (y2-y1)*pow(x2-x1,-1,p))%p
        x3 = (lam*lam-x1-x2)%p
        return (x3, (lam*(x1-x3)-y1)%p)
    acc=None; b=G
    while k:
        if k&1: acc=add(acc,b)
        b=add(b,b); k>>=1
    return acc
G = (int(curve.gen_x), int(curve.gen_y))
n = 200
pool = [py_mul(G, int(k), 0, mod) for k in rng.integers(1, 1<<16, 16)]
pts = [pool[i % 16] for i in range(n)]
scalars = [int.from_bytes(rng.bytes(40), "little") % curve.SF.p for _ in range(n)]
xs = np.array([p[0] for p in pts], dtype=object)
ys = np.array([p[1] for p in pts], dtype=object)
from tachyon_tpu.math.ec import AffinePoint
points = AffinePoint(curve.F.encode(xs), curve.F.encode(ys), jnp.zeros(n, bool))
Ls = curve.SF.spec.L
sl = jnp.asarray(np.stack([int_to_limbs(int(s), Ls) for s in scalars], axis=-1))
print(f"setup {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = msm(curve, points, sl, c=10)
out = curve.to_affine(out)
got = (int(curve.F.decode(out.x)), int(curve.F.decode(out.y)))
print(f"msm compile+run {time.time()-t0:.1f}s", flush=True)
want = msm_host_reference(curve, pts, scalars)
print("MATCH" if got == want else f"MISMATCH {got} vs {want}", flush=True)
