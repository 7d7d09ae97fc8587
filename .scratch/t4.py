import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import PointXYZZ, AffinePoint
curve = curves.bn254_g1()
F = curve.F
def tc(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
C = 512
p = PointXYZZ(F.zeros((C,)), F.zeros((C,)), F.zeros((C,)), F.zeros((C,)))
ap = AffinePoint(F.zeros((C,)), F.zeros((C,)), jnp.zeros((C,), bool))
tc("add_jnp", curve._add_xyzz_jnp, p, p)
tc("madd_jnp", curve._madd_xyzz_jnp, p, ap)
# mont correctness quick
from tachyon_tpu.ops import mont
f = F.spec
rng = np.random.default_rng(0)
ai = [int.from_bytes(rng.bytes(31), "little") % f.p for _ in range(64)]
bi = [int.from_bytes(rng.bytes(31), "little") % f.p for _ in range(64)]
av = F.encode(np.array(ai, dtype=object)); bv = F.encode(np.array(bi, dtype=object))
g = mont._mul_jnp(f, av, bv)
want = [(x * y) % f.p for x, y in zip(ai, bi)]
got = [int(v) for v in F.decode(g)]
print("mul matches:", got == want, flush=True)
