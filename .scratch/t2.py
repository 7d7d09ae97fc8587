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

from tachyon_tpu.math.msm import _suffix_scan_lanes, _fold_reduce_lanes, _sweep_suffix, _sweep_reduce, _blind_points
tc("hillis", lambda q: _suffix_scan_lanes(curve, q), p)
tc("fold", lambda q: _fold_reduce_lanes(curve, q), p)
(d1, nd1), (d2, nd2) = _blind_points(curve)
x3 = F.zeros((1, C)); i3 = jnp.zeros((1, C), jnp.uint32)
tc("sweep_suffix R=1", lambda a, b, i: _sweep_suffix(curve, a, b, i, d1), x3, x3, i3)
x4 = F.zeros((2, C))
tc("sweep_reduce R=2", lambda a: _sweep_reduce(curve, PointXYZZ(a, a, a, a), d2), x4)
