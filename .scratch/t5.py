import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from tachyon_tpu.math import curves
from tachyon_tpu.math.msm import msm, msm_host_reference, _host_point_mul
from tachyon_tpu.math.ec import AffinePoint
from tachyon_tpu.fields.spec import int_to_limbs
curve = curves.bn254_g1()
rng = np.random.default_rng(3)
n = 300
pool = [_host_point_mul(curve, int(k)) for k in rng.integers(1, 1 << 16, 16)]
pts = [pool[i % 16] for i in range(n)]
scalars = [int.from_bytes(rng.bytes(40), "little") % curve.SF.p for _ in range(n)]
xs = np.array([p[0] for p in pts], dtype=object)
ys = np.array([p[1] for p in pts], dtype=object)
points = AffinePoint(curve.F.encode(xs), curve.F.encode(ys), jnp.zeros(n, bool))
Ls = curve.SF.spec.L
sl = jnp.asarray(np.stack([int_to_limbs(int(s), Ls) for s in scalars], axis=-1))
t0 = time.time()
out = curve.to_affine(msm(curve, points, sl, c=10))
got = (int(curve.F.decode(np.asarray(out.x))), int(curve.F.decode(np.asarray(out.y))))
print(f"tpu msm compile+run {time.time()-t0:.1f}s", flush=True)
want = msm_host_reference(curve, pts, scalars)
print("MATCH" if got == want else f"MISMATCH", flush=True)
