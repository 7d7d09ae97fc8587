"""FixedBaseMSM vs exact host scalar-mul (reference: msm/fixed_base_msm.h
test pattern)."""
import numpy as np
import jax.numpy as jnp

from tachyon_tpu.fields.spec import int_to_limbs
from tachyon_tpu.math import curves
from tachyon_tpu.math.fixed_msm import FixedBaseMSM
from tachyon_tpu.math.msm import msm_host_reference


def test_fixed_base_msm(rng):
    curve = curves.bn254_g1()
    G = (int(curve.gen_x), int(curve.gen_y))
    fb = FixedBaseMSM(curve, G, c=8)
    n = 16
    scalars = [int(rng.integers(1, 1 << 62)) * int(rng.integers(1, 1 << 62))
               % curve.SF.p for _ in range(n)]
    Ls = curve.SF.spec.L
    sl = jnp.asarray(np.stack([int_to_limbs(s, Ls) for s in scalars], -1))
    out = fb.run(sl)
    aff = curve.to_affine(out)
    xs = curve.F.decode(aff.x)
    ys = curve.F.decode(aff.y)
    for i in range(n):
        expect = msm_host_reference(curve, [G], [scalars[i]])
        assert (int(xs[i]), int(ys[i])) == expect


def test_fixed_base_zero_scalar():
    curve = curves.bn254_g1()
    G = (int(curve.gen_x), int(curve.gen_y))
    fb = FixedBaseMSM(curve, G, c=8)
    Ls = curve.SF.spec.L
    sl = jnp.asarray(np.stack([int_to_limbs(0, Ls)], -1))
    out = fb.run(sl)
    aff = curve.to_affine(out)
    assert bool(np.asarray(aff.inf)[0])
