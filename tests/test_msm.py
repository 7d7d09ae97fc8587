"""MSM tests vs exact python reference (pattern of the reference's
variable_base_msm_unittest + msm test-set generators)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tachyon_tpu.math import curves
from tachyon_tpu.math.msm import msm, msm_host_reference
from tachyon_tpu.fields.spec import int_to_limbs
from tests.test_ec import py_mul


def build_test_set(curve, n, rng, style="uniform"):
    """points = [k_i]G with known ints; scalars random (uniform or small)."""
    mod = curve.F.p
    G = (int(curve.gen_x), int(curve.gen_y))
    ks = [rng.integers(1, 1 << 20) for _ in range(n)]
    pts = [py_mul(G, int(k), curve.a_int, mod) for k in ks]
    if style == "uniform":
        scalars = [
            int.from_bytes(rng.bytes(40), "little") % curve.SF.p for _ in range(n)
        ]
    elif style == "degenerate":
        scalars = [0, 1, curve.SF.p - 1] + [7] * (n - 3)
    else:
        scalars = [rng.integers(0, 16) for _ in range(n)]
    xs = np.array([p[0] for p in pts], dtype=object)
    ys = np.array([p[1] for p in pts], dtype=object)
    from tachyon_tpu.math.ec import AffinePoint

    points = AffinePoint(
        curve.F.encode(xs), curve.F.encode(ys), jnp.zeros(n, bool)
    )
    Ls = curve.SF.spec.L
    sl = jnp.asarray(
        np.stack([int_to_limbs(int(s), Ls) for s in scalars], axis=-1)
    )
    return points, sl, pts, scalars


@pytest.mark.parametrize("style", ["uniform", "small", "degenerate"])
@pytest.mark.parametrize("n", [1, 8])
def test_msm_bn254(style, n, rng):
    if style == "degenerate" and n < 3:
        pytest.skip("needs >= 3")
    curve = curves.bn254_g1()
    points, sl, pts, scalars = build_test_set(curve, n, rng, style)
    got = curve.to_affine(msm(curve, points, sl, c=4))
    want = msm_host_reference(curve, pts, scalars)
    if want is None:
        assert bool(np.asarray(got.inf).all())
    else:
        assert (int(curve.F.decode(got.x)), int(curve.F.decode(got.y))) == want


def test_msm_with_infinity_points(rng):
    curve = curves.bn254_g1()
    n = 8
    points, sl, pts, scalars = build_test_set(curve, n, rng)
    # mark half the points as infinity
    inf = jnp.asarray(np.array([i % 2 == 0 for i in range(n)]))
    from tachyon_tpu.math.ec import AffinePoint

    points = AffinePoint(points.x, points.y, inf)
    got = curve.to_affine(msm(curve, points, sl, c=4))
    want = msm_host_reference(
        curve,
        [None if i % 2 == 0 else pts[i] for i in range(n)],
        scalars,
    )
    assert (int(curve.F.decode(got.x)), int(curve.F.decode(got.y))) == want


def test_msm_all_same_scalar(rng):
    """adversarial bucket skew: every scalar identical."""
    curve = curves.bn254_g1()
    n = 8
    points, sl, pts, _ = build_test_set(curve, n, rng)
    s = 0x123456789ABCDEF
    Ls = curve.SF.spec.L
    sl = jnp.asarray(
        np.stack([int_to_limbs(s, Ls)] * n, axis=-1)
    )
    got = curve.to_affine(msm(curve, points, sl, c=4))
    want = msm_host_reference(curve, pts, [s] * n)
    assert (int(curve.F.decode(got.x)), int(curve.F.decode(got.y))) == want
