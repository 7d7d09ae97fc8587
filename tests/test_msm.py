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


@pytest.mark.parametrize(
    "n",
    [pytest.param(300, marks=pytest.mark.slow),
     pytest.param(1025, marks=pytest.mark.slow)],
)
def test_msm_sweep_path(n, rng):
    """n > MSM_NAIVE_THRESHOLD exercises the sorted suffix-sweep design
    (sort + blinded sweep + T-gather identity), not the naive scan."""
    curve = curves.bn254_g1()
    mod = curve.F.p
    G = (int(curve.gen_x), int(curve.gen_y))
    # small distinct-point pool tiled => duplicate points inside buckets
    pool = [py_mul(G, int(k), curve.a_int, mod)
            for k in rng.integers(1, 1 << 16, 32)]
    pts = [pool[i % 32] for i in range(n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % curve.SF.p
               for _ in range(n)]
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
    got = curve.to_affine(msm(curve, points, sl, c=10))
    want = msm_host_reference(curve, pts, scalars)
    assert (int(curve.F.decode(got.x)), int(curve.F.decode(got.y))) == want


@pytest.mark.slow
def test_msm_sweep_skewed_digits(rng):
    """all scalars equal => one bucket holds every point (max segment).
    n matches test_msm_sweep_path so the XLA graph is compiled once."""
    curve = curves.bn254_g1()
    n = 300
    points, sl, pts, _ = build_test_set(curve, n, rng)
    s = 0xDEADBEEF12345678
    Ls = curve.SF.spec.L
    sl = jnp.asarray(np.stack([int_to_limbs(s, Ls)] * n, axis=-1))
    got = curve.to_affine(msm(curve, points, sl, c=10))
    want = msm_host_reference(curve, pts, [s] * n)
    assert (int(curve.F.decode(got.x)), int(curve.F.decode(got.y))) == want


@pytest.mark.slow
def test_msm_sweep_g2_crosscheck(rng):
    """extension-field curve takes the complete-jnp sweep; cross-check the
    sweep path against the naive scan path at the same inputs."""
    from tachyon_tpu.math.msm import _msm_naive

    curve = curves.bn254_g2()
    n = 160
    g = curve.generator((n,))
    ks = rng.integers(1, 1 << 30, n)
    Ls = curve.SF.spec.L
    sl = jnp.asarray(
        np.stack([int_to_limbs(int(k), Ls) for k in ks], axis=-1)
    )
    pts = curve.to_affine(curve.scalar_mul(g, sl))
    s2 = jnp.asarray(
        np.stack(
            [int_to_limbs(int.from_bytes(rng.bytes(40), "little")
                          % curve.SF.p, Ls) for _ in range(n)],
            axis=-1,
        )
    )
    got = curve.to_affine(msm(curve, pts, s2, c=8))
    want = curve.to_affine(_msm_naive(curve, pts, s2))
    assert bool(np.asarray(curve.eq_affine(got, want)).all())
