"""GLV endomorphism tests (reference: math/elliptic_curves/msm/glv.h +
glv_unittest pattern): derived constants, decomposition bounds, MSM equality
with the exact host reference."""
import numpy as np
import pytest

from tachyon_tpu.math import curves
from tachyon_tpu.math.ec import AffinePoint
from tachyon_tpu.math.glv import GLV, msm_glv
from tachyon_tpu.math.msm import msm_host_reference


@pytest.fixture(scope="module")
def glv():
    return GLV(curves.bn254_g1())


def test_lambda_beta_consistency(glv):
    # (lambda^2 + lambda + 1) = 0 mod r, (beta^2 + beta + 1) = 0 mod p
    r, p = glv.r, glv.curve.F.p
    assert (glv.lam * glv.lam + glv.lam + 1) % r == 0
    assert (glv.beta * glv.beta + glv.beta + 1) % p == 0


def test_decompose_bounds(glv, rng):
    r = glv.r
    half = (r.bit_length() + 1) // 2 + 2
    for _ in range(50):
        k = int(rng.integers(0, 1 << 63)) | (
            int(rng.integers(0, 1 << 63)) << 63
        ) | (int(rng.integers(0, 1 << 63)) << 126)
        k %= r
        k1, k2 = glv.decompose(k)
        assert (k1 + k2 * glv.lam - k) % r == 0
        assert abs(k1).bit_length() <= half
        assert abs(k2).bit_length() <= half


def test_msm_glv_matches_reference(rng):
    curve = curves.bn254_g1()
    from tests.test_ec import py_mul

    n = 40
    G = (int(curve.gen_x), int(curve.gen_y))
    pts = [py_mul(G, int(k), 0, curve.F.p)
           for k in rng.integers(1, 1 << 30, n)]
    scalars = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
               % curve.SF.p for _ in range(n)]
    xs = np.array([p[0] for p in pts], dtype=object)
    ys = np.array([p[1] for p in pts], dtype=object)
    points = AffinePoint(
        curve.F.encode(xs), curve.F.encode(ys),
        np.zeros(n, dtype=bool),
    )
    import jax.numpy as jnp

    points = AffinePoint(points.x, points.y, jnp.asarray(points.inf))
    acc = msm_glv(curve, points, scalars)
    aff = curve.to_affine(acc)
    expected = msm_host_reference(curve, pts, scalars)
    got = (int(curve.F.decode(aff.x)), int(curve.F.decode(aff.y)))
    assert got == expected
