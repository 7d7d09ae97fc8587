"""EC point op tests: group laws checked against exact Python-int affine
arithmetic (the GMP-reference pattern of the reference's
short_weierstrass/*_unittest.cc suites)."""
import numpy as np
import pytest

from tachyon_tpu.math import curves
from tachyon_tpu.fields.spec import int_to_limbs
import jax.numpy as jnp


# ---- exact python reference ---------------------------------------------------
def py_add(p, q, a, mod):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and (y1 + y2) % mod == 0:
        return None
    if p == q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, mod) % mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
    x3 = (lam * lam - x1 - x2) % mod
    y3 = (lam * (x1 - x3) - y1) % mod
    return (x3, y3)


def py_mul(p, k, a, mod):
    acc = None
    add = p
    while k:
        if k & 1:
            acc = py_add(acc, add, a, mod)
        add = py_add(add, add, a, mod)
        k >>= 1
    return acc


CURVES = [curves.bn254_g1, curves.secp256k1, curves.pallas]


@pytest.mark.parametrize("mk", CURVES, ids=lambda f: f.__name__)
def test_generator_on_curve(mk):
    c = mk()
    g = c.generator((4,))
    assert bool(np.asarray(c.is_on_curve(g)).all())


@pytest.mark.parametrize("mk", CURVES, ids=lambda f: f.__name__)
def test_add_double_vs_python(mk, rng):
    c = mk()
    mod = c.F.p
    # points [k]G for k = 1..6 via python reference
    G = (int(c.gen_x), int(c.gen_y))
    pts = [py_mul(G, k, c.a_int, mod) for k in range(1, 7)]
    xs = np.array([p[0] for p in pts], dtype=object)
    ys = np.array([p[1] for p in pts], dtype=object)
    aff = c.to_xyzz(
        type(c.generator())(c.F.encode(xs), c.F.encode(ys), jnp.zeros(6, bool))
    )
    # double
    d = c.to_affine(c.dbl_xyzz(aff))
    want = [py_mul(G, 2 * k, c.a_int, mod) for k in range(1, 7)]
    got_x = c.F.decode(d.x)
    got_y = c.F.decode(d.y)
    for i, w in enumerate(want):
        assert (int(got_x[i]), int(got_y[i])) == w
    # add shifted: [k]G + [k+1 mod 6 +1]G
    from tachyon_tpu.math.ec import AffinePoint

    q = AffinePoint(
        jnp.roll(aff.x, 1, axis=-1),
        jnp.roll(aff.y, 1, axis=-1),
        jnp.zeros(6, bool),
    )
    q_aff = AffinePoint(q.x, q.y, q.inf)
    s = c.to_affine(c.add_xyzz(aff, c.to_xyzz(q_aff)))
    ks = [1, 2, 3, 4, 5, 6]
    qs = [6, 1, 2, 3, 4, 5]
    got_x = c.F.decode(s.x)
    got_y = c.F.decode(s.y)
    for i in range(6):
        w = py_mul(G, ks[i] + qs[i], c.a_int, mod)
        assert (int(got_x[i]), int(got_y[i])) == w


@pytest.mark.parametrize("mk", CURVES, ids=lambda f: f.__name__)
def test_edge_cases(mk):
    c = mk()
    g = c.generator((3,))
    gx = c.to_xyzz(g)
    # P + (-P) = inf
    r = c.add_xyzz(gx, c.to_xyzz(c.neg_affine(g)))
    assert bool(np.asarray(c.F.is_zero(r.zz)).all())
    # P + P (via add) == double
    s = c.to_affine(c.add_xyzz(gx, gx))
    d = c.to_affine(c.dbl_xyzz(gx))
    assert bool(np.asarray(c.eq_affine(s, d)).all())
    # P + inf = P (madd with inf affine)
    r = c.madd_xyzz(gx, c.infinity_affine((3,)))
    ra = c.to_affine(r)
    assert bool(np.asarray(c.eq_affine(ra, g)).all())
    # inf + P = P
    r = c.madd_xyzz(c.infinity_xyzz((3,)), g)
    ra = c.to_affine(r)
    assert bool(np.asarray(c.eq_affine(ra, g)).all())


def test_scalar_mul_vs_python(rng):
    c = curves.bn254_g1()
    mod = c.F.p
    G = (int(c.gen_x), int(c.gen_y))
    ks = [0, 1, 2, 3, 0xDEADBEEF, c.SF.p - 1, 12345678901234567890]
    n = len(ks)
    Ls = c.SF.spec.L
    sl = np.stack([int_to_limbs(k % c.SF.p, Ls) for k in ks], axis=-1)
    got = c.to_affine(c.scalar_mul(c.generator((n,)), jnp.asarray(sl)))
    gx, gy = c.F.decode(got.x), c.F.decode(got.y)
    ginf = np.asarray(got.inf)
    for i, k in enumerate(ks):
        w = py_mul(G, k % c.SF.p, c.a_int, mod)
        if w is None:
            assert ginf[i]
        else:
            assert not ginf[i]
            assert (int(gx[i]), int(gy[i])) == w


def test_g2_group_law():
    c = curves.bn254_g2()
    g = c.generator((2,))
    assert bool(np.asarray(c.is_on_curve(g)).all())
    gx = c.to_xyzz(g)
    # 2G + G == G + 2G, and (2G + G) - G == 2G
    d = c.dbl_xyzz(gx)
    s1 = c.add_xyzz(d, gx)
    s2 = c.madd_xyzz(d, g)
    a1, a2 = c.to_affine(s1), c.to_affine(s2)
    assert bool(np.asarray(c.eq_affine(a1, a2)).all())
    back = c.to_affine(c.add_xyzz(s1, c.to_xyzz(c.neg_affine(g))))
    assert bool(np.asarray(c.eq_affine(back, c.to_affine(d))).all())


def test_fq2_field_ops(rng):
    F2 = curves.bn254_fq2()
    p = F2.p
    a = F2.random((8,), rng)
    b = F2.random((8,), rng)
    ab = F2.mul(a, b)
    a0, a1 = F2.decode(a)
    b0, b1 = F2.decode(b)
    c0, c1 = F2.decode(ab)
    for i in range(8):
        # (a0 + a1 u)(b0 + b1 u), u^2 = -1
        w0 = (int(a0[i]) * int(b0[i]) - int(a1[i]) * int(b1[i])) % p
        w1 = (int(a0[i]) * int(b1[i]) + int(a1[i]) * int(b0[i])) % p
        assert (int(c0[i]), int(c1[i])) == (w0, w1)
    # inverse
    inv = F2.inv(a)
    one = F2.mul(a, inv)
    i0, i1 = F2.decode(one)
    assert all(int(x) == 1 for x in i0) and all(int(x) == 0 for x in i1)


def test_fq12_tower(rng):
    F12 = curves.bn254_fq12()
    a = F12.random((2,), rng)
    b = F12.random((2,), rng)
    # ring axioms spot check: (a+b)^2 == a^2 + 2ab + b^2
    lhs = F12.square(F12.add(a, b))
    rhs = F12.add(
        F12.add(F12.square(a), F12.double(F12.mul(a, b))), F12.square(b)
    )
    assert bool(np.asarray(F12.eq(lhs, rhs)).all())
    inv = F12.inv(a)
    assert bool(np.asarray(F12.eq(F12.mul(a, inv), F12.ones((2,)))).all())
