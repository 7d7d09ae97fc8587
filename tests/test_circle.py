"""M31 circle group tests (reference: math/circle/affine_point_unittest.cc
pattern; generator from circle/m31/BUILD.bazel)."""
import numpy as np

from tachyon_tpu.math.circle import m31_circle


def test_generator_on_circle():
    c = m31_circle()
    g = c.generator()
    assert bool(np.asarray(c.is_on_circle(g)))


def test_group_laws():
    c = m31_circle()
    g = c.generator()
    g2 = c.double(g)
    assert bool(np.asarray(c.is_on_circle(g2)))
    # double == add(self)
    g2b = c.add(g, g)
    assert np.array_equal(np.asarray(g2.x), np.asarray(g2b.x))
    assert np.array_equal(np.asarray(g2.y), np.asarray(g2b.y))
    # g + (-g) == identity
    idp = c.add(g, c.neg(g))
    ref = c.identity()
    assert np.array_equal(np.asarray(idp.x), np.asarray(ref.x))
    assert np.array_equal(np.asarray(idp.y), np.asarray(ref.y))


def test_generator_order():
    c = m31_circle()
    # 2^31 * G == identity but 2^30 * G != identity
    g = c.generator()
    half = c.scalar_mul(g, 1 << 30)
    assert not bool(np.asarray(c.F.eq(half.x, c.F.ones(())) &
                               c.F.eq(half.y, c.F.zeros(()))).all())
    full = c.add(c.double(half), c.identity())
    # double(2^30 G) = 2^31 G = identity
    dbl = c.double(half)
    assert bool(np.asarray(c.F.eq(dbl.x, c.F.ones(()))).all())
    assert bool(np.asarray(c.F.eq(dbl.y, c.F.zeros(()))).all())


def test_subgroup_generator():
    c = m31_circle()
    p = c.F.p
    x, y = c.subgroup_generator(3)  # order-8 subgroup
    # verify order 8 with exact host ints
    def add(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)
    acc = (x, y)
    for _ in range(2):
        acc = add(acc, acc)  # ^4
    assert acc != (1, 0)
    acc = add(acc, acc)  # ^8
    assert acc == (1, 0)


def test_batch_vectorized(rng):
    c = m31_circle()
    n = 64
    ks = [int(rng.integers(1, 1 << 20)) for _ in range(n)]
    p = c.F.p
    # host reference
    def mul(k):
        a, b = 1, 0
        gx, gy = c.GEN
        x, y = gx, gy
        while k:
            if k & 1:
                a, b = (a * x - b * y) % p, (a * y + b * x) % p
            x, y = (2 * x * x - 1) % p, (2 * x * y) % p
            k >>= 1
        return a, b
    expected = [mul(k) for k in ks]
    # device: batch of generators, per-lane scalar mul via shared doubling
    pts = c.encode([c.GEN] * n)
    # do it scalar-by-scalar host-driven loop (vector ops per step)
    got_x, got_y = c.decode(c.scalar_mul(pts, ks[0]))
    assert (int(got_x[0]), int(got_y[0])) == expected[0]
    on = c.is_on_circle(pts)
    assert bool(np.asarray(on).all())
