"""GLV endomorphism-based scalar decomposition.

Analog of the reference's GLV layer
(reference: tachyon/math/elliptic_curves/msm/glv.h).  For curves with
j-invariant 0 (y^2 = x^3 + b) over fields with a cube root of unity:
phi(x, y) = (beta x, y) acts as multiplication by lambda, so
k*P = k1*P + k2*phi(P) with |k1|, |k2| ~ sqrt(r) — halving the scalar
bit-length fed to Pippenger.

Constants are derived at setup (cube roots computed from the field
generators; the short lattice basis via the extended Euclidean algorithm)
and validated against the curve generator with exact host arithmetic, so
no magic numbers are baked in.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math.ec import AffinePoint, PointXYZZ, SWCurve
from tachyon_tpu.math import msm as msm_mod


def _cube_roots_of_unity(p: int, generator: int) -> list[int]:
    assert (p - 1) % 3 == 0, "field has no cube root of unity"
    w = pow(generator, (p - 1) // 3, p)
    return [w, pow(w, 2, p)]


def _short_basis(r: int, lam: int):
    """two short vectors (a, b) with a + b*lam = 0 mod r
    (extended Euclid cut at sqrt(r), the GLV lattice recipe)."""
    s = math.isqrt(r)
    rs = [r, lam]
    ts = [0, 1]
    while rs[-1] >= s:
        q = rs[-2] // rs[-1]
        rs.append(rs[-2] - q * rs[-1])
        ts.append(ts[-2] - q * ts[-1])
    l = len(rs) - 1
    v1 = (rs[l], -ts[l])
    # one more Euclid step for the second candidate (GLV recipe: v2 is the
    # shorter of (r_{l-1}, -t_{l-1}) and (r_{l+1}, -t_{l+1}); without the
    # extra step r_{l-1} alone can be far above sqrt(r) and the Babai
    # rounding then returns wide k1/k2)
    q = rs[l - 1] // rs[l]
    rs.append(rs[l - 1] - q * rs[l])
    ts.append(ts[l - 1] - q * ts[l])
    cands = [(rs[l - 1], -ts[l - 1]), (rs[l + 1], -ts[l + 1])]
    v2 = min(cands, key=lambda v: v[0] * v[0] + v[1] * v[1])
    return v1, v2


class GLV:
    def __init__(self, curve: SWCurve):
        self.curve = curve
        p, r = curve.F.p, curve.SF.p
        assert curve.b_int != 0 and curve.a_int == 0, "GLV needs j = 0"
        # find the (beta, lambda) pair that matches on the generator
        g = (int(curve.gen_x), int(curve.gen_y))
        betas = _cube_roots_of_unity(p, curve.F.spec.generator)
        lams = _cube_roots_of_unity(r, curve.SF.spec.generator)
        found = None
        for beta in betas:
            phi_g = (g[0] * beta % p, g[1])
            for lam in lams:
                if msm_mod.msm_host_reference(curve, [g], [lam]) == phi_g:
                    found = (beta, lam)
                    break
            if found:
                break
        assert found, "no consistent (beta, lambda) pair"
        self.beta, self.lam = found
        self.v1, self.v2 = _short_basis(r, self.lam)
        self.r = r

    def decompose(self, k: int) -> tuple[int, int]:
        """k = k1 + k2*lam (mod r) with small |k1|, |k2| (signed)."""
        r = self.r
        (a1, b1), (a2, b2) = self.v1, self.v2
        # (c1, c2) = round(k * (M^-1) e1) where M = [[a1, a2], [b1, b2]];
        # the rounding must be sign-safe: python floor-division corrupts
        # round-to-nearest when the reduced basis gives det < 0
        det = a1 * b2 - a2 * b1

        def rnd(x, d=det):
            if d < 0:
                x, d = -x, -d
            return (2 * x + d) // (2 * d)

        c1 = rnd(b2 * k)
        c2 = rnd(-b1 * k)
        k1 = k - c1 * a1 - c2 * a2
        k2 = -c1 * b1 - c2 * b2
        assert (k1 + k2 * self.lam - k) % r == 0
        return k1, k2

    def endo(self, points: AffinePoint) -> AffinePoint:
        """phi(P) = (beta x, y), vectorized."""
        F = self.curve.F
        beta = F.full((), self.beta)[:, None]
        return AffinePoint(F.mul(points.x, beta), points.y, points.inf)


def msm_glv(
    curve: SWCurve,
    points: AffinePoint,
    scalar_ints,
    c: int | None = None,
) -> PointXYZZ:
    """GLV-decomposed Pippenger MSM: half-width scalars over the doubled
    point set [P_i, phi(P_i)] (reference: glv.h + pippenger pipeline).

    scalar_ints: host ints (decomposition is host-exact); points device.
    """
    from tachyon_tpu.fields.spec import int_to_limbs

    glv = GLV(curve)
    F = curve.F
    half_bits = (curve.SF.spec.bits + 1) // 2 + 2
    k1s, k2s, s1, s2 = [], [], [], []
    for k in scalar_ints:
        k1, k2 = glv.decompose(int(k) % glv.r)
        s1.append(k1 < 0)
        s2.append(k2 < 0)
        k1s.append(abs(k1))
        k2s.append(abs(k2))
    Ls = curve.SF.spec.L
    half_limbs = (half_bits + 15) // 16
    sc = np.stack(
        [int_to_limbs(v, Ls) for v in k1s + k2s], axis=-1
    )[:half_limbs]
    scalars = jnp.asarray(sc)

    phi_pts = glv.endo(points)
    # negate points where the decomposed scalar is negative
    sign1 = jnp.asarray(np.array(s1))
    sign2 = jnp.asarray(np.array(s2))
    p1 = AffinePoint(
        points.x, jnp.where(sign1, F.neg(points.y), points.y), points.inf
    )
    p2 = AffinePoint(
        phi_pts.x, jnp.where(sign2, F.neg(phi_pts.y), phi_pts.y), phi_pts.inf
    )
    allp = AffinePoint(
        jnp.concatenate([p1.x, p2.x], axis=-1),
        jnp.concatenate([p1.y, p2.y], axis=-1),
        jnp.concatenate([p1.inf, p2.inf], axis=-1),
    )
    return msm_mod.msm(curve, allp, scalars, c=c, total_bits=half_bits)
