"""Short-Weierstrass elliptic curve point ops, vectorized & select-complete.

TPU-native analog of the reference's point templates (reference:
tachyon/math/elliptic_curves/short_weierstrass/{affine_point,jacobian_point,
point_xyzz}*.h and sw_curve.h).  Differences by design:

  * every op acts on a *vector* of points (coordinate arrays carry batch
    axes) — the unit of work matches the VPU;
  * all special cases (infinity, P==Q, P==-Q) are handled branch-free with
    selects, so the ops are jit/scan/vmap-safe;
  * the curve is generic over the coordinate field object (PrimeField or
    ExtField), so G2 twists reuse the same code.

XYZZ is the workhorse representation for accumulation (as in the reference's
PointXYZZ used by Pippenger buckets): x = X/ZZ, y = Y/ZZZ, ZZ^3 = ZZZ^2.
Infinity is ZZ == 0 (all-zero coordinates).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class AffinePoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool, batch-shaped


class PointXYZZ(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    zz: jnp.ndarray
    zzz: jnp.ndarray


class SWCurve:
    """y^2 = x^3 + a x + b over a field object F (a == 0 fast path)."""

    def __init__(self, name, field, a, b, gen_x, gen_y, scalar_field):
        self.name = name
        self.F = field
        self.a_int = a
        self.b_int = b
        self.a = field.encode(a)
        self.b = field.encode(b)
        self.gen_x = gen_x
        self.gen_y = gen_y
        self.SF = scalar_field  # PrimeField of the scalar group order
        self._a_is_zero = self._is_zero_const(a)
        # fused Pallas point kernels apply to a=0 prime-field curves on TPU
        import os

        self._pallas_ok = (
            self._a_is_zero
            and hasattr(field, "spec")
            and os.environ.get("TACHYON_PALLAS", "1") != "0"
        )

    @staticmethod
    def _is_zero_const(v) -> bool:
        if isinstance(v, (list, tuple)):
            return all(SWCurve._is_zero_const(x) for x in v)
        return int(v) == 0

    # --- constructors -------------------------------------------------------
    def generator(self, shape=()) -> AffinePoint:
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        F = self.F

        def bc(v):
            c = F.encode(v)
            return jnp.broadcast_to(
                c.reshape(c.shape + (1,) * len(s)), c.shape + s
            )

        return AffinePoint(bc(self.gen_x), bc(self.gen_y), jnp.zeros(s, bool))

    def infinity_xyzz(self, shape=()) -> PointXYZZ:
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        z = self.F.zeros(s)
        return PointXYZZ(z, z, z, z)

    def infinity_affine(self, shape=()) -> AffinePoint:
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        z = self.F.zeros(s)
        return AffinePoint(z, z, jnp.ones(s, bool))

    def to_xyzz(self, p: AffinePoint) -> PointXYZZ:
        F = self.F
        one = F.ones(p.inf.shape)
        zero = F.zeros(p.inf.shape)
        ninf = ~p.inf
        return PointXYZZ(
            F.select(ninf, p.x, zero),
            F.select(ninf, p.y, zero),
            F.select(ninf, one, zero),
            F.select(ninf, one, zero),
        )

    def to_affine(self, p: PointXYZZ) -> AffinePoint:
        """Normalize via batch inverse (inf where zz == 0)."""
        F = self.F
        inf = F.is_zero(p.zz)
        # invert zz and zzz together in one batch pass
        cn = getattr(F, "coeff_ndim", 1)
        stacked = jnp.stack([p.zz, p.zzz], axis=cn)  # new batch axis
        invs = F.batch_inverse(stacked, axis=cn)
        zz_inv = jnp.take(invs, 0, axis=cn)
        zzz_inv = jnp.take(invs, 1, axis=cn)
        x = F.mul(p.x, zz_inv)
        y = F.mul(p.y, zzz_inv)
        zero = jnp.zeros_like(x)
        return AffinePoint(
            F.select(~inf, x, zero), F.select(~inf, y, zero), inf
        )

    def neg_affine(self, p: AffinePoint) -> AffinePoint:
        return AffinePoint(p.x, self.F.neg(p.y), p.inf)

    def neg_xyzz(self, p: PointXYZZ) -> PointXYZZ:
        return PointXYZZ(p.x, self.F.neg(p.y), p.zz, p.zzz)

    def is_on_curve(self, p: AffinePoint) -> jnp.ndarray:
        F = self.F
        rhs = F.add(F.mul(F.square(p.x), p.x), self._b_like(p.x))
        if not self._a_is_zero:
            rhs = F.add(rhs, F.mul(self._a_like(p.x), p.x))
        return F.eq(F.square(p.y), rhs) | p.inf

    def _b_like(self, like):
        b = self.b
        extra = like.ndim - b.ndim
        return b.reshape(b.shape + (1,) * extra)

    def _a_like(self, like):
        a = self.a
        extra = like.ndim - a.ndim
        return a.reshape(a.shape + (1,) * extra)

    # --- xyzz group law -------------------------------------------------------
    def dbl_xyzz(self, p: PointXYZZ) -> PointXYZZ:
        if self._pallas_ok:
            from tachyon_tpu.ops import pallas_ec

            def tpu_fn(px, py, pzz, pzzz):
                return PointXYZZ(
                    *pallas_ec.dbl_xyzz(self.F.spec, (px, py, pzz, pzzz))
                )

            return jax.lax.platform_dependent(
                p.x, p.y, p.zz, p.zzz,
                tpu=tpu_fn,
                default=lambda *c: self._dbl_xyzz_jnp(PointXYZZ(*c)),
            )
        return self._dbl_xyzz_jnp(p)

    def add_xyzz(self, p: PointXYZZ, q: PointXYZZ) -> PointXYZZ:
        if self._pallas_ok:
            from tachyon_tpu.ops import pallas_ec

            def tpu_fn(*c):
                return PointXYZZ(
                    *pallas_ec.add_xyzz(self.F.spec, c[:4], c[4:])
                )

            return jax.lax.platform_dependent(
                p.x, p.y, p.zz, p.zzz, q.x, q.y, q.zz, q.zzz,
                tpu=tpu_fn,
                default=lambda *c: self._add_xyzz_jnp(
                    PointXYZZ(*c[:4]), PointXYZZ(*c[4:])
                ),
            )
        return self._add_xyzz_jnp(p, q)

    def madd_xyzz(self, p: PointXYZZ, q: AffinePoint) -> PointXYZZ:
        if self._pallas_ok:
            from tachyon_tpu.ops import pallas_ec

            def tpu_fn(px, py, pzz, pzzz, qx, qy, qinf):
                return PointXYZZ(
                    *pallas_ec.madd_xyzz(
                        self.F.spec, (px, py, pzz, pzzz), qx, qy, qinf
                    )
                )

            return jax.lax.platform_dependent(
                p.x, p.y, p.zz, p.zzz, q.x, q.y, q.inf,
                tpu=tpu_fn,
                default=lambda *c: self._madd_xyzz_jnp(
                    PointXYZZ(*c[:4]), AffinePoint(*c[4:])
                ),
            )
        return self._madd_xyzz_jnp(p, q)

    def _dbl_xyzz_jnp(self, p: PointXYZZ) -> PointXYZZ:
        """dbl-2008-s-1; infinity propagates automatically (zz=0)."""
        F = self.F
        u = F.double(p.y)
        v = F.square(u)
        w = F.mul(u, v)
        s = F.mul(p.x, v)
        m = F.mul_small(F.square(p.x), 3)
        if not self._a_is_zero:
            m = F.add(m, F.mul(self._a_like(p.x), F.square(p.zz)))
        x3 = F.sub(F.square(m), F.double(s))
        y3 = F.sub(F.mul(m, F.sub(s, x3)), F.mul(w, p.y))
        zz3 = F.mul(v, p.zz)
        zzz3 = F.mul(w, p.zzz)
        return PointXYZZ(x3, y3, zz3, zzz3)

    def _add_xyzz_jnp(self, p: PointXYZZ, q: PointXYZZ) -> PointXYZZ:
        """add-2008-s with complete select-based case handling."""
        F = self.F
        u1 = F.mul(p.x, q.zz)
        u2 = F.mul(q.x, p.zz)
        s1 = F.mul(p.y, q.zzz)
        s2 = F.mul(q.y, p.zzz)
        pp_ = F.sub(u2, u1)
        r = F.sub(s2, s1)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r)
        pp2 = F.square(pp_)
        ppp = F.mul(pp_, pp2)
        qq = F.mul(u1, pp2)
        x3 = F.sub(F.sub(F.square(r), ppp), F.double(qq))
        y3 = F.sub(F.mul(r, F.sub(qq, x3)), F.mul(s1, ppp))
        zz3 = F.mul(F.mul(p.zz, q.zz), pp2)
        zzz3 = F.mul(F.mul(p.zzz, q.zzz), ppp)
        out = PointXYZZ(x3, y3, zz3, zzz3)

        dbl = self._dbl_xyzz_jnp(p)
        p_inf = F.is_zero(p.zz)
        q_inf = F.is_zero(q.zz)
        # dispatch: p inf -> q ; q inf -> p ; same point -> dbl ;
        #           opposite -> inf (zz3 = 0 already, since pp_=0 => zz3=0;
        #           but x3,y3 garbage: zero them via select)
        is_dbl = same_x & same_y & ~p_inf & ~q_inf
        is_inf = same_x & ~same_y & ~p_inf & ~q_inf
        sel = F.select
        ez = jnp.zeros_like(x3)
        out = PointXYZZ(
            sel(is_inf, ez, out.x),
            sel(is_inf, ez, out.y),
            sel(is_inf, ez, out.zz),
            sel(is_inf, ez, out.zzz),
        )
        out = PointXYZZ(
            sel(is_dbl, dbl.x, out.x),
            sel(is_dbl, dbl.y, out.y),
            sel(is_dbl, dbl.zz, out.zz),
            sel(is_dbl, dbl.zzz, out.zzz),
        )
        out = PointXYZZ(
            sel(q_inf, p.x, out.x),
            sel(q_inf, p.y, out.y),
            sel(q_inf, p.zz, out.zz),
            sel(q_inf, p.zzz, out.zzz),
        )
        out = PointXYZZ(
            sel(p_inf, q.x, out.x),
            sel(p_inf, q.y, out.y),
            sel(p_inf, q.zz, out.zz),
            sel(p_inf, q.zzz, out.zzz),
        )
        return out

    def _madd_xyzz_jnp(self, p: PointXYZZ, q: AffinePoint) -> PointXYZZ:
        """madd-2008-s (mixed add, q affine) with complete case handling."""
        F = self.F
        u2 = F.mul(q.x, p.zz)
        s2 = F.mul(q.y, p.zzz)
        pp_ = F.sub(u2, p.x)
        r = F.sub(s2, p.y)
        same_x = F.is_zero(pp_)
        same_y = F.is_zero(r)
        pp2 = F.square(pp_)
        ppp = F.mul(pp_, pp2)
        qq = F.mul(p.x, pp2)
        x3 = F.sub(F.sub(F.square(r), ppp), F.double(qq))
        y3 = F.sub(F.mul(r, F.sub(qq, x3)), F.mul(p.y, ppp))
        zz3 = F.mul(p.zz, pp2)
        zzz3 = F.mul(p.zzz, ppp)

        dbl = self._dbl_xyzz_jnp(p)
        p_inf = F.is_zero(p.zz)
        q_inf = q.inf
        q_xyzz = self.to_xyzz(q)
        is_dbl = same_x & same_y & ~p_inf & ~q_inf
        is_inf = same_x & ~same_y & ~p_inf & ~q_inf
        sel = F.select
        ez = jnp.zeros_like(x3)

        def pick(case, a, b):
            return PointXYZZ(
                sel(case, a.x, b.x),
                sel(case, a.y, b.y),
                sel(case, a.zz, b.zz),
                sel(case, a.zzz, b.zzz),
            )

        out = PointXYZZ(x3, y3, zz3, zzz3)
        out = pick(is_inf, PointXYZZ(ez, ez, ez, ez), out)
        out = pick(is_dbl, dbl, out)
        out = pick(q_inf, p, out)
        out = pick(p_inf, q_xyzz, out)
        return out

    # --- scalar multiplication (reference/test path; MSM is in msm.py) --------
    def scalar_mul(self, p: AffinePoint, scalars: jnp.ndarray) -> PointXYZZ:
        """[s]P via MSB-first double-and-add scan.

        scalars: uint32 limb array (Ls, *batch) in *plain* (non-Montgomery)
        16-bit limb form, little-endian (same layout as field elements).
        """
        F = self.F
        nbits = scalars.shape[0] * 16

        def body(acc, i):
            bit_idx = nbits - 1 - i
            limb = scalars[bit_idx // 16]
            bit = ((limb >> (bit_idx % 16)) & 1).astype(jnp.bool_)
            acc = self.dbl_xyzz(acc)
            added = self.madd_xyzz(acc, p)
            acc = PointXYZZ(
                F.select(bit, added.x, acc.x),
                F.select(bit, added.y, acc.y),
                F.select(bit, added.zz, acc.zz),
                F.select(bit, added.zzz, acc.zzz),
            )
            return acc, None

        init = self.infinity_xyzz(p.inf.shape)
        acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
        return acc

    def eq_affine(self, p: AffinePoint, q: AffinePoint) -> jnp.ndarray:
        F = self.F
        both = F.eq(p.x, q.x) & F.eq(p.y, q.y) & ~p.inf & ~q.inf
        return both | (p.inf & q.inf)

    def random_affine(self, n: int, rng=None, seed_points=None):
        """n pseudo-random curve points: [s_i]G batched (host scalars)."""
        rng = rng or np.random.default_rng()
        SF = self.SF
        scalars = np.empty((n,), dtype=object)
        for i in range(n):
            scalars[i] = int.from_bytes(rng.bytes(40), "little") % SF.p
        from tachyon_tpu.fields.spec import int_to_limbs

        Ls = SF.spec.L
        sl = np.stack([int_to_limbs(int(s), Ls) for s in scalars], axis=-1)
        g = self.generator((n,))
        pts = self.scalar_mul(g, jnp.asarray(sl))
        return self.to_affine(pts), scalars
