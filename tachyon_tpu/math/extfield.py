"""Extension field towers (Fp2/Fp6/Fp12, Fp4/Fp5) over vectorized base fields.

TPU-native analog of the reference's quadratic/cubic extension templates
(reference: tachyon/math/finite_fields/quadratic_extension_field.h, fp6.h,
fp12.h, extension_field_base.h), generalized: an ExtField is degree-D over
any field object implementing the common array protocol, so the same code
gives BN254 Fq2/Fq6/Fq12 (towered) and BabyBear4 (direct quartic).

Element representation: jnp uint32 array of shape (D, *base_element_shape),
coefficient-major (c0 is elt[0]).  All ops vectorized over trailing batch.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math.field import PrimeField


class ExtField:
    """Degree-D extension F[x]/(x^D - non_residue), non_residue in base."""

    def __init__(self, base, degree: int, non_residue, name: str = ""):
        """`non_residue`: base-field constant, given as whatever base.encode
        accepts (int for PrimeField base, list of ints for ExtField base)."""
        self.base = base
        self.D = degree
        self.name = name or f"{getattr(base, 'name', base)}^ext{degree}"
        self._nr_host = non_residue
        self.non_residue = base.encode(non_residue)

    # --- shape helpers -----------------------------------------------------
    @property
    def coeff_ndim(self) -> int:
        """number of leading 'structure' axes of an element (coeffs + limbs)."""
        base_nd = self.base.coeff_ndim if isinstance(self.base, ExtField) else 1
        return 1 + base_nd

    @property
    def p(self) -> int:
        return self.base.p

    def __repr__(self):
        return f"ExtField({self.name})"

    def _nr(self, like):
        """non-residue broadcast against an element's base-coeff batch."""
        nr = self.non_residue
        extra = like.ndim - nr.ndim
        return nr.reshape(nr.shape + (1,) * extra) if extra > 0 else nr

    def _coeffs(self, a):
        return [a[i] for i in range(self.D)]

    def _stack(self, cs):
        return jnp.stack(cs, axis=0)

    # --- construction -------------------------------------------------------
    def zeros(self, shape=()):
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        return jnp.stack([self.base.zeros(s)] * self.D, axis=0)

    def ones(self, shape=()):
        s = (shape,) if isinstance(shape, int) else tuple(shape)
        return jnp.stack(
            [self.base.ones(s)] + [self.base.zeros(s)] * (self.D - 1), axis=0
        )

    def encode(self, coeffs):
        """coeffs: length-D list (each base-encodable) -> element array."""
        assert len(coeffs) == self.D
        return jnp.stack([self.base.encode(c) for c in coeffs], axis=0)

    def decode(self, a):
        return [self.base.decode(np.asarray(a)[i]) for i in range(self.D)]

    def random(self, shape=(), rng=None):
        rng = rng or np.random.default_rng()
        return jnp.stack(
            [self.base.random(shape, rng) for _ in range(self.D)], axis=0
        )

    def embed(self, a):
        """base element -> extension element (c0 = a, rest 0)."""
        return jnp.stack(
            [a] + [jnp.zeros_like(a)] * (self.D - 1), axis=0
        )

    # --- linear ops -----------------------------------------------------------
    def add(self, a, b):
        return self._stack(
            [self.base.add(x, y) for x, y in zip(self._coeffs(a), self._coeffs(b))]
        )

    def sub(self, a, b):
        return self._stack(
            [self.base.sub(x, y) for x, y in zip(self._coeffs(a), self._coeffs(b))]
        )

    def neg(self, a):
        return self._stack([self.base.neg(x) for x in self._coeffs(a)])

    def double(self, a):
        return self._stack([self.base.double(x) for x in self._coeffs(a)])

    def mul_small(self, a, k: int):
        return self._stack([self.base.mul_small(x, k) for x in self._coeffs(a)])

    def mul_base(self, a, s):
        """multiply by a base-field element (broadcast over coeffs)."""
        return self._stack([self.base.mul(x, s) for x in self._coeffs(a)])

    def mul_by_nonresidue(self, x):
        """base-field multiply by the tower non-residue."""
        return self.base.mul(x, self._nr(x))

    # --- multiplication --------------------------------------------------------
    def mul(self, a, b):
        """Schoolbook with x^D = non_residue fold (D<=6: fine unrolled)."""
        D = self.D
        av, bv = self._coeffs(a), self._coeffs(b)
        out = [None] * D
        for i in range(D):
            for j in range(D):
                p = self.base.mul(av[i], bv[j])
                k = i + j
                if k >= D:
                    k -= D
                    p = self.mul_by_nonresidue(p)
                out[k] = p if out[k] is None else self.base.add(out[k], p)
        return self._stack(out)

    def square(self, a):
        return self.mul(a, a)

    # --- equality/select ----------------------------------------------------------
    def is_zero(self, a):
        m = self.base.is_zero(a[0])
        for i in range(1, self.D):
            m = m & self.base.is_zero(a[i])
        return m

    def eq(self, a, b):
        m = self.base.eq(a[0], b[0])
        for i in range(1, self.D):
            m = m & self.base.eq(a[i], b[i])
        return m

    def select(self, mask, a, b):
        return jnp.where(
            jnp.reshape(mask, (1,) * self.coeff_ndim + mask.shape), a, b
        )

    # --- inversion ----------------------------------------------------------------
    def inv(self, a):
        if self.D == 2:
            # (a0 - a1 x) / (a0^2 - nr * a1^2)
            a0, a1 = a[0], a[1]
            norm = self.base.sub(
                self.base.square(a0), self.mul_by_nonresidue(self.base.square(a1))
            )
            ninv = self.base.inv(norm)
            return self._stack(
                [self.base.mul(a0, ninv), self.base.neg(self.base.mul(a1, ninv))]
            )
        if self.D == 3:
            # standard cubic-extension inverse (arkworks Fp3 formula)
            a0, a1, a2 = a[0], a[1], a[2]
            sq = self.base.square
            m = self.base.mul
            t0 = sq(a0)
            t1 = sq(a1)
            t2 = sq(a2)
            t3 = m(a0, a1)
            t4 = m(a0, a2)
            t5 = m(a1, a2)
            n = self.mul_by_nonresidue
            c0 = self.base.sub(t0, n(t5))
            c1 = self.base.sub(n(t2), t3)
            c2 = self.base.sub(t1, t4)
            # norm = a0*c0 + nr*(a2*c1 + a1*c2)
            norm = self.base.add(
                m(a0, c0), n(self.base.add(m(a2, c1), m(a1, c2)))
            )
            ninv = self.base.inv(norm)
            return self._stack([m(c0, ninv), m(c1, ninv), m(c2, ninv)])
        # generic: Fermat over the extension (q^D - 2); used for D=4/5
        return self.pow_const(a, self.order - 2)

    @property
    def order(self) -> int:
        base_order = self.base.order if isinstance(self.base, ExtField) else self.base.p
        return base_order**self.D

    def pow_const(self, a, e: int):
        """a ** e via lax.scan over the exponent bits (one square + one mul
        compiled regardless of exponent size)."""
        import jax

        if e == 0:
            return self.ones(a.shape[self.coeff_ndim:])
        nbits = e.bit_length()
        bits = jnp.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

        def body(acc, bit):
            acc = self.square(acc)
            acc = self.select(bit.astype(jnp.bool_), self.mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, self.ones(a.shape[self.coeff_ndim:]), bits)
        return acc

    def batch_inverse(self, a, axis=-1):
        """Montgomery-trick batch inverse along a batch axis."""
        if axis < 0:
            axis = a.ndim + axis
        cn = self.coeff_ndim
        assert axis >= cn, "axis must be a batch axis"
        a_m = jnp.moveaxis(a, axis, cn)
        n = a_m.shape[cn]
        zero = self.is_zero(a_m)
        safe = self.select(zero, self.ones(a_m.shape[cn:]), a_m)
        # sequential prefix (host-unrolled would be slow; use scan)
        import jax

        xs = jnp.moveaxis(safe, cn, 0)

        def fwd(c, x):
            return self.mul(c, x), c

        total, prefix = jax.lax.scan(fwd, self.ones(a_m.shape[cn + 1:]), xs)
        tinv = self.inv(total)

        def bwd(c, xp):
            x, pref = xp
            return self.mul(c, x), self.mul(c, pref)

        _, invs = jax.lax.scan(bwd, tinv, (xs, prefix), reverse=True)
        out = jnp.moveaxis(invs, 0, cn)
        out = self.select(zero, jnp.zeros_like(out), out)
        return jnp.moveaxis(out, cn, axis)


def frobenius_coeffs(ext: ExtField, power: int = 1):
    """placeholder for pairing work (round 2): Frobenius endomorphism."""
    raise NotImplementedError


class HostExt:
    """Exact host-side scalar arithmetic in F_p[x]/(x^D - nr).

    Elements are lists/tuples of D python ints (coefficient-major, matching
    ExtField.decode output order).  Used by verifier-side logic that folds
    constraint evaluations at an extension point (uni-STARK verify,
    challenger bookkeeping) where a device round-trip per scalar op would
    dominate.  Only valid for a prime base field.
    """

    def __init__(self, ext: ExtField):
        assert isinstance(ext.base, PrimeField), "HostExt: prime base only"
        self.D = ext.D
        self.p = ext.p
        self.nr = int(ext._nr_host)

    def e(self, x) -> list:
        """embed int or coerce a sequence to canonical D-list."""
        if isinstance(x, int):
            return [x % self.p] + [0] * (self.D - 1)
        out = [int(c) % self.p for c in x]
        assert len(out) == self.D
        return out

    def add(self, a, b):
        return [(x + y) % self.p for x, y in zip(self.e(a), self.e(b))]

    def sub(self, a, b):
        return [(x - y) % self.p for x, y in zip(self.e(a), self.e(b))]

    def neg(self, a):
        return [(-x) % self.p for x in self.e(a)]

    def mul(self, a, b):
        a, b = self.e(a), self.e(b)
        D, p, nr = self.D, self.p, self.nr
        out = [0] * D
        for i in range(D):
            ai = a[i]
            if ai == 0:
                continue
            for j in range(D):
                k = i + j
                t = ai * b[j]
                if k >= D:
                    out[k - D] = (out[k - D] + t * nr) % p
                else:
                    out[k] = (out[k] + t) % p
        return out

    def pow(self, a, e: int):
        r = self.e(1)
        a = self.e(a)
        while e:
            if e & 1:
                r = self.mul(r, a)
            a = self.mul(a, a)
            e >>= 1
        return r

    def inv(self, a):
        return self.pow(a, self.p ** self.D - 2)

    def is_zero(self, a) -> bool:
        return all(c % self.p == 0 for c in self.e(a))
