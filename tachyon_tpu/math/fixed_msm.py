"""Fixed-base MSM: precomputed window tables for many scalars on one base.

Analog of the reference's FixedBaseMSM
(reference: tachyon/math/elliptic_curves/msm/fixed_base_msm.h — used by
Groth16/KZG trusted-setup paths).  The table T[w][d] = [d * 2^(c*w)] G is
built once with exact host arithmetic; evaluation is a vectorized gather
(digits index the table) + a log-depth tree of EC adds over the window
axis — no doublings at all on the hot path.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.math.ec import AffinePoint, PointXYZZ, SWCurve
from tachyon_tpu.math.msm import _tree_reduce, digit_decompose


class FixedBaseMSM:
    def __init__(self, curve: SWCurve, base: tuple, c: int = 8):
        """base: affine (x, y) host ints."""
        self.curve = curve
        self.c = c
        bits = curve.SF.spec.bits
        self.W = (bits + c - 1) // c
        B = 1 << c
        p = curve.F.p
        a_int = curve.a_int

        def py_add(pt, q):
            if pt is None:
                return q
            if q is None:
                return pt
            x1, y1 = pt
            x2, y2 = q
            if x1 == x2 and (y1 + y2) % p == 0:
                return None
            if pt == q:
                lam = (3 * x1 * x1 + a_int) * pow(2 * y1, -1, p) % p
            else:
                lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
            x3 = (lam * lam - x1 - x2) % p
            y3 = (lam * (x1 - x3) - y1) % p
            return (x3, y3)

        # T[w][d] = d * 2^(c w) * G
        xs = np.zeros((self.W, B), dtype=object)
        ys = np.zeros((self.W, B), dtype=object)
        inf = np.zeros((self.W, B), dtype=bool)
        step = base
        for w in range(self.W):
            acc = None
            for d in range(B):
                if acc is None:
                    inf[w, d] = True
                else:
                    xs[w, d], ys[w, d] = acc
                acc = py_add(acc, step)
            # step <- 2^c * step
            for _ in range(c):
                step = py_add(step, step)
                if step is None:
                    break
            if step is None:
                step = base  # order exhausted; windows beyond are unused
        F = curve.F
        self.table = AffinePoint(
            F.encode(xs), F.encode(ys), jnp.asarray(inf)
        )  # coords (L, W, B)

    def run(self, scalars: jnp.ndarray) -> PointXYZZ:
        """scalars: (Ls, n) plain 16-bit limbs -> (batch n) of [s_i]G."""
        curve = self.curve
        digits = digit_decompose(
            scalars, curve.SF.spec.bits, self.c
        )  # (W, n)
        # gather the table rows: for each w, T[w][digit[w, i]]
        widx = jnp.arange(self.W)[:, None]
        sel = lambda t: t[..., widx, digits]  # (L, W, n) / (W, n) for inf
        pts = AffinePoint(
            sel(self.table.x), sel(self.table.y),
            self.table.inf[widx, digits],
        )
        xyzz = curve.to_xyzz(pts)  # coords (L, W, n)
        # reduce over the window axis (axis -2): move it last and tree-add
        moved = PointXYZZ(*(jnp.moveaxis(t, -2, -1) for t in xyzz))
        return _tree_reduce(curve, moved, self.W)
