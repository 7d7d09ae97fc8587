"""Pedersen vector commitment: <g, m> + r*h.

Analog of reference: tachyon/crypto/commitments/pedersen/pedersen.h.
Commit = one MSM on TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.fields.spec import int_to_limbs
from tachyon_tpu.math.ec import AffinePoint, SWCurve
from tachyon_tpu.math.msm import msm


class PedersenParams(NamedTuple):
    generators: AffinePoint  # (L, n) coords
    h: AffinePoint  # blinding generator (batch shape ())


def setup(curve: SWCurve, n: int, rng=None) -> PedersenParams:
    """random generators via hash-to-scalar multiples of G (dev setup)."""
    gens, _ = curve.random_affine(n + 1, rng)
    import jax

    g = jax.tree.map(lambda t: t[..., :n], gens)
    h = jax.tree.map(lambda t: t[..., n], gens)
    return PedersenParams(AffinePoint(*g), AffinePoint(*h))


def commit(curve: SWCurve, params: PedersenParams, msgs: jnp.ndarray, r: int):
    """msgs: (Ls, n) plain scalar limbs; r: blinding scalar int."""
    acc = msm(curve, params.generators, msgs)
    Ls = curve.SF.spec.L
    rl = jnp.asarray(int_to_limbs(r % curve.SF.p, Ls))[:, None]
    h_batched = AffinePoint(
        params.h.x[..., None], params.h.y[..., None], params.h.inf[None]
    )
    rh = msm(curve, h_batched, rl)
    return curve.add_xyzz(acc, rh)
