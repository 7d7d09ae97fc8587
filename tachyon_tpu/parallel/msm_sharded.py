"""Multi-chip MSM: point sharding over a device mesh.

TPU-native realization of the reference's kParallelTerm strategy
(reference: msm/algorithms/pippenger/pippenger_adapter.h:84-100 — split
points into chunks, run full Pippenger per chunk, add partial results),
lifted from threads to chips: each device runs the full vectorized
Pippenger on its point shard (tachyon_tpu.math.msm), partial results are
all-gathered over ICI (tiny: one XYZZ point per chip) and tree-added.

Field-element reductions stay exact: mod-p arithmetic is order-independent,
so the result is bit-deterministic regardless of mesh shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(fn, mesh, in_specs, out_specs):
    """check_vma/check_rep off: pallas_call out_shapes carry no vma info,
    and our regions are manually replicated-correct by construction."""
    try:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)

from tachyon_tpu.math.ec import AffinePoint, PointXYZZ, SWCurve
from tachyon_tpu.math.msm import msm, _tree_reduce


def msm_sharded(
    curve: SWCurve,
    mesh: Mesh,
    points: AffinePoint,
    scalars: jnp.ndarray,
    c: int | None = None,
    axis: str = "dp",
) -> PointXYZZ:
    """MSM with points/scalars sharded on the element axis over `mesh`."""
    n_dev = int(mesh.devices.size)
    cnd = points.x.ndim  # coord ndim: 2 for G1 (L,n), 3 for G2 (2,L,n)
    coord_in = P(*([None] * (cnd - 1)), axis)
    coord_out = P(*([None] * (cnd - 1)), axis)

    def local(pts, scal):
        acc = msm(curve, pts, scal, c=c)  # one XYZZ point, leaves (L,)/(2,L)
        return jax.tree.map(lambda t: t[..., None], acc)

    partials = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            AffinePoint(coord_in, coord_in, P(axis)),
            P(None, axis),
        ),
        out_specs=PointXYZZ(coord_out, coord_out, coord_out, coord_out),
    )(points, scalars)
    # partials: leaves (..., n_dev); combine with a log-depth tree
    return _tree_reduce(curve, partials, n_dev)


def msm_sharded_windows(
    curve: SWCurve,
    mesh: Mesh,
    points: AffinePoint,
    scalars: jnp.ndarray,
    c: int,
    window_axis: str = "win",
) -> PointXYZZ:
    """Pure window-parallel MSM (the reference's kParallelWindow,
    pippenger.h:157 / pippenger_adapter.h:15-35): points replicated, the
    Pippenger window axis sharded over the mesh — each chip accumulates
    buckets for its window block over ALL points."""
    return msm_sharded_2d(
        curve, mesh, points, scalars, c,
        point_axis=None, window_axis=window_axis,
    )


def msm_sharded_2d(
    curve: SWCurve,
    mesh: Mesh,
    points: AffinePoint,
    scalars: jnp.ndarray,
    c: int,
    point_axis: str | None = "dp",
    window_axis: str = "win",
) -> PointXYZZ:
    """2-D MSM sharding: points x windows (the reference's
    kParallelWindowAndTerm, pippenger_adapter.h:75-80, lifted to a 2-D chip
    mesh).  Each device runs bucket accumulation for ITS windows over ITS
    point shard, applies the window weight 2^(c*w) with a local doubling
    chain (removing the serial cross-window Horner), and the per-device
    partial points are tree-added.

    point_axis=None replicates the points (pure window parallelism,
    kParallelWindow).  scalars: (Ls, n) plain limbs; window count
    W = ceil(bits/c) must be divisible by the window-axis size.

    Combine strategy: every device emits its Wk *raw* window sums (balanced
    work, no local horner, no per-device weight chain), shard_map gathers
    the full (..., W, point_parts) partial grid, point partials are
    tree-added per window, and ONE replicated static-trip-count horner
    folds the W windows — W*c doublings total, identical on every chip.
    This replaces the earlier dynamic-bound 2^(c*w_lo) doubling chain
    (up to ~(W-Wk)*c serial doublings on the last window device) with a
    combine whose sequential depth equals the single-device horner's and
    whose per-device bucket work is perfectly balanced.
    """
    from tachyon_tpu.math.msm import (
        digit_decompose, _layout_and_blinds, _window_sum,
    )

    win_dev = mesh.shape[window_axis]
    total_bits = curve.SF.spec.bits
    W = (total_bits + c - 1) // c
    assert W % win_dev == 0, f"W={W} not divisible by win={win_dev}"
    Wk = W // win_dev
    B = 1 << c
    cnd = points.x.ndim
    coord_in = P(*([None] * (cnd - 1)), point_axis)  # point_axis=None: replicate

    def local(pts, scal):
        widx = jax.lax.axis_index(window_axis)
        digits = digit_decompose(scal, total_bits, c)  # (W, n_local)
        n_local = scal.shape[-1]
        C, R, (blind1, blind2) = _layout_and_blinds(curve, n_local)
        n_pad = R * C
        px, py, pinf = pts.x, pts.y, pts.inf.astype(jnp.uint32)
        if n_pad != n_local:
            pad = n_pad - n_local
            zpad = [(0, 0)] * (px.ndim - 1) + [(0, pad)]
            px = jnp.pad(px, zpad)
            py = jnp.pad(py, zpad)
            pinf = jnp.pad(pinf, [(0, pad)], constant_values=1)
            digits = jnp.pad(digits, [(0, 0), (0, pad)])

        from tachyon_tpu.math.msm import _pack_points

        packed = (
            _pack_points(px, py, pinf)
            if curve._pallas_ok and curve.F.L % 2 == 0 else None
        )

        def window_body(_, dw):
            return None, _window_sum(
                curve, px, py, pinf, dw, C, R, B, blind1, blind2,
                packed=packed,
            )

        # this device's Wk windows: rows widx*Wk .. widx*Wk+Wk-1
        my = jax.lax.dynamic_slice_in_dim(digits, widx * Wk, Wk, axis=0)
        _, wins = jax.lax.scan(window_body, None, my)
        # leaves (Wk, ...): window axis -> second-to-last, point-part axis
        # (size 1 locally) -> last
        return jax.tree.map(
            lambda t: jnp.moveaxis(t, 0, -1)[..., :, None], wins
        )

    pd = int(mesh.shape[point_axis]) if point_axis is not None else 1
    partials = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            AffinePoint(coord_in, coord_in, P(point_axis)),
            P(None, point_axis),
        ),
        out_specs=PointXYZZ(
            *([P(*([None] * (cnd - 1)), window_axis, point_axis)] * 4)
        ),
    )(points, scalars)  # leaves (..., W, pd)
    per_win = _tree_reduce(curve, partials, pd)  # (..., W)

    def horner_body(acc, win):
        acc = jax.lax.fori_loop(
            0, c, lambda i, a: curve.dbl_xyzz(a), acc, unroll=False
        )
        return curve.add_xyzz(acc, win), None

    rev = jax.tree.map(lambda t: jnp.moveaxis(t, -1, 0)[::-1], per_win)
    acc, _ = jax.lax.scan(horner_body, curve.infinity_xyzz(()), rev)
    return acc
