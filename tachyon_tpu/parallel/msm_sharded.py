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
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

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
