"""Mesh helpers for multi-chip scaling.

The reference is a single-process library (SURVEY §2.8): its parallelism is
OpenMP threads + GPU offload.  The TPU-native scaling story replaces both:
jax.sharding meshes + XLA collectives over ICI.  These helpers build the
standard meshes used by the sharded MSM / distributed NTT paths.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(
    n_devices: int | None = None, axis: str = "dp", platform: str | None = None
) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_points_spec():
    """points/scalars sharded along the element axis (last)."""
    return P(None, "dp")
