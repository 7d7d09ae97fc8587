"""Multi-device tests on the 8-way virtual CPU mesh: sharded MSM and
distributed NTT must be bit-identical to the single-device results."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math import curves
from tachyon_tpu.math.msm import msm
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.parallel.mesh import data_mesh
from tachyon_tpu.parallel.msm_sharded import msm_sharded
from tachyon_tpu.parallel.ntt_dist import DistributedNTT


@pytest.fixture(autouse=True)
def _cpu_default():
    # keep array creation + compute on the virtual cpu devices
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture(scope="module")
def mesh():
    return data_mesh(8, platform="cpu")


def test_distributed_ntt_matches_local(mesh, rng):
    F = PrimeField(presets.BABY_BEAR)
    n = 256
    a = F.random((n,), rng)
    local = Radix2Domain(F, n).fft(a)
    dist = DistributedNTT(F, n, mesh).fft(a)
    assert bool(np.asarray(F.eq(local, dist)).all())
    back = DistributedNTT(F, n, mesh).ifft(dist)
    assert bool(np.asarray(F.eq(back, a)).all())


def test_sharded_msm_matches_local(mesh, rng):
    from tests.test_msm import build_test_set

    curve = curves.bn254_g1()
    points, sl, pts, scalars = build_test_set(curve, 16, rng)
    local = curve.to_affine(msm(curve, points, sl, c=4))
    shard = curve.to_affine(msm_sharded(curve, mesh, points, sl, c=4))
    assert bool(np.asarray(curve.eq_affine(local, shard)).all())


@pytest.mark.slow
def test_sharded_msm_above_naive_threshold(mesh, rng):
    """per-shard n exceeds MSM_NAIVE_THRESHOLD so every chip runs the real
    suffix-sweep Pippenger under shard_map, bit-identical to one device."""
    from tests.test_msm import build_test_set
    from tachyon_tpu.math.msm import MSM_NAIVE_THRESHOLD

    curve = curves.bn254_g1()
    n = 8 * 2 * MSM_NAIVE_THRESHOLD  # 256 points per shard on 8 devices
    points, sl, pts, scalars = build_test_set(curve, n, rng)
    local = curve.to_affine(msm(curve, points, sl, c=10))
    shard = curve.to_affine(msm_sharded(curve, mesh, points, sl, c=10))
    assert bool(np.asarray(curve.eq_affine(local, shard)).all())


@pytest.mark.slow
def test_sharded_msm_2d_matches_local(rng):
    """points x windows 2-D mesh (reference kParallelWindowAndTerm analog)."""
    from tests.test_msm import build_test_set
    from jax.sharding import Mesh
    from tachyon_tpu.parallel.msm_sharded import msm_sharded_2d

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh2d = Mesh(devs, ("dp", "win"))
    curve = curves.bn254_g1()
    points, sl, pts, scalars = build_test_set(curve, 16, rng)
    local = curve.to_affine(msm(curve, points, sl, c=4))
    shard = curve.to_affine(msm_sharded_2d(curve, mesh2d, points, sl, c=4))
    assert bool(np.asarray(curve.eq_affine(local, shard)).all())


@pytest.mark.slow
def test_sharded_msm_windows_matches_local(rng):
    """pure window-parallel mesh (reference kParallelWindow analog)."""
    from tests.test_msm import build_test_set
    from jax.sharding import Mesh
    from tachyon_tpu.parallel.msm_sharded import msm_sharded_windows

    devs = np.array(jax.devices("cpu")[:4]).reshape(4)
    meshw = Mesh(devs, ("win",))
    curve = curves.bn254_g1()
    points, sl, pts, scalars = build_test_set(curve, 16, rng)
    local = curve.to_affine(msm(curve, points, sl, c=4))
    shard = curve.to_affine(
        msm_sharded_windows(curve, meshw, points, sl, c=4)
    )
    assert bool(np.asarray(curve.eq_affine(local, shard)).all())
