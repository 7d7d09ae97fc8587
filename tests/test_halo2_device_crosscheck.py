"""Device kernels vs the halo2 host-exact pipeline on identical inputs
(the reference's CPU<->GPU correctness-test pattern, SURVEY §4.3: here the
bit-exact host implementation in zk/plonk/halo2.py is the oracle and the
JAX/TPU kernels are the production path)."""
import numpy as np
import pytest

from tachyon_tpu.crypto import kzg as kzg_mod
from tachyon_tpu.fields import presets
from tachyon_tpu.math import curves
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.ops import mont
from tachyon_tpu.zk.plonk import halo2

N = 16
TAU = 2


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_device_ntt_matches_host_on_halo2_domain(rng):
    Fr = curves.bn254_fr()
    omega = halo2.halo2_omega(4)
    dom = Radix2Domain(Fr, N, omega_int=omega)
    vals = [int(v) for v in rng.integers(1, 1 << 62, N)]
    enc = Fr.encode(np.array(vals, dtype=object))
    coeffs_dev = dom.ifft(enc)
    got = [int(v) for v in Fr.decode(coeffs_dev)]
    want = halo2.host_ifft(vals, omega)
    assert got == want
    back = dom.fft(coeffs_dev)
    assert [int(v) for v in Fr.decode(back)] == vals


@pytest.mark.slow
def test_device_kzg_commit_matches_host(rng):
    Fr = curves.bn254_fr()
    params = kzg_mod.unsafe_setup(N, tau=TAU)
    host = halo2.HostKZG(N, TAU)
    coeffs = [int(v) for v in rng.integers(1, 1 << 62, N)]
    enc = Fr.encode(np.array(coeffs, dtype=object))
    cm_dev = kzg_mod.to_int_point(
        kzg_mod.commit(params, mont.mont_reduce(Fr.spec, enc)))
    cm_host = host.commit(coeffs)
    assert tuple(map(int, cm_dev)) == cm_host
