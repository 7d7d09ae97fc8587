"""Device (JAX/TPU) backend for the halo2 bit-compatible prover.

Plugs the framework's accelerator kernels — KZG commitments (Pippenger
MSM), radix-2 NTTs and coset evaluations — under the byte-exact pipeline
in zk/plonk/halo2.py.  The prover's control flow, transcript and identity
logic stay host-exact; the backend owns the asymptotically dominant
FFT/MSM work, mirroring how the reference hangs Icicle GPU kernels under
its C++ prover (reference: zk/plonk/halo2/prover.h + icicle offload in
msm/algorithms/icicle, polynomials/univariate/icicle).

Golden-tested: tests/test_halo2_golden.py::test_device_backend_proof —
the device-backed prover must produce the same proof bytes as the host
oracle (and therefore as the reference)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import kzg as kzg_mod
from tachyon_tpu.math import curves
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.ops import mont


class DeviceBackend:
    """Implements the HostBackend primitive surface with device kernels."""

    def __init__(self, pk):
        self.pk = pk
        self.Fr = curves.bn254_fr()
        self.params = kzg_mod.unsafe_setup(pk.n, tau=pk.kzg.tau)
        self.dom = Radix2Domain(self.Fr, pk.n, omega_int=pk.omega)

    # --- helpers ------------------------------------------------------------
    def _encode(self, ints):
        return self.Fr.encode(np.array([int(v) for v in ints], dtype=object))

    def _decode(self, arr):
        return [int(v) for v in np.asarray(self.Fr.decode(arr))]

    # --- primitive surface ----------------------------------------------------
    def commit_lagrange(self, evals):
        coeffs = self.dom.ifft(self._encode(evals))
        return self._commit_enc(coeffs)

    def commit(self, coeffs):
        return self._commit_enc(self._encode(coeffs))

    def _commit_enc(self, coeffs_enc):
        std = mont.mont_reduce(self.Fr.spec, coeffs_enc)
        return kzg_mod.to_int_point(kzg_mod.commit(self.params, std))

    def ifft(self, evals):
        return self._decode(self.dom.ifft(self._encode(evals)))

    def coset_evals(self, coeffs, shift):
        n = self.pk.n
        cf = list(coeffs) + [0] * (n - len(coeffs))
        return self._decode(self.dom.coset_fft(self._encode(cf), int(shift)))
