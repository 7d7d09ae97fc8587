"""Distributed NTT over a device mesh (four-step / transpose algorithm).

The reference's FFT scales by OpenMP row-chunks within one node
(reference: radix2_evaluation_domain.h:290-460 RunParallelRowChunks); beyond
one device it has no story (SURVEY §5 "long-context analog").  This module
is the TPU-native replacement: the classic four-step decomposition
n = n1*n2 with the inter-chip transpose as one `all_to_all` over ICI:

  1. local length-n2 FFTs (j1 sharded across devices),
  2. twiddle by w^(j1*k2)  (w-powers table passed in sharded, so no
     device-id arithmetic inside the kernel),
  3. all_to_all transpose,
  4. local length-n1 FFTs.

Exactness: all arithmetic is mod-p, so the distributed result is
bit-identical to the single-chip Radix2Domain FFT.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
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

from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.ntt import Radix2Domain


class DistributedNTT:
    def __init__(self, F: PrimeField, n: int, mesh: Mesh, axis: str = "dp"):
        self.F = F
        self.n = n
        self.mesh = mesh
        self.axis = axis
        D = int(mesh.devices.size)
        self.D = D
        # n = n1 * n2 (both powers of two, both divisible by D); j1 sharded
        log_n = n.bit_length() - 1
        log_d = D.bit_length() - 1
        assert D & (D - 1) == 0 and n >= D * D, "need pow2 mesh and n >= D^2"
        log_n1 = max(log_d, log_n // 2)
        self.n1 = 1 << log_n1
        self.n2 = n >> log_n1
        assert self.n1 % D == 0 and self.n2 % D == 0, (self.n1, self.n2, D)
        self.dom1 = Radix2Domain(F, self.n1)
        self.dom2 = Radix2Domain(F, self.n2)
        self.omega = F.spec.root_of_unity(n)

    def _wpow(self, inverse: bool) -> jnp.ndarray:
        """(L, n1) table w^j1 (or w^-j1)."""
        F = self.F
        w = pow(self.omega, self.n - 1, F.p) if inverse else self.omega
        dom = Radix2Domain(F, self.n)  # reuse shift_powers helper
        return dom.shift_powers(w, self.n1)

    def _transform(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """x: (L, n) natural-order global array -> same, FFT'd."""
        F, n1, n2, D, ax = self.F, self.n1, self.n2, self.D, self.axis
        L = x.shape[0]
        xr = x.reshape(L, n2, n1)  # [:, j2, j1]
        wpow = self._wpow(inverse)  # (L, n1)

        def local(xl, wl):
            # xl: (L, n2, n1/D); wl: (L, n1/D)
            y = self.dom2._transform(xl, inverse)  # FFT along axis 1 (j2)
            # twiddle: t[k2, j1] = (w^j1)^k2
            n1l = wl.shape[-1]
            tab = F.ones((1, n1l))
            cur = wl[:, None, :]
            while tab.shape[1] < n2:
                tab = jnp.concatenate([tab, F.mul(tab, cur)], axis=1)
                cur = F.square(cur)
            y = F.mul(y, tab[:, :n2])
            # transpose across devices: (L, n2, n1/D) -> (L, n2/D, n1)
            y = jax.lax.all_to_all(y, ax, split_axis=1, concat_axis=2, tiled=True)
            # outer FFT over j1 (last axis): move to axis 1 for _transform
            y = jnp.moveaxis(y, 2, 1)  # (L, n1, n2/D)
            y = self.dom1._transform(y, inverse)
            return jnp.moveaxis(y, 1, 2)  # (L, n2/D, n1)

        out = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, None, ax), P(None, ax)),
            out_specs=P(None, ax, None),
        )(xr, wpow)
        # out[:, k2, k1] -> natural X[k2 + n2*k1]: transpose to (n1, n2).
        # (inverse scaling 1/n = 1/n1 * 1/n2 is already applied by the two
        # local inverse sub-transforms.)
        return jnp.transpose(out, (0, 2, 1)).reshape(L, self.n)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self._transform(coeffs, inverse=False)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._transform(evals, inverse=True)


class DistributedCosetLDE:
    """Multi-chip CosetLDEBatch / FFTBatch (reference semantics:
    radix2_evaluation_domain.h:100-145 FFTBatch/CosetLDEBatch — many
    polynomials at once; the reference parallelizes row chunks with OpenMP
    within one node, here the batch axis is sharded over the mesh and each
    chip runs the full small-domain iFFT + zero-pad + big-domain coset FFT
    on its column shard).

    The batch (column) axis is embarrassingly parallel, so this scales the
    dominant FRI-commit workload (LDE of 10s-100s of trace columns) with
    zero collectives beyond the initial shard; bit-exact vs the single-chip
    math.ntt.coset_lde_batch by construction.
    """

    def __init__(self, F: PrimeField, n: int, log_blowup: int,
                 shift_int: int, mesh: Mesh, axis: str = "dp"):
        self.F = F
        self.n = n
        self.log_blowup = log_blowup
        self.shift_int = shift_int
        self.mesh = mesh
        self.axis = axis
        self.dom = Radix2Domain(F, n)

    def __call__(self, evals: jnp.ndarray) -> jnp.ndarray:
        """evals: (L, n, batch) on H -> (L, n<<log_blowup, batch) on
        shift*H' with the batch axis sharded over the mesh."""
        from tachyon_tpu.math.ntt import coset_lde_batch

        ax = self.axis

        def local(ev):
            return coset_lde_batch(self.dom, ev, self.log_blowup,
                                   self.shift_int)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, None, ax),),
            out_specs=P(None, None, ax),
        )(evals)


def fft_batch_dist(F: PrimeField, mesh: Mesh, evals: jnp.ndarray,
                   inverse: bool = False, axis: str = "dp") -> jnp.ndarray:
    """Distributed FFTBatch (reference: radix2_evaluation_domain.h:100
    FFTBatch): (L, n, batch) with batch sharded; per-chip full-length
    radix-2 transforms along axis 1."""
    n = evals.shape[1]
    dom = Radix2Domain(F, n)

    def local(ev):
        return dom._transform(ev, inverse)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis),),
        out_specs=P(None, None, axis),
    )(evals)
