"""Uni-STARK prover/verifier over TwoAdicFRI (Plonky3/SP1 architecture).

Analog of the reference's SP1 AIR path
(reference: tachyon/c/zk/air/sp1/baby_bear_poseidon2_two_adic_fri.cc — the
PCS objects the SP1 uni-stark drives; constraint layer zk/air/).  Flow:

  prove:  commit(trace) -> alpha -> quotient Q = fold_alpha(C)/Z_H over an
          extended coset -> commit(Q chunks) -> zeta -> PCS multi-round
          open of trace@{zeta, zeta*w} and Q@{zeta}
  verify: replay challenges, PCS verify, then check
          fold_alpha(C)(zeta) == Q(zeta) * Z_H(zeta)   (host-exact ext math)

All column algebra (trace LDE, constraint evaluation, Z_H division, chunk
FFTs) is vectorized on device; transcript/challenger logic is host-exact.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tachyon_tpu.crypto import merkle
from tachyon_tpu.crypto.challenger import DuplexChallenger
from tachyon_tpu.crypto.fri import FRIProof, TwoAdicFRIPCS, ext_powers
from tachyon_tpu.math.extfield import HostExt
from tachyon_tpu.math.ntt import Radix2Domain
from tachyon_tpu.zk.air import expressions as ax


class STARKProof(NamedTuple):
    trace_root: jnp.ndarray  # (L, DIGEST) MMCS commitment
    quotient_root: jnp.ndarray
    opened_values: tuple  # [round][matrix][point]: (D, L, C) claimed evals
    fri: FRIProof
    n: int  # trace height


def _observe_root(F, challenger, root):
    root = np.asarray(root)  # one device->host transfer per root
    for i in range(merkle.DIGEST):
        challenger.observe(int(F.decode(root[:, i])))


class UniStark:
    def __init__(self, pcs: TwoAdicFRIPCS, air: ax.AirBuilder):
        self.pcs = pcs
        self.air = air
        self.F = pcs.F
        self.ext = pcs.ext
        self.hx = HostExt(pcs.ext)

    # -- degree bookkeeping: units of n (Main/First/Last/Transition ~ deg n)
    def _ext_factor(self) -> int:
        d = max((ax.degree(c) for c in self.air.constraints), default=2)
        return 1 << max(1, (max(d, 2) - 1).bit_length())

    def _num_chunks(self) -> int:
        d = max((ax.degree(c) for c in self.air.constraints), default=2)
        return max(d - 1, 1)

    # ------------------------------------------------------------------ prove
    def prove(
        self,
        trace_ints: np.ndarray,  # (n, width) object array of python ints
        public_values: list[int],
        challenger: DuplexChallenger,
    ) -> STARKProof:
        F, ext, pcs, hx = self.F, self.ext, self.pcs, self.hx
        D = ext.D
        n, width = trace_ints.shape
        assert width == self.air.width
        p = F.p
        dom = Radix2Domain(F, n)
        omega = dom.omega_int

        challenger.observe(n)
        for v in public_values:
            challenger.observe(int(v) % p)

        trace = F.encode(np.asarray(trace_ints, dtype=object))  # (L, n, W)
        trace_data = pcs.commit([trace])
        _observe_root(F, challenger, trace_data.root())
        alpha_int = challenger.sample_ext(D)
        alpha = ext.encode([np.array(c, dtype=object) for c in alpha_int])

        # --- quotient over extended coset ---------------------------------
        ext_factor = self._ext_factor()
        big_n = n * ext_factor
        big = Radix2Domain(F, big_n)
        shift = F.spec.generator

        trace_coeffs = dom.ifft(trace)
        pad = jnp.zeros(
            (trace_coeffs.shape[0], big_n - n) + trace_coeffs.shape[2:],
            trace_coeffs.dtype,
        )
        trace_ext = big.coset_fft(
            jnp.concatenate([trace_coeffs, pad], axis=1), shift
        )  # (L, big_n, W)

        # selectors as exact polynomial LDEs
        def indicator_ext(row: int):
            e = np.zeros((n,), dtype=object)
            e[row] = 1
            cf = dom.ifft(F.encode(e))
            padc = jnp.zeros((cf.shape[0], big_n - n), cf.dtype)
            return big.coset_fft(jnp.concatenate([cf, padc], axis=1), shift)

        l0_ext = indicator_ext(0)
        llast_ext = indicator_ext(n - 1)
        wp = big.shift_powers(big.omega_int, big_n)  # (L, big_n): w^i
        xs = F.mul(wp, F.full((), shift)[:, None])  # coset points
        wlast = F.full((big_n,), pow(omega, n - 1, p))
        trans_ext = F.sub(xs, wlast)

        evaluator = _ColumnEvaluator(
            F, trace_ext, ext_factor, l0_ext, llast_ext, trans_ext,
            public_values, big_n,
        )
        acc = None
        for c in self.air.constraints:
            v = ext.embed(evaluator.eval(c))  # (D, L, big_n)
            acc = v if acc is None else ext.add(
                ext.mul(acc, alpha[..., None]), v
            )
        if acc is None:
            acc = ext.zeros((big_n,))

        # divide by Z_H on the coset (periodic values, period ext_factor)
        sn = pow(shift, n, p)
        wn = pow(big.omega_int, n, p)
        zh_inv_vals = np.array(
            [pow((sn * pow(wn, i, p) - 1) % p, p - 2, p)
             for i in range(ext_factor)],
            dtype=object,
        )
        zh_inv = jnp.tile(F.encode(zh_inv_vals), (1, n))
        q_ext = ext.mul_base(acc, zh_inv)  # (D, L, big_n)

        q_coeffs = jnp.stack(
            [big.coset_ifft(q_ext[d], shift) for d in range(D)], axis=0
        )
        num_chunks = self._num_chunks()
        cols = []
        for k in range(num_chunks):
            chunk = q_coeffs[:, :, k * n : (k + 1) * n]
            for d in range(D):
                cols.append(dom.fft(chunk[d]))  # (L, n) evals over H_n
        q_mat = jnp.stack(cols, axis=-1)  # (L, n, num_chunks*D)
        q_data = pcs.commit([q_mat])
        _observe_root(F, challenger, q_data.root())

        zeta = challenger.sample_ext(D)
        zeta_next = hx.mul(zeta, omega)
        opened_values, fri = pcs.create_opening_proof(
            [trace_data, q_data],
            [[[zeta, zeta_next]], [[zeta]]],
            challenger,
        )
        return STARKProof(
            trace_root=trace_data.root(),
            quotient_root=q_data.root(),
            opened_values=opened_values,
            fri=fri,
            n=n,
        )

    # ----------------------------------------------------------------- verify
    def verify(
        self,
        proof: STARKProof,
        public_values: list[int],
        challenger: DuplexChallenger,
    ) -> bool:
        F, ext, pcs, hx = self.F, self.ext, self.pcs, self.hx
        D = ext.D
        n = proof.n
        p = F.p
        dom = Radix2Domain(F, n)
        omega = dom.omega_int
        blow = pcs.cfg.log_blowup
        width = self.air.width
        num_chunks = self._num_chunks()

        challenger.observe(n)
        for v in public_values:
            challenger.observe(int(v) % p)
        _observe_root(F, challenger, proof.trace_root)
        alpha = challenger.sample_ext(D)
        _observe_root(F, challenger, proof.quotient_root)
        zeta = challenger.sample_ext(D)
        zeta_next = hx.mul(zeta, omega)

        points = [[[zeta, zeta_next]], [[zeta]]]
        if not pcs.verify_opening_proof(
            [proof.trace_root, proof.quotient_root],
            [[(n, width)], [(n, num_chunks * D)]],
            points,
            proof.opened_values,
            proof.fri,
            challenger,
        ):
            return False

        def decode_ext_row(ov, c):  # ov: (D, L, C), host numpy
            return [int(F.decode(ov[d, :, c])) for d in range(D)]

        ov_local = np.asarray(proof.opened_values[0][0][0])
        ov_next = np.asarray(proof.opened_values[0][0][1])
        ov_q = np.asarray(proof.opened_values[1][0][0])
        local = [decode_ext_row(ov_local, c) for c in range(width)]
        nxt = [decode_ext_row(ov_next, c) for c in range(width)]
        q_open = [decode_ext_row(ov_q, c) for c in range(num_chunks * D)]

        # selector values at zeta (exact)
        zeta_n = hx.pow(zeta, n)
        zh = hx.sub(zeta_n, 1)
        ninv = pow(n, p - 2, p)
        l0 = hx.mul(hx.mul(zh, hx.inv(hx.sub(zeta, 1))), ninv)
        wl = pow(omega, n - 1, p)
        llast = hx.mul(
            hx.mul(hx.mul(zh, hx.inv(hx.sub(zeta, wl))), ninv), wl
        )
        trans = hx.sub(zeta, wl)

        sev = _ScalarAirEvaluator(
            hx, local, nxt, l0, llast, trans, public_values
        )
        acc = None
        for c in self.air.constraints:
            v = sev.eval(c)
            acc = v if acc is None else hx.add(hx.mul(acc, alpha), v)
        if acc is None:
            acc = hx.e(0)

        # Q(zeta) = sum_k zeta^{kn} * sum_d u^d * y_{k,d}
        u_pow = [hx.pow([0, 1] + [0] * (D - 2), d) for d in range(D)]
        q_at = hx.e(0)
        z_pow_n = hx.pow(zeta, n)
        zk = hx.e(1)
        for k in range(num_chunks):
            chunk_val = hx.e(0)
            for d in range(D):
                chunk_val = hx.add(
                    chunk_val, hx.mul(u_pow[d], q_open[k * D + d])
                )
            q_at = hx.add(q_at, hx.mul(zk, chunk_val))
            zk = hx.mul(zk, z_pow_n)
        return acc == hx.mul(q_at, zh)


class _ColumnEvaluator:
    """vectorized AIR AST evaluation over the quotient coset."""

    def __init__(self, F, trace_ext, rot, l0, llast, trans, pubs, big_n):
        self.F = F
        self.trace_ext = trace_ext  # (L, big_n, W)
        self.rot = rot
        self.l0 = l0
        self.llast = llast
        self.trans = trans
        self.pubs = pubs
        self.big_n = big_n

    def eval(self, e):
        F = self.F
        if isinstance(e, ax.Constant):
            return F.full((self.big_n,), e.value)
        if isinstance(e, ax.Main):
            col = self.trace_ext[:, :, e.column]
            return jnp.roll(col, -self.rot, axis=1) if e.next else col
        if isinstance(e, ax.Pub):
            return F.full((self.big_n,), int(self.pubs[e.index]))
        if isinstance(e, ax.First):
            return self.l0
        if isinstance(e, ax.Last):
            return self.llast
        if isinstance(e, ax.Transition):
            return self.trans
        if isinstance(e, ax.Negated):
            return F.neg(self.eval(e.expr))
        if isinstance(e, ax.Sum):
            return F.add(self.eval(e.left), self.eval(e.right))
        if isinstance(e, ax.Product):
            return F.mul(self.eval(e.left), self.eval(e.right))
        raise TypeError(e)


class _ScalarAirEvaluator:
    """host-exact AST evaluation at a single extension point."""

    def __init__(self, hx, local, nxt, l0, llast, trans, pubs):
        self.hx = hx
        self.local = local
        self.nxt = nxt
        self.l0 = l0
        self.llast = llast
        self.trans = trans
        self.pubs = pubs

    def eval(self, e):
        hx = self.hx
        if isinstance(e, ax.Constant):
            return hx.e(e.value)
        if isinstance(e, ax.Main):
            return self.nxt[e.column] if e.next else self.local[e.column]
        if isinstance(e, ax.Pub):
            return hx.e(int(self.pubs[e.index]))
        if isinstance(e, ax.First):
            return self.l0
        if isinstance(e, ax.Last):
            return self.llast
        if isinstance(e, ax.Transition):
            return self.trans
        if isinstance(e, ax.Negated):
            return hx.neg(self.eval(e.expr))
        if isinstance(e, ax.Sum):
            return hx.add(self.eval(e.left), self.eval(e.right))
        if isinstance(e, ax.Product):
            return hx.mul(self.eval(e.left), self.eval(e.right))
        raise TypeError(e)
