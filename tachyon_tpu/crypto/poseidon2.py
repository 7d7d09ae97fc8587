"""Poseidon2 permutation & sponge, vectorized over a batch of states.

TPU-native analog of the reference's Poseidon2Sponge
(reference: tachyon/crypto/hashes/sponge/poseidon2/poseidon2.h,
poseidon2_config.h FindPoseidon2ARK, poseidon2_{horizen,plonky3}_{external,
internal}_matrix.h).  The packed-field SIMD kernels of the reference map to
plain batched jnp ops here: state has shape (L, t, *batch) so every round is
a handful of full-width vector ops regardless of batch size.

Round constants are derived with the arkworks Grain LFSR (same spec =>
bit-identical parameters); internal matrices support both the Horizen flavor
(M_I = J + diag(d)) and the Plonky3 monty flavor (M_I = R^{-1}(J + diag(d)),
d = [-2, 2^s1, 2^s2, ...]) so hashes match horizen-labs/plonky3 vectors.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tachyon_tpu.crypto.grain import GrainLFSR
from tachyon_tpu.math.field import PrimeField


class Poseidon2:
    def __init__(
        self,
        F: PrimeField,
        width: int,
        alpha: int,
        full_rounds: int,
        partial_rounds: int,
        internal: str,  # "horizen" | "plonky3"
        internal_diag: list[int] | None = None,  # horizen: d_i (mu_i - 1)
        internal_shifts: list[int] | None = None,  # plonky3: width-1 shifts
        external: str = "plonky3",  # "plonky3" | "horizen"
    ):
        self.F = F
        self.t = width
        self.alpha = alpha
        self.full_rounds = full_rounds
        self.partial_rounds = partial_rounds
        self.internal = internal
        self.external = external
        p = F.p

        # --- round constants via grain LFSR (FindPoseidon2ARK) -------------
        lfsr = GrainLFSR(F.spec.bits, width, full_rounds, partial_rounds)
        half = full_rounds // 2
        full_ark, partial_ark = [], []
        for i in range(full_rounds + partial_rounds):
            if i < half or i >= half + partial_rounds:
                full_ark.append(lfsr.field_elements_rejection_sampling(p, width))
            else:
                partial_ark.append(lfsr.field_elements_rejection_sampling(p, 1)[0])
        self.ark_full_host = full_ark
        self.ark_partial_host = partial_ark
        self.ark_full = F.encode(np.array(full_ark, dtype=object))  # (L, FR, t)
        self.ark_partial = F.encode(np.array(partial_ark, dtype=object))  # (L, PR)

        # --- internal matrix constants ---------------------------------------
        if internal == "horizen":
            assert internal_diag is not None and len(internal_diag) == width
            self.int_diag_host = [int(x) % p for x in internal_diag]
            self.int_rinv_host = None
            self.int_diag = F.encode(np.array(internal_diag, dtype=object))
            self.int_rinv = None
        else:
            assert internal_shifts is not None and len(internal_shifts) == width - 1
            rinv = pow(1 << 32, -1, p) if F.spec.p != (1 << 31) - 1 else 1
            d = [(-2) % p] + [(1 << s) % p for s in internal_shifts]
            # fold the R^{-1} of the plonky3 monty kernel into the constants
            self.int_diag_host = [(x * rinv) % p for x in d]
            self.int_rinv_host = rinv
            self.int_diag = F.encode(np.array(self.int_diag_host, dtype=object))
            self.int_rinv = F.encode(np.array(rinv, dtype=object))

    # --- pieces ------------------------------------------------------------------
    def _sbox(self, x):
        F, a = self.F, self.alpha
        x2 = F.square(x)
        if a == 3:
            return F.mul(x2, x)
        if a == 5:
            return F.mul(F.square(x2), x)
        if a == 7:
            return F.mul(F.mul(F.square(x2), x2), x)
        if a == 11:
            x4 = F.square(x2)
            return F.mul(F.mul(F.square(x4), x2), x)
        raise ValueError(f"alpha {a}")

    def _mix_external(self, st):
        """M_E apply on (L, t, *batch). t in {2,3} or multiple of 4."""
        F, t = self.F, self.t
        if t == 2:
            s = F.add(st[:, 0], st[:, 1])
            return jnp.stack([F.add(st[:, 0], s), F.add(st[:, 1], s)], axis=1)
        if t == 3:
            s = F.add(F.add(st[:, 0], st[:, 1]), st[:, 2])
            return jnp.stack([F.add(st[:, i], s) for i in range(3)], axis=1)
        assert t % 4 == 0
        blocks = st.reshape(st.shape[0], t // 4, 4, *st.shape[2:])
        v0, v1, v2, v3 = (blocks[:, :, i] for i in range(4))
        if self.external == "plonky3":
            # M4 = circ(2,3,1,1)-style (poseidon2_plonky3_external_matrix.h)
            t0 = F.add(v0, v1)
            t1 = F.add(v2, v3)
            t2 = F.add(t0, t1)
            t3 = F.add(t2, v1)
            t4 = F.add(t2, v3)
            n3 = F.add(t4, F.double(v0))
            n1 = F.add(t3, F.double(v2))
            n0 = F.add(t3, t0)
            n2 = F.add(t4, t1)
        else:
            # horizen M4 (poseidon2_horizen_external_matrix.h)
            t0 = F.add(v0, v1)
            t1 = F.add(v2, v3)
            t2 = F.add(F.double(v1), t1)
            t3 = F.add(F.double(v3), t0)
            n3 = F.add(F.double(F.double(t1)), t3)
            n1 = F.add(F.double(F.double(t0)), t2)
            n0 = F.add(t3, n1)
            n2 = F.add(t2, n3)
        out = jnp.stack([n0, n1, n2, n3], axis=2).reshape(st.shape)
        if t == 4:
            return out
        # block-circulant: out_i += sum of out over blocks (per 4-lane)
        csum = out.reshape(st.shape[0], t // 4, 4, *st.shape[2:])
        tot = csum[:, 0]
        for b in range(1, t // 4):
            tot = F.add(tot, csum[:, b])
        res = F.add(csum, tot[:, None])
        return res.reshape(st.shape)

    def _mix_internal(self, st):
        F, t = self.F, self.t
        s = st[:, 0]
        for i in range(1, t):
            s = F.add(s, st[:, i])
        diag = self.int_diag.reshape(
            self.int_diag.shape[:2] + (1,) * (st.ndim - 2)
        )
        scaled = F.mul(st, diag)
        if self.int_rinv is None:  # horizen: v_i * d_i + sum
            return F.add(scaled, s[:, None])
        rinv = self.int_rinv.reshape(
            (self.int_rinv.shape[0],) + (1,) * (s.ndim - 1)
        )
        return F.add(scaled, F.mul(s, rinv)[:, None])

    # --- permutation -----------------------------------------------------------------
    def permute(self, state: jnp.ndarray) -> jnp.ndarray:
        """state: (L, t, *batch) Montgomery-form -> same."""
        F, t = self.F, self.t
        half = self.full_rounds // 2
        st = self._mix_external(state)
        bshape = (1,) * (state.ndim - 2)

        def full_round(st, rc):  # rc: (L, t)
            st = F.add(st, rc.reshape(rc.shape + bshape))
            st = self._sbox(st)
            return self._mix_external(st), None

        def partial_round(st, rc):  # rc: (L,)
            x0 = F.add(st[:, 0], rc.reshape(rc.shape + bshape))
            x0 = self._sbox(x0)
            st = jnp.concatenate([x0[:, None], st[:, 1:]], axis=1)
            return self._mix_internal(st), None

        ark_f = jnp.moveaxis(self.ark_full, 1, 0)  # (FR, L, t)
        ark_p = jnp.moveaxis(self.ark_partial, 1, 0)  # (PR, L)
        st, _ = jax.lax.scan(full_round, st, ark_f[:half])
        st, _ = jax.lax.scan(partial_round, st, ark_p)
        st, _ = jax.lax.scan(full_round, st, ark_f[half:])
        return st

    # --- host-exact permutation (sequential challenger/transcript logic) ----
    def _mix_external_host(self, st: list) -> list:
        p, t = self.F.p, self.t
        if t == 2:
            s = (st[0] + st[1]) % p
            return [(st[0] + s) % p, (st[1] + s) % p]
        if t == 3:
            s = sum(st) % p
            return [(v + s) % p for v in st]
        out = [0] * t
        for b in range(0, t, 4):
            v0, v1, v2, v3 = st[b : b + 4]
            if self.external == "plonky3":
                t0 = v0 + v1
                t1 = v2 + v3
                t2 = t0 + t1
                t3 = t2 + v1
                t4 = t2 + v3
                n3 = (t4 + 2 * v0) % p
                n1 = (t3 + 2 * v2) % p
                n0 = (t3 + t0) % p
                n2 = (t4 + t1) % p
            else:
                t0 = v0 + v1
                t1 = v2 + v3
                t2 = 2 * v1 + t1
                t3 = 2 * v3 + t0
                n3 = (4 * t1 + t3) % p
                n1 = (4 * t0 + t2) % p
                n0 = (t3 + n1) % p
                n2 = (t2 + n3) % p
            out[b : b + 4] = [n0, n1, n2, n3]
        if t == 4:
            return out
        tot = [0] * 4
        for b in range(0, t, 4):
            for i in range(4):
                tot[i] = (tot[i] + out[b + i]) % p
        return [(out[b + i] + tot[i]) % p for b in range(0, t, 4) for i in range(4)]

    def _mix_internal_host(self, st: list) -> list:
        p = self.F.p
        s = sum(st) % p
        if self.int_rinv_host is None:
            return [(v * d + s) % p for v, d in zip(st, self.int_diag_host)]
        sr = s * self.int_rinv_host % p
        return [(v * d + sr) % p for v, d in zip(st, self.int_diag_host)]

    def permute_host(self, state: list) -> list:
        """Exact host-int permutation — same map as `permute` on canonical
        values.  Used by DuplexChallenger and transcripts, where per-call
        device dispatch would dominate the sequential Fiat-Shamir loop."""
        p, a = self.F.p, self.alpha
        half = self.full_rounds // 2
        st = self._mix_external_host([int(v) % p for v in state])
        fr_i = 0
        for _ in range(half):
            rc = self.ark_full_host[fr_i]
            fr_i += 1
            st = [pow((v + c) % p, a, p) for v, c in zip(st, rc)]
            st = self._mix_external_host(st)
        for rc in self.ark_partial_host:
            st[0] = pow((st[0] + rc) % p, a, p)
            st = self._mix_internal_host(st)
        for _ in range(half):
            rc = self.ark_full_host[fr_i]
            fr_i += 1
            st = [pow((v + c) % p, a, p) for v, c in zip(st, rc)]
            st = self._mix_external_host(st)
        return st

    # --- sponge / compression helpers ----------------------------------------------
    def hash_no_pad(
        self, inputs: jnp.ndarray, out_len: int, rate: int | None = None
    ) -> jnp.ndarray:
        """PaddingFreeSponge (reference: sponge/padding_free_sponge.h):
        absorb rate-sized chunks in overwrite mode, squeeze first out_len.
        inputs: (L, n, *batch)."""
        F, t = self.F, self.t
        if rate is None:
            rate = 8 if t == 16 else t - 1  # p3 uses rate 8 for width 16
        rate = min(rate, t)
        n = inputs.shape[1]
        batch = inputs.shape[2:]
        st = F.zeros((t, *batch))
        for off in range(0, n, rate):
            chunk = inputs[:, off : off + rate]
            k = chunk.shape[1]
            st = jnp.concatenate(
                [chunk, st[:, k:]], axis=1
            )  # overwrite mode (p3 PaddingFreeSponge)
            st = self.permute(st)
        return st[:, :out_len]

    def compress(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """TruncatedPermutation 2-to-1 (reference: truncated_permutation.h):
        state = concat(l, r) (zero pad), permute, take first len(l)."""
        F, t = self.F, self.t
        k = left.shape[1]
        batch = left.shape[2:]
        pad = F.zeros((t - 2 * k, *batch)) if t > 2 * k else None
        parts = [left, right] + ([pad] if pad is not None else [])
        st = jnp.concatenate(parts, axis=1)
        return self.permute(st)[:, :k]


# ---- standard instances (params from the reference's param_traits) -----------
@functools.lru_cache(maxsize=None)
def baby_bear_p3_w16() -> Poseidon2:
    """Plonky3/SP1 BabyBear width-16 (param_traits/poseidon2_baby_bear.h)."""
    from tachyon_tpu.fields import presets

    return Poseidon2(
        PrimeField(presets.BABY_BEAR),
        width=16,
        alpha=7,
        full_rounds=8,
        partial_rounds=13,
        internal="plonky3",
        internal_shifts=[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15],
        external="plonky3",
    )


@functools.lru_cache(maxsize=None)
def baby_bear_w16_horizen_ext() -> Poseidon2:
    """BabyBear w16 with Horizen external matrix (reference unittest flavor)."""
    from tachyon_tpu.fields import presets

    return Poseidon2(
        PrimeField(presets.BABY_BEAR),
        width=16,
        alpha=7,
        full_rounds=8,
        partial_rounds=13,
        internal="plonky3",
        internal_shifts=[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15],
        external="horizen",
    )


GOLDILOCKS_W8_DIAG = [
    0xA98811A1FED4E3A5,
    0x1CC48B54F377E2A0,
    0xE40CD4F6C5609A26,
    0x11DE79EBCA97A4A3,
    0x9177C73D8B7E929C,
    0x2A6FE8085797E791,
    0x3DE6E93329F8D5AD,
    0x3F7AF9125DA962FE,
]


@functools.lru_cache(maxsize=None)
def goldilocks_w8() -> Poseidon2:
    """Goldilocks width-8 Horizen flavor (param_traits/poseidon2_goldilocks.h)."""
    from tachyon_tpu.fields import presets

    return Poseidon2(
        PrimeField(presets.GOLDILOCKS),
        width=8,
        alpha=7,
        full_rounds=8,
        partial_rounds=22,
        internal="horizen",
        internal_diag=GOLDILOCKS_W8_DIAG,
        external="horizen",
    )


@functools.lru_cache(maxsize=None)
def bn254_w3() -> Poseidon2:
    """BN254 Fr width-3 Horizen flavor (param_traits/poseidon2_bn254.h)."""
    from tachyon_tpu.fields import presets

    return Poseidon2(
        PrimeField(presets.BN254_FR),
        width=3,
        alpha=5,
        full_rounds=8,
        partial_rounds=56,
        internal="horizen",
        internal_diag=[1, 1, 2],
        external="horizen",
    )
