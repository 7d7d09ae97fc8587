"""Challengers (Fiat-Shamir for the STARK/FRI path), Plonky3-compatible.

TPU-native analog of the reference's challenger suite
(reference: tachyon/crypto/challenger/{challenger.h,duplex_challenger.h,
hash_challenger.h}).  The challenger is inherently sequential host logic;
state permutations run as single-state device calls (jitted once).
"""
from __future__ import annotations

import jax
import numpy as np

from tachyon_tpu.crypto.poseidon2 import Poseidon2


class DuplexChallenger:
    """Duplex sponge challenger (reference: duplex_challenger.h)."""

    def __init__(self, perm: Poseidon2, rate: int):
        self.perm = perm
        self.R = rate
        self.F = perm.F
        self.t = perm.t
        self._state = [0] * perm.t  # python ints (canonical field values)
        self._inputs: list[int] = []
        self._outputs: list[int] = []

    # --- core ---------------------------------------------------------------
    def _duplex(self):
        for i, v in enumerate(self._inputs):
            self._state[i] = v % self.F.p
        self._inputs.clear()
        self._state = self.perm.permute_host(self._state)
        self._outputs = list(self._state)

    def observe(self, value: int):
        self._outputs.clear()
        self._inputs.append(int(value) % self.F.p)
        if len(self._inputs) == self.R:
            self._duplex()

    def observe_many(self, values):
        for v in values:
            self.observe(v)

    def sample(self) -> int:
        if self._inputs or not self._outputs:
            self._duplex()
        return self._outputs.pop()

    def sample_array(self, n: int) -> list[int]:
        return [self.sample() for _ in range(n)]

    def sample_ext(self, degree: int) -> list[int]:
        """extension element as a list of base coefficients."""
        return self.sample_array(degree)

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    # --- proof-of-work grinding (reference: challenger.h Grind) ---------------
    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int, max_iter: int = 1 << 22,
              batch: int = 1 << 13) -> int:
        """Find witness w such that a clone observing w samples `bits` zeros.

        Batched on device: `check_witness(w)` reduces to exactly one duplex
        permutation of the current state with the pending inputs plus `w`
        written into the rate rows, then a mask test on the popped element
        (state[t-1]).  Poseidon2.permute is natively batched over a trailing
        axis, so `batch` candidates are tested per device dispatch, scanning
        chunks in witness order so the returned w matches the sequential
        loop bit-for-bit (reference: challenger.h Grind — an OpenMP
        parallel-for over candidates; here the lanes are the parallelism).
        """
        import jax
        import jax.numpy as jnp

        F, t = self.F, self.t
        pend = [int(v) % F.p for v in self._inputs]
        k = len(pend)
        assert k < self.R
        mask = (1 << bits) - 1

        base = list(self._state)
        for i, v in enumerate(pend):
            base[i] = v
        fixed = F.encode(np.array(base, dtype=object))  # (L, t)

        def chunk(ws_enc):  # ws_enc: (L, B)
            st = jnp.broadcast_to(
                fixed[:, :, None], fixed.shape + (ws_enc.shape[-1],))
            st = st.at[:, k, :].set(ws_enc)
            return self.perm.permute(st)[:, t - 1, :]

        chunk_jit = jax.jit(chunk)
        for start in range(0, max_iter, batch):
            ws = np.arange(start, min(start + batch, max_iter), dtype=object)
            out = chunk_jit(F.encode(np.array([int(w) % F.p for w in ws],
                                              dtype=object)))
            last = F.decode(out)
            hits = [i for i, v in enumerate(np.asarray(last))
                    if int(v) & mask == 0]
            if hits:
                w = int(ws[hits[0]])
                self.observe(w)
                assert self.sample_bits(bits) == 0
                return w
        raise RuntimeError("grind failed")

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger.__new__(DuplexChallenger)
        c.perm = self.perm
        c.R = self.R
        c.F = self.F
        c.t = self.t
        c._state = list(self._state)
        c._inputs = list(self._inputs)
        c._outputs = list(self._outputs)
        return c


class MultiField32Challenger:
    """Challenger over a big permutation (e.g. BN254 Poseidon2) producing
    32-bit field challenges (reference: multi_field32_challenger.h,
    multi_field32_conversions.h Reduce/Split).  Used for recursive STARK
    verification inside SNARKs.

    small_p: small field modulus (<= 32 bits); perm: big-field Poseidon2.
    """

    def __init__(self, perm: Poseidon2, small_p: int):
        self.perm = perm
        self.small_p = small_p
        self.big_p = perm.F.p
        self.num_f = perm.F.spec.bits // 64  # 64-bit digits per big element
        self.R = self.num_f * perm.t
        self._state = [0] * perm.t
        self._inputs: list[int] = []
        self._outputs: list[int] = []

    def _duplex(self):
        n = self.num_f
        for i in range((len(self._inputs) + n - 1) // n):
            group = self._inputs[i * n : (i + 1) * n]
            # pack 32-bit values into the big field little-endian
            v = sum(int(x) << (32 * j) for j, x in enumerate(group))
            self._state[i] = v % self.big_p
        self._inputs.clear()
        self._state = self.perm.permute_host(self._state)
        self._outputs = []
        for s in self._state:
            for j in range(n):
                digit = (s >> (64 * j)) & ((1 << 64) - 1)
                self._outputs.append(digit % self.small_p)

    def observe(self, value: int):
        self._outputs.clear()
        self._inputs.append(int(value) % self.small_p)
        if len(self._inputs) == self.R:
            self._duplex()

    def observe_many(self, values):
        for v in values:
            self.observe(v)

    def sample(self) -> int:
        if self._inputs or not self._outputs:
            self._duplex()
        return self._outputs.pop()

    def sample_array(self, n: int) -> list[int]:
        return [self.sample() for _ in range(n)]

    def sample_ext(self, degree: int) -> list[int]:
        return self.sample_array(degree)

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0


class HashChallenger:
    """Hash-based challenger (reference: hash_challenger.h): sample flushes
    input through a padding-free sponge hash; the output seeds the next
    input buffer."""

    def __init__(self, perm: Poseidon2, out_len: int = 8,
                 rate: int | None = None):
        self.perm = perm
        self.F = perm.F
        self.out_len = out_len
        self.rate = rate if rate is not None else (
            8 if perm.t == 16 else perm.t - 1
        )
        self._inputs: list[int] = []
        self._outputs: list[int] = []

    def _hash_host(self, values: list[int]) -> list[int]:
        """PaddingFreeSponge on host ints (overwrite-mode absorb)."""
        p, t, rate = self.F.p, self.perm.t, self.rate
        st = [0] * t
        for off in range(0, len(values), rate):
            chunk = values[off : off + rate]
            st[: len(chunk)] = [int(v) % p for v in chunk]
            st = self.perm.permute_host(st)
        return st[: self.out_len]

    def observe(self, value: int):
        self._outputs.clear()
        self._inputs.append(int(value) % self.F.p)

    def observe_many(self, values):
        for v in values:
            self.observe(v)

    def sample(self) -> int:
        if not self._outputs:
            out = self._hash_host(self._inputs)
            self._outputs = list(out)
            self._inputs = list(out)
        return self._outputs.pop()

    def sample_array(self, n: int) -> list[int]:
        return [self.sample() for _ in range(n)]
