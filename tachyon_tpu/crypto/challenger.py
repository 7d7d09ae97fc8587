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
        self._permute_jit = jax.jit(perm.permute)

    # --- core ---------------------------------------------------------------
    def _duplex(self):
        for i, v in enumerate(self._inputs):
            self._state[i] = v % self.F.p
        self._inputs.clear()
        st = self.F.encode(np.array(self._state, dtype=object))[:, :, None]
        out = self._permute_jit(st)
        vals = self.F.decode(out[:, :, 0])
        self._state = [int(v) for v in vals]
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

    def grind(self, bits: int, max_iter: int = 1 << 22) -> int:
        """Find witness w such that a clone observing w samples `bits` zeros.

        Host sequential with cloned state (cheap python-side permute would be
        better; for the typical 16-20 bits SP1 configs we batch on device in
        a later revision).
        """
        for w in range(max_iter):
            clone = self.clone()
            if clone.check_witness(bits, w):
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
        c._permute_jit = self._permute_jit
        return c
