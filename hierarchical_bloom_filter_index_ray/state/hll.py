"""HyperLogLog (dense, 2^p uint8 registers, max-merge).

Not present in the reference (its distinct estimates are Bloom-fill based,
``membership/BloomFilter.java:61-66``, or exact ``LongOpenHashSet``
``SamplingSketchExperiment.java:563``); required by BASELINE.json north_star
with standard error 1.04/sqrt(m). Implementation follows the published
Flajolet et al. HLL with 64-bit hashing (no large-range correction needed)
and linear-counting small-range correction.
"""

from __future__ import annotations

import math

import numpy as np

from .base import check_mergeable, register_sketch, write_blob
from .splitmix import U64, derive_seed, hash_u64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register_sketch
class HyperLogLog:
    KIND = "hll"

    def __init__(self, p: int, seed: int, registers: np.ndarray | None = None):
        if not (11 <= p <= 18):
            # p>=11 keeps the 64-p rank field < 2^53 so the frexp-based
            # bit-length below is exact in float64.
            raise ValueError("p must be in [11, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))
        self._hseed = derive_seed(seed, "hll")

    def update(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return
        h = hash_u64(keys, self._hseed)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        rank_bits = 64 - self.p
        w = h & U64((1 << rank_bits) - 1)
        # bit length of w via frexp exponent (exact: w < 2^53 for p >= 11)
        bl = np.frexp(w.astype(np.float64))[1]
        rho = (rank_bits - bl + 1).astype(np.uint8)  # w==0 -> rank_bits+1
        np.maximum.at(self.registers, idx, rho)

    def estimate(self) -> float:
        inv = np.ldexp(1.0, -self.registers.astype(np.int32)).sum()
        e = _alpha(self.m) * self.m * self.m / inv
        if e <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return self.m * math.log(self.m / zeros)
        return float(e)

    @property
    def rel_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        check_mergeable(self, other, ("p", "seed"))
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @property
    def nbytes(self) -> int:
        return self.registers.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND, {"p": self.p, "seed": self.seed},
                          {"registers": self.registers})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["p"], meta["seed"], registers=arrays["registers"].copy())
