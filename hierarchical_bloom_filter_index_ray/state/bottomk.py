"""Bottom-k distinct-key sampler / KMV distinct-count estimator.

Follows the reference's ``estimators/BottomKSampler.java:7-91`` (k smallest
hashed priorities over distinct keys, max-heap + seen-set); vectorized here
as sorted priority/key arrays with ``np.unique``-based dedup. Merge =
concat + re-bottom-k — associative, commutative, bit-deterministic.
Bonus over the reference: the bottom-k priorities double as a KMV distinct
estimator ``(k-1) / U_(k)`` with priorities normalized to (0,1].
"""

from __future__ import annotations

import numpy as np

from .base import check_mergeable, register_sketch, write_blob
from .splitmix import derive_seed, hash_u64

_SCALE = float(2**64)


@register_sketch
class BottomK:
    KIND = "bottomk"

    def __init__(self, k: int, seed: int, prios: np.ndarray | None = None,
                 keys: np.ndarray | None = None):
        self.k = int(k)
        self.seed = int(seed)
        # invariant: prios sorted ascending, distinct, len <= k; keys aligned
        self.prios = prios if prios is not None else np.empty(0, dtype=np.uint64)
        self.keys = keys if keys is not None else np.empty(0, dtype=np.uint64)
        self._s = derive_seed(seed, "bottomk")

    def _absorb(self, prios: np.ndarray, keys: np.ndarray) -> None:
        p = np.concatenate([self.prios, prios])
        kk = np.concatenate([self.keys, keys])
        # dedup on priority (priority is an injective-w.h.p. hash of the key)
        up, idx = np.unique(p, return_index=True)
        uk = kk[idx]
        if len(up) > self.k:
            up, uk = up[: self.k], uk[: self.k]
        self.prios, self.keys = up, uk

    def update(self, in_keys: np.ndarray) -> None:
        in_keys = np.asarray(in_keys)
        if len(in_keys) == 0:
            return
        k64 = in_keys.astype(np.uint64, copy=False)
        p = hash_u64(k64, self._s)
        self._absorb(p, k64)

    def merge(self, other: "BottomK") -> "BottomK":
        check_mergeable(self, other, ("k", "seed"))
        self._absorb(other.prios, other.keys)
        return self

    def sample_keys(self) -> np.ndarray:
        return self.keys.copy()

    def estimate_distinct(self) -> float:
        """KMV estimator: exact below k; else (k-1)/U_(k)."""
        if len(self.prios) < self.k:
            return float(len(self.prios))
        u_k = (float(self.prios[self.k - 1]) + 1.0) / _SCALE
        return (self.k - 1) / u_k

    def quantile_of_freq(self, q: float, freq_lookup) -> float:
        """Same estimation rule as HOPS (``SamplingSketchExperiment.java:884-900``)."""
        import math
        if len(self.keys) == 0:
            return float("nan")
        freqs = np.sort(np.asarray(freq_lookup(self.keys), dtype=np.float64))
        rank = max(0, math.ceil(q * len(freqs)) - 1)
        return float(freqs[rank])

    @property
    def nbytes(self) -> int:
        return self.prios.nbytes + self.keys.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND, {"k": self.k, "seed": self.seed},
                          {"prios": self.prios, "keys": self.keys})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["k"], meta["seed"], prios=arrays["prios"].copy(),
                   keys=arrays["keys"].copy())
