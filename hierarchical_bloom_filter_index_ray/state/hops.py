"""HOPS — one-permutation bucket-min distinct-key sampler ("MPQ").

Follows the reference's ``estimators/HOPS.java``:

- B buckets; per key: ``bucket = h1(key) % B``, ``priority = h2(key)``;
  each bucket keeps the min-priority representative key
  (``HOPS.java:41-66,69-82``),
- merge = per-bucket min-priority select with identical-seed check
  (``HOPS.mergeFrom`` ``HOPS.java:164-194``) — exactly associative and
  commutative, so merge order is provably irrelevant (bit-level),
- frequency-quantile estimation: look up each representative's frequency in
  an external count source (the reference uses the exact truth map,
  ``SamplingSketchExperiment.java:884-889``; we pass a CMS/exact lookup
  callable), sort ascending, left-continuous rank pick
  (``HOPS.java:283-308``).
"""

from __future__ import annotations

import math

import numpy as np

from .base import check_mergeable, register_sketch, write_blob
from .splitmix import U64, derive_seed, hash_u64

_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


@register_sketch
class HOPS:
    KIND = "hops"

    def __init__(self, buckets: int, seed: int,
                 prios: np.ndarray | None = None,
                 keys: np.ndarray | None = None):
        self.buckets = int(buckets)
        self.seed = int(seed)
        self.prios = (prios if prios is not None
                      else np.full(self.buckets, _EMPTY, dtype=np.uint64))
        self.keys = (keys if keys is not None
                     else np.zeros(self.buckets, dtype=np.uint64))
        self._s1 = derive_seed(seed, "hops_bucket")
        self._s2 = derive_seed(seed, "hops_prio")

    def update(self, in_keys: np.ndarray) -> None:
        in_keys = np.asarray(in_keys)
        if len(in_keys) == 0:
            return
        k64 = in_keys.astype(np.uint64, copy=False)
        b = (hash_u64(k64, self._s1) % U64(self.buckets)).astype(np.int64)
        p = hash_u64(k64, self._s2)
        # per-bucket argmin: sort by (bucket, priority), first occurrence wins
        order = np.lexsort((p, b))
        b_s, p_s, k_s = b[order], p[order], k64[order]
        first = np.ones(len(b_s), dtype=bool)
        first[1:] = b_s[1:] != b_s[:-1]
        bb, pp, kk = b_s[first], p_s[first], k_s[first]
        better = pp < self.prios[bb]
        self.prios[bb[better]] = pp[better]
        self.keys[bb[better]] = kk[better]

    def merge(self, other: "HOPS") -> "HOPS":
        check_mergeable(self, other, ("buckets", "seed"))
        better = other.prios < self.prios
        self.prios[better] = other.prios[better]
        self.keys[better] = other.keys[better]
        return self

    @property
    def occupied(self) -> np.ndarray:
        return self.prios != _EMPTY

    def sample_keys(self) -> np.ndarray:
        """Distinct-key uniform sample: the representatives (``HOPS.java:112-136``)."""
        return self.keys[self.occupied]

    def quantile_of_freq(self, q: float, freq_lookup) -> float:
        """q-quantile of the per-distinct-key frequency distribution.

        ``freq_lookup(keys) -> counts`` (CMS estimate or exact oracle).
        Rank rule: ascending sort, ``rank = ceil(q*n) - 1``
        (``HOPS.java:291-308``, ``SamplingSketchExperiment.java:753-761``).
        """
        reps = self.sample_keys()
        if len(reps) == 0:
            return float("nan")
        freqs = np.sort(np.asarray(freq_lookup(reps), dtype=np.float64))
        rank = max(0, math.ceil(q * len(freqs)) - 1)
        return float(freqs[rank])

    @property
    def nbytes(self) -> int:
        return self.prios.nbytes + self.keys.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND, {"buckets": self.buckets, "seed": self.seed},
                          {"prios": self.prios, "keys": self.keys})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["buckets"], meta["seed"], prios=arrays["prios"].copy(),
                   keys=arrays["keys"].copy())
