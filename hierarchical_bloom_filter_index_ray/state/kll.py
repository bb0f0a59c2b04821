"""KLL quantile sketch (compactor hierarchy), deterministic compaction.

Not in the reference (its quantile machinery is HOPS + BottomK + exact sort,
``SamplingSketchExperiment.java:744-761``); required by BASELINE.json
north_star. Follows the published KLL algorithm (Karnin–Lang–Liberty 2016):
geometric compactor capacities ``k * c^(H-1-h)``, compaction keeps every
other item of the sorted buffer. The even/odd offset is drawn from a
SplitMix64 stream keyed by (seed, compaction counter) so a single-partition
build is bit-reproducible; under merge reordering the guarantee is
estimate-level (rank error ~ O(1/k)), as stated in SURVEY.md §7.4.
"""

from __future__ import annotations

import math

import numpy as np

from .base import check_mergeable, register_sketch, write_blob
from .splitmix import U64, derive_seed, splitmix64

_C = 2.0 / 3.0


@register_sketch
class KLL:
    KIND = "kll"

    def __init__(self, k: int, seed: int, compactors: list[np.ndarray] | None = None,
                 n: int = 0, n_compact: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[np.ndarray] = (
            compactors if compactors is not None
            else [np.empty(0, dtype=np.float64)])
        self.n = int(n)
        self.n_compact = int(n_compact)
        self._cseed = derive_seed(seed, "kll")

    # -- internals -------------------------------------------------------
    def _capacity(self, h: int) -> int:
        depth = len(self.compactors)
        return max(2, int(math.ceil(self.k * (_C ** (depth - 1 - h)))))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _coin(self) -> int:
        bit = int(splitmix64(U64((self._cseed + self.n_compact) & 0xFFFFFFFFFFFFFFFF))) & 1
        self.n_compact += 1
        return bit

    def _compress(self) -> None:
        while self._size() > self._max_size():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._capacity(h):
                    if h + 1 == len(self.compactors):
                        self.compactors.append(np.empty(0, dtype=np.float64))
                    buf = np.sort(self.compactors[h])
                    off = self._coin()
                    promoted = buf[off::2]
                    self.compactors[h] = np.empty(0, dtype=np.float64)
                    self.compactors[h + 1] = np.concatenate(
                        [self.compactors[h + 1], promoted])
                    break
            else:
                break

    # -- API -------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        if len(values) == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], values])
        self.n += len(values)
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        check_mergeable(self, other, ("k", "seed"))
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.compactors):
            if len(buf):
                self.compactors[h] = np.concatenate([self.compactors[h], buf])
        self.n += other.n
        self.n_compact = max(self.n_compact, other.n_compact)
        self._compress()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, buf in enumerate(self.compactors):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated number of inserted items <= x."""
        it, w = self._weighted_items()
        return float(w[it <= x].sum())

    def quantile(self, q: float) -> float:
        """Left-continuous rank pick ``rank = ceil(q*n) - 1`` over the
        weighted multiset (reference rule: ``SamplingSketchExperiment.java:753-761``)."""
        it, w = self._weighted_items()
        if len(it) == 0:
            return float("nan")
        target = max(0, math.ceil(q * w.sum()) - 1)
        cum = np.cumsum(w)
        i = int(np.searchsorted(cum, target + 1))
        return float(it[min(i, len(it) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    @property
    def nbytes(self) -> int:
        return 8 * self._size()

    def to_bytes(self) -> bytes:
        lens = np.array([len(c) for c in self.compactors], dtype=np.int64)
        flat = (np.concatenate(self.compactors) if self._size()
                else np.empty(0, dtype=np.float64))
        return write_blob(self.KIND,
                          {"k": self.k, "seed": self.seed, "n": self.n,
                           "n_compact": self.n_compact},
                          {"lens": lens, "flat": flat})

    @classmethod
    def _from_parts(cls, meta, arrays):
        lens = arrays["lens"]
        flat = arrays["flat"]
        comps, off = [], 0
        for ln in lens:
            comps.append(flat[off:off + int(ln)].copy())
            off += int(ln)
        return cls(meta["k"], meta["seed"], compactors=comps, n=meta["n"],
                   n_compact=meta["n_compact"])
