"""Count-min sketch and count sketch (signed, median-of-rows).

Follows the reference's ``estimators/CountSketch.java`` /
``estimators/IntCountSketch.java``:

- ``from_eps_delta``: ``w = 2^ceil(log2(3/eps^2))``, ``d = ceil(ln(1/delta))``
  (``CountSketch.java:43-57``),
- per-row hashing from a SplitMix64-derived seed chain
  (``CountSketch.java:28-35,211-216``),
- count-sketch estimate = median over rows of ``sign * counter``
  (``CountSketch.java:94-103``),
- merge = elementwise add with shape+seed check
  (``CountSketch.java:134-159,232-241``). ``CountSketch`` keeps int64
  counters; ``IntCountSketch`` mirrors the reference's int32
  saturating-add variant (``IntCountSketch.java:131-155,233-245``).

Count-min is the one-sided variant (upper bound, min-of-rows) used for
heavy-hitter queries; count-sketch is unbiased (median-of-rows).
"""

from __future__ import annotations

import math

import numpy as np

from .base import check_mergeable, register_sketch, write_blob
from .splitmix import U64, derive_seed, hash_u64


def cms_dimensions(eps: float, delta: float) -> tuple[int, int]:
    """(w, d) per ``CountSketch.java:43-57``."""
    w = 1 << max(1, math.ceil(math.log2(3.0 / (eps * eps))))
    d = max(1, math.ceil(math.log(1.0 / delta)))
    return w, d


class _CountTableBase:
    signed = False

    def __init__(self, width: int, depth: int, seed: int,
                 table: np.ndarray | None = None, total: int = 0):
        self.width = int(width)
        self._pow2 = self.width > 0 and (self.width & (self.width - 1)) == 0
        self.depth = int(depth)
        self.seed = int(seed)
        self.table = (table if table is not None
                      else np.zeros((self.depth, self.width), dtype=np.int64))
        self.total = int(total)  # total weight inserted (for eps*N bounds)
        self._row_seeds = [derive_seed(seed, self.KIND, "row", j)
                           for j in range(self.depth)]
        self._sign_seeds = [derive_seed(seed, self.KIND, "sign", j)
                            for j in range(self.depth)]

    @classmethod
    def from_eps_delta(cls, eps: float, delta: float, seed: int):
        w, d = cms_dimensions(eps, delta)
        return cls(w, d, seed)

    def _cols(self, keys: np.ndarray, j: int) -> np.ndarray:
        """Column index per key: pow2 widths use the mask fast path; other
        widths fall back to modulo, mirroring the reference's
        ``isPowerOfTwo`` check (``CountSketch.java:211-216``)."""
        h = hash_u64(keys, self._row_seeds[j])
        if self._pow2:
            return (h & U64(self.width - 1)).astype(np.int64)
        return (h % U64(self.width)).astype(np.int64)

    def _signs(self, keys: np.ndarray, j: int) -> np.ndarray:
        return ((hash_u64(keys, self._sign_seeds[j]) & U64(1)).astype(np.int64)
                * 2 - 1)

    def update(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Add ``counts`` (default 1) per key. Pre-aggregates duplicates with
        np.unique so ``np.add.at`` touches each (row, col) once per distinct
        key — the vectorized analogue of the reference's per-symbol
        ``add(key, 1)`` loop (``CountSketch.java:64-92``)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return
        if counts is None:
            ukeys, ucounts = np.unique(keys, return_counts=True)
            ucounts = ucounts.astype(np.int64)
        else:
            ukeys, inv = np.unique(keys, return_inverse=True)
            ucounts = np.zeros(len(ukeys), dtype=np.int64)
            np.add.at(ucounts, inv, np.asarray(counts, dtype=np.int64))
        self.total += int(ucounts.sum())
        for j in range(self.depth):
            cols = self._cols(ukeys, j)
            vals = ucounts * self._signs(ukeys, j) if self.signed else ucounts
            np.add.at(self.table[j], cols, vals)

    def merge(self, other):
        check_mergeable(self, other, ("width", "depth", "seed"))
        self.table += other.table
        self.total += other.total
        return self

    @property
    def nbytes(self) -> int:
        return self.table.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND,
                          {"width": self.width, "depth": self.depth,
                           "seed": self.seed, "total": self.total},
                          {"table": self.table})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["width"], meta["depth"], meta["seed"],
                   table=arrays["table"].copy(), total=meta["total"])


@register_sketch
class CountMinSketch(_CountTableBase):
    KIND = "cms"
    signed = False

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point estimate: min over rows (upper bound; err <= eps*N w.p. 1-d)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(self.depth):
            est = np.minimum(est, self.table[j][self._cols(keys, j)])
        return est


@register_sketch
class CountSketch(_CountTableBase):
    KIND = "countsketch"
    signed = True

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Unbiased point estimate: median over rows of sign*counter
        (``CountSketch.java:94-103``)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        rows = np.empty((self.depth, len(keys)), dtype=np.int64)
        for j in range(self.depth):
            rows[j] = self.table[j][self._cols(keys, j)] * self._signs(keys, j)
        return np.median(rows, axis=0).astype(np.int64)


_I32_MIN, _I32_MAX = np.iinfo(np.int32).min, np.iinfo(np.int32).max


@register_sketch
class IntCountSketch(CountSketch):
    """Int32-counter count sketch with SATURATING add — the reference's
    memory-lean variant (``estimators/IntCountSketch.java:131-155``:
    counters clamp at int32 bounds instead of wrapping; merges saturate
    elementwise too). Counters are held as int32 (quarter the memory of
    ``CountSketch``); arithmetic widens to int64 then clamps."""

    KIND = "intcountsketch"

    def __init__(self, width: int, depth: int, seed: int,
                 table: np.ndarray | None = None, total: int = 0):
        super().__init__(width, depth, seed, table=table, total=total)
        if table is None:
            self.table = np.zeros((self.depth, self.width), dtype=np.int32)

    def update(self, keys: np.ndarray, counts: np.ndarray | None = None
               ) -> None:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return
        if counts is None:
            ukeys, ucounts = np.unique(keys, return_counts=True)
            ucounts = ucounts.astype(np.int64)
        else:
            ukeys, inv = np.unique(keys, return_inverse=True)
            ucounts = np.zeros(len(ukeys), dtype=np.int64)
            np.add.at(ucounts, inv, np.asarray(counts, dtype=np.int64))
        self.total += int(ucounts.sum())
        for j in range(self.depth):
            cols = self._cols(ukeys, j)
            vals = ucounts * self._signs(ukeys, j)
            wide = self.table[j].astype(np.int64)
            np.add.at(wide, cols, vals)
            self.table[j] = np.clip(wide, _I32_MIN, _I32_MAX).astype(np.int32)

    def merge(self, other):
        check_mergeable(self, other, ("width", "depth", "seed"))
        wide = self.table.astype(np.int64) + other.table.astype(np.int64)
        self.table = np.clip(wide, _I32_MIN, _I32_MAX).astype(np.int32)
        self.total += other.total
        return self
