"""Mergeable heavy-hitter candidate summary (top-M by partial count).

The reference generates heavy-hitter candidates from exact per-run maps and
scores them with the count sketch (``estimators/CSEstimator.java:67-91``);
the distributed analogue is a mergeable candidate list: each partial holds
the exact top-M (token, count) of its batch, merges sum counts over the
union, and a capacity bound ``cap`` truncates the union to the largest
counts (SpaceSaving-style truncation — any token frequent overall stays,
because its partial counts accumulate before truncation). Final counts are
re-estimated by the merged CMS, so the candidate list only needs recall.
"""

from __future__ import annotations

import numpy as np

from .base import check_mergeable, register_sketch, write_blob


@register_sketch
class TopM:
    """Top-``m`` candidate tokens by accumulated partial count.

    ``update_counts`` takes pre-uniqued (tokens, counts) of one batch and
    keeps that batch's exact top-m; ``merge`` sums counts over the union of
    two candidate sets and truncates to ``cap`` (>= m) entries.
    """

    KIND = "topm"

    def __init__(self, m: int, cap: int | None = None,
                 tokens: np.ndarray | None = None,
                 counts: np.ndarray | None = None):
        self.m = int(m)
        self.cap = int(cap) if cap is not None else max(32 * self.m, 4096)
        self.tokens = (tokens if tokens is not None
                       else np.empty(0, dtype=np.uint64))
        self.counts = (counts if counts is not None
                       else np.empty(0, dtype=np.int64))

    def _truncate(self, limit: int) -> None:
        if len(self.tokens) <= limit:
            return
        # deterministic: count desc, token asc
        order = np.lexsort((self.tokens, -self.counts))[:limit]
        order.sort()  # keep token-sorted storage for merge
        self.tokens = self.tokens[order]
        self.counts = self.counts[order]

    def update_counts(self, tokens: np.ndarray, counts: np.ndarray) -> None:
        """Fold one batch's exact (unique token, count) pairs in."""
        if len(tokens) == 0:
            return
        t = np.asarray(tokens).astype(np.uint64, copy=False)
        c = np.asarray(counts).astype(np.int64, copy=False)
        if len(t) > self.m:
            keep = np.argpartition(c, -self.m)[-self.m:]
            t, c = t[keep], c[keep]
        both = np.concatenate([self.tokens, t])
        merged, inv = np.unique(both, return_inverse=True)
        sums = np.zeros(len(merged), dtype=np.int64)
        np.add.at(sums, inv, np.concatenate([self.counts, c]))
        self.tokens, self.counts = merged, sums
        self._truncate(self.cap)

    def update(self, keys: np.ndarray) -> None:
        """Raw-key convenience (uniques in place)."""
        if len(keys) == 0:
            return
        uk, uc = np.unique(np.asarray(keys).astype(np.uint64, copy=False),
                           return_counts=True)
        self.update_counts(uk, uc.astype(np.int64))

    def merge(self, other: "TopM") -> "TopM":
        check_mergeable(self, other, ("m", "cap"))
        both = np.concatenate([self.tokens, other.tokens])
        merged, inv = np.unique(both, return_inverse=True)
        sums = np.zeros(len(merged), dtype=np.int64)
        np.add.at(sums, inv, np.concatenate([self.counts, other.counts]))
        self.tokens, self.counts = merged, sums
        self._truncate(self.cap)
        return self

    def top(self, k: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """(tokens, counts) sorted count desc, token asc; top-k if given."""
        order = np.lexsort((self.tokens, -self.counts))
        if k is not None:
            order = order[:k]
        return self.tokens[order], self.counts[order]

    @property
    def nbytes(self) -> int:
        return self.tokens.nbytes + self.counts.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND, {"m": self.m, "cap": self.cap},
                          {"tokens": self.tokens, "counts": self.counts})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["m"], meta["cap"], tokens=arrays["tokens"].copy(),
                   counts=arrays["counts"].copy())
