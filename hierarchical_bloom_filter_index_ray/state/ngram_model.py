"""Mergeable first-order n-gram (Markov) model over a capped symbol set.

Re-expression of the reference's ``PMIndex/NgramModel.java``: the Builder
observes a symbol stream and the Model exposes the stationary law ``pi``
and the aggregated first-order transition matrix (``NgramModel.java:
117-156`` ``aggregatedFirstOrder`` / ``P_cond``). Differences for the
distributed setting: the symbol set is fixed UP FRONT (e.g. the corpus
heavy hitters — the reference caps by ``sigma`` the same way) so partial
count matrices from independent batches merge by addition; symbols outside
the set map to index -1 and contribute nothing (the reference's
``mapToMarkovIndices`` returning null, ``CostFunctionMarkov.java:41-44``).
"""

from __future__ import annotations

import numpy as np

from .base import check_mergeable, register_sketch, write_blob


@register_sketch
class NgramModel:
    KIND = "ngram_model"

    def __init__(self, symbols: np.ndarray,
                 uni: np.ndarray | None = None,
                 bi: np.ndarray | None = None, total: int = 0):
        self.symbols = np.sort(np.asarray(symbols).astype(np.uint64,
                                                          copy=False))
        v = len(self.symbols)
        self.uni = uni if uni is not None else np.zeros(v, dtype=np.int64)
        self.bi = (bi if bi is not None
                   else np.zeros((v, v), dtype=np.int64))
        self.total = int(total)  # all observed tokens incl. out-of-set

    # -- stream observation ------------------------------------------------
    def _index(self, tokens: np.ndarray) -> np.ndarray:
        t = np.asarray(tokens).astype(np.uint64, copy=False)
        pos = np.searchsorted(self.symbols, t)
        posc = np.minimum(pos, len(self.symbols) - 1)
        idx = np.where(self.symbols[posc] == t, posc, -1)
        return idx.astype(np.int64)

    def update(self, flat_tokens: np.ndarray, offsets: np.ndarray) -> None:
        """Observe per-doc token runs (bigrams never cross doc bounds —
        the reference's ``resetChain`` between streams)."""
        if len(flat_tokens) == 0:
            return
        idx = self._index(flat_tokens)
        self.total += len(flat_tokens)
        known = idx >= 0
        np.add.at(self.uni, idx[known], 1)
        prev, cur = idx[:-1], idx[1:]
        ok = (prev >= 0) & (cur >= 0)
        # mask out pairs straddling doc boundaries
        starts = np.asarray(offsets[1:-1], dtype=np.int64) - 1
        if len(starts):
            boundary = np.zeros(len(prev), dtype=bool)
            valid = (starts >= 0) & (starts < len(prev))
            boundary[starts[valid]] = True
            ok &= ~boundary
        np.add.at(self.bi, (prev[ok], cur[ok]), 1)

    def merge(self, other: "NgramModel") -> "NgramModel":
        check_mergeable(self, other, ())
        if not np.array_equal(self.symbols, other.symbols):
            raise ValueError("cannot merge NgramModels over different "
                             "symbol sets")
        self.uni += other.uni
        self.bi += other.bi
        self.total += other.total
        return self

    # -- model queries -----------------------------------------------------
    def pi(self, idx: np.ndarray) -> np.ndarray:
        """Stationary per-slot probability of each symbol index."""
        return self.uni[idx] / max(self.total, 1)

    def p_cond(self, prev_idx: np.ndarray, cur_idx: np.ndarray
               ) -> np.ndarray:
        """P(cur | prev) from the aggregated first-order counts
        (``NgramModel.Model.P_cond``)."""
        denom = np.maximum(self.uni[prev_idx], 1)
        return self.bi[prev_idx, cur_idx] / denom

    def pattern_slot_prob(self, tokens: np.ndarray) -> float | None:
        """Per-slot probability that the full pattern STARTS here:
        pi(t1) * prod_i P(t_i | t_{i-1}) — the Markov-conditioned joint the
        reference's cost chains refine per prefix. Returns None when any
        pattern symbol is outside the model (no plan possible —
        ``mapToMarkovIndices`` null path)."""
        idx = self._index(np.asarray(tokens))
        if (idx < 0).any() or len(idx) == 0:
            return None
        p = float(self.pi(idx[:1])[0])
        if len(idx) > 1:
            p *= float(np.prod(self.p_cond(idx[:-1], idx[1:])))
        return p

    @property
    def nbytes(self) -> int:
        return self.symbols.nbytes + self.uni.nbytes + self.bi.nbytes

    def to_bytes(self) -> bytes:
        return write_blob(self.KIND, {"total": self.total},
                          {"symbols": self.symbols, "uni": self.uni,
                           "bi": self.bi})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(arrays["symbols"].copy(), uni=arrays["uni"].copy(),
                   bi=arrays["bi"].copy(), total=meta["total"])
