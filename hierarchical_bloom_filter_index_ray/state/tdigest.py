"""t-digest (merging variant), deterministic.

Not in the reference; required by BASELINE.json north_star for the ``n_tok``
length distribution. Follows Dunning & Ertl's merging t-digest: buffered
points + centroids are re-merged by ascending mean under the k1 scale
function's centroid-size bound ``4 N q(1-q) / delta``. Fully deterministic
(no RNG); merge order changes centroid layout but quantile estimates stay
within the configured accuracy (estimate-level guarantee, SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

from .base import check_mergeable, register_sketch, write_blob

_BUFFER = 4096


@register_sketch
class TDigest:
    KIND = "tdigest"

    def __init__(self, delta: float, seed: int = 0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = float(delta)
        self.seed = int(seed)  # unused (deterministic); kept for uniform API
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = (weights if weights is not None
                        else np.empty(0, dtype=np.float64))
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self._buf: list[np.ndarray] = []
        self._bufn = 0

    # -- internals -------------------------------------------------------
    def _flush(self) -> None:
        if not self._bufn:
            return
        pts = np.concatenate(self._buf)
        self._buf, self._bufn = [], 0
        m = np.concatenate([self.means, pts])
        w = np.concatenate([self.weights, np.ones(len(pts), dtype=np.float64)])
        order = np.argsort(m, kind="stable")
        self.means, self.weights = m[order], w[order]
        self._recompress()

    # -- API -------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        if len(values) == 0:
            return
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self._buf.append(values)
        self._bufn += len(values)
        if self._bufn >= _BUFFER:
            self._flush()

    def merge(self, other: "TDigest") -> "TDigest":
        check_mergeable(self, other, ("delta",))
        other._flush()
        if len(other.means):
            self._flush()
            m = np.concatenate([self.means, other.means])
            w = np.concatenate([self.weights, other.weights])
            order = np.argsort(m, kind="stable")
            self.means, self.weights = m[order], w[order]
            self._recompress()
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    def _recompress(self) -> None:
        if not len(self.means):
            return
        pts_m, pts_w = self.means, self.weights
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        total = pts_w.sum()
        out_m, out_w = [], []
        cur_m, cur_w, cum = pts_m[0], pts_w[0], 0.0
        for i in range(1, len(pts_m)):
            q = (cum + cur_w / 2.0) / total
            bound = 4.0 * total * q * (1.0 - q) / self.delta
            if cur_w + pts_w[i] <= max(bound, 1.0):
                cur_m += pts_w[i] * (pts_m[i] - cur_m) / (cur_w + pts_w[i])
                cur_w += pts_w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = pts_m[i], pts_w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m, dtype=np.float64)
        self.weights = np.array(out_w, dtype=np.float64)

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + float(self._bufn)

    def quantile(self, q: float) -> float:
        self._flush()
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        target = q * total
        # centroid midpoint cumulative positions
        cum = np.cumsum(w) - w / 2.0
        if target <= cum[0]:
            # interpolate from vmin
            t = target / max(cum[0], 1e-12)
            return float(self.vmin + t * (self.means[0] - self.vmin))
        if target >= cum[-1]:
            t = (target - cum[-1]) / max(total - cum[-1], 1e-12)
            return float(self.means[-1] + t * (self.vmax - self.means[-1]))
        i = int(np.searchsorted(cum, target)) - 1
        t = (target - cum[i]) / max(cum[i + 1] - cum[i], 1e-12)
        return float(self.means[i] + t * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    @property
    def nbytes(self) -> int:
        return self.means.nbytes + self.weights.nbytes

    def to_bytes(self) -> bytes:
        self._flush()
        return write_blob(self.KIND,
                          {"delta": self.delta, "seed": self.seed,
                           "vmin": self.vmin if np.isfinite(self.vmin) else None,
                           "vmax": self.vmax if np.isfinite(self.vmax) else None},
                          {"means": self.means, "weights": self.weights})

    @classmethod
    def _from_parts(cls, meta, arrays):
        return cls(meta["delta"], meta.get("seed", 0),
                   means=arrays["means"].copy(), weights=arrays["weights"].copy(),
                   vmin=meta["vmin"] if meta["vmin"] is not None else np.inf,
                   vmax=meta["vmax"] if meta["vmax"] is not None else -np.inf)
