"""Engine configuration — the analogue of the reference's
``PMIndex/HbiConfiguration.java:98-207`` builder, reduced to explicit
dataclass params. One master ``seed`` drives every hash function through
SplitMix64/blake2 chains (``state/splitmix.py``), replacing the reference's
``SecureRandom`` seeding so that merges and Ray task retries are
deterministic (SURVEY.md §7.0).
"""

from __future__ import annotations

import hashlib
import json
import math
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class HbiConfig:
    """Hierarchical bloom index + sketch-set build configuration.

    Windowing (SURVEY.md §7 hard part 3): the reference windows by global
    token position of a single sequential stream (``PMIndex/HBI.java:229``).
    A distributed batch engine needs a scan-free deterministic assignment, so
    windows are **doc-aligned**: ``window_id = doc_index >> log2(docs_per_window)``
    per source, and the in-window hierarchy partitions the window's
    ``docs_per_window`` doc slots (level L -> 2^L intervals of
    ``docs_per_window / 2^L`` docs; leaf = one doc). Bloom keys are
    ``mix(interval_id, ngram_key)`` exactly like the reference's packed
    ``(interval_id, token)`` keys (``membership/KeyPackingService.java:77-94``,
    ``tree/ImplicitTree.java:63-75``).
    """

    seed: int = 42
    # --- windowing / hierarchy ---
    docs_per_window: int = 256          # power of two; reference window/tree ratio
    # --- n-grams over the token sequence (reference Ngram, stride 1) ---
    ngram: int = 1
    # --- bloom sizing (per level L: n_L = min(2^L * sigma_expect, W_tok)) ---
    fp: float = 0.01                    # target FPR per filter (Main.java:31 uses 1e-3)
    expected_tokens_per_doc: int = 128  # sizing prior, not a correctness input
    expected_distinct_per_doc: int = 96 # sigma_expect prior per leaf interval
    # --- sketch params ---
    cms_eps: float = 0.001
    cms_delta: float = 0.01
    hll_p: int = 14
    kll_k: int = 200
    tdigest_delta: float = 200.0
    hops_buckets: int = 2048            # reference default B=2500 (SamplingSketchExperiment.java:50)
    bottomk_k: int = 1024
    # --- memory policy (reference REACTIVE policy, HBI.java:288-323):
    # when set, each window keeps only bloom levels >= the safe Lp derived
    # from its q-quantile token frequency (shallow filters that cannot
    # prune are dropped at merge time) ---
    policy_quantile: float | None = None
    policy_conf: float = 0.95
    # --- which sketch families to build per (source, window) partition ---
    sketches: tuple[str, ...] = field(default=(
        "bloom_tree", "hll", "cms", "kll_ntok", "tdigest_ntok", "hops",
        "bottomk"))

    def __post_init__(self):
        if self.docs_per_window & (self.docs_per_window - 1):
            raise ValueError("docs_per_window must be a power of two")
        if self.ngram < 1:
            raise ValueError("ngram must be >= 1")

    @property
    def window_bits(self) -> int:
        return int(math.log2(self.docs_per_window))

    @property
    def num_levels(self) -> int:
        """Levels 0..window_bits: root (whole window) to leaf (one doc)."""
        return self.window_bits + 1

    def level_expected_distinct(self, level: int) -> int:
        """Per-level Bloom capacity prior, mirroring
        ``PMIndex/HBI.java:693-702``: ``n_L = 2^L * min(sigma, span)`` with
        span measured in expected tokens of one level-L interval."""
        docs_per_interval = self.docs_per_window >> level
        span_tokens = docs_per_interval * self.expected_tokens_per_doc
        sigma = self.expected_distinct_per_doc * docs_per_interval
        return (1 << level) * min(sigma, span_tokens)

    def params_hash(self) -> str:
        """Stable identity of everything that affects sketch bytes; stored in
        the manifest and checked before any merge/resume."""
        d = asdict(self)
        d["sketches"] = list(d["sketches"])
        return hashlib.blake2b(
            json.dumps(d, sort_keys=True).encode(), digest_size=8).hexdigest()

    def to_json(self) -> dict:
        d = asdict(self)
        d["sketches"] = list(d["sketches"])
        return d

    @classmethod
    def from_json(cls, d: dict) -> "HbiConfig":
        d = dict(d)
        d["sketches"] = tuple(d["sketches"])
        return cls(**d)
