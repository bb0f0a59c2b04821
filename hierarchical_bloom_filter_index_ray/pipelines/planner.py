"""Query planning: seed-level selection + confidence solvers.

Re-derives the reference's pruning-plan math in our doc-slot tree terms:

- ``pruning_level_bloom``: the alpha -> Lp mapping of
  ``utilities/MathUtils.java:121-157`` — pick the deepest seed level whose
  interval span still contains a token of per-slot probability p with
  confidence ``conf``, discounted by the Bloom false-positive rate beta
  (shallower levels answer "yes" almost surely and are uninformative).
  NOTE: the reference's ``log2`` helper actually computes ln
  (``MathUtils.java:161-163``); we implement the documented base-2 intent
  and clamp to the same [0, max_depth] range.
- ``solve_b_bisection``: solves ``prod_i(1 - (1-p_i)^b) = a`` for b — the
  reference's ``solvers/PatternPruner.java:20-62`` bisection with
  exponential bracketing, vectorized over p.
- ``MostFreqPlanner``: per-query seed level from the window's CMS
  estimates, ``lp = max(0, pruning_level_bloom(conf, min_i p_i, fp))`` —
  the semantics of ``search/MostFreqPruning.java:31-52`` with the
  per-window count-min sketch playing the per-tree estimator
  (``estimators/CSEstimator.java:20-105``).

Seed-level choice only affects probe COST: the DFS from level lp covers
every leaf below, so verified results are unchanged (tested).
"""

from __future__ import annotations

import math

import numpy as np


def pruning_level_bloom(base_interval_tokens: float, max_depth: int,
                        conf: float, prob: float, beta: float) -> int:
    """Seed level in [0, max_depth] (0 = root, max_depth = leaf)."""
    conf = min(max(conf, 0.0), 1.0)
    beta = min(max(beta, 0.0), 1.0)
    prob = min(max(prob, 0.0), 1.0 - 1e-15)
    if conf <= beta:
        return max_depth
    if prob <= 0.0:
        return 0
    log_one_minus_prob = math.log1p(-prob)
    numerator = math.log1p(-conf) - math.log1p(-beta)
    b_alpha_q = numerator / log_one_minus_prob
    if not math.isfinite(b_alpha_q) or b_alpha_q <= 0.0:
        return 0
    ratio = base_interval_tokens / b_alpha_q
    if ratio <= 0:
        return 0
    lp = math.ceil(math.log2(ratio)) + 1
    return int(min(max(lp, 0), max_depth))


def f_prod(b: float, p_hat: np.ndarray) -> float:
    """prod_i (1 - (1-p_i)^b), computed in log space."""
    terms = 1.0 - np.power(1.0 - p_hat, b)
    if (terms <= 0.0).any():
        return 0.0
    return float(np.exp(np.log(terms).sum()))


def solve_b_bisection(p_hat, a: float, eps_rel: float = 1e-8,
                      eps_abs: float = 1e-12) -> float:
    """Smallest b with prod_i(1-(1-p_i)^b) >= a (expected probe budget)."""
    p_hat = np.asarray(p_hat, dtype=np.float64)
    if not (0.0 < a < 1.0):
        raise ValueError("a must be in (0,1)")
    if ((p_hat <= 0.0) | (p_hat >= 1.0)).any():
        raise ValueError("all p_hat must lie in (0,1)")
    b_lo, b_hi = 0.0, 1.0
    while f_prod(b_hi, p_hat) - a < 0.0:
        b_hi *= 2.0
        if b_hi > 1e12:
            raise RuntimeError("excessive upper bound (>1e12)")
    while True:
        b_mid = 0.5 * (b_lo + b_hi)
        f_mid = f_prod(b_mid, p_hat) - a
        if abs(f_mid) <= eps_abs or (b_hi - b_lo) <= eps_rel * b_mid:
            return b_mid
        if f_mid < 0.0:
            b_lo = b_mid
        else:
            b_hi = b_mid


class MostFreqPlanner:
    """Per-(window, query) seed level from the window CMS.

    ``plan(cms, window_tokens, query_keys)`` -> level int. Uses the
    minimum estimated per-slot probability over the query's n-gram keys
    (rare tokens prune deepest — ``MostFreqPruning.java:45-50``).
    """

    def __init__(self, conf: float, fp: float, max_depth: int):
        self.conf = conf
        self.fp = fp
        self.max_depth = max_depth

    def plan(self, cms, window_tokens: int, query_keys: np.ndarray) -> int:
        if cms is None or window_tokens <= 0:
            return 0
        est = cms.estimate(query_keys).astype(np.float64)
        p = est / max(window_tokens, 1)
        p_min = float(np.clip(p.min(), 1e-12, 1 - 1e-9))
        base = window_tokens / (1 << self.max_depth)  # leaf interval tokens
        return pruning_level_bloom(base, self.max_depth, self.conf, p_min,
                                   self.fp)


def cost_at_level(probs: np.ndarray, lp: int, max_depth: int,
                  window_tokens: int, beta: float) -> float:
    """Expected probe count when seeding the sweep at level ``lp``.

    Independence-model version of the reference's inclusion-exclusion cost
    (``estimators/CostFunctionIE.java:29-75`` with ieMaxOrder=1; the full
    IE orders refine the same expectation): a node at level L spans
    ``b_L = window_tokens / 2^L`` token slots; it passes the probe of all r
    query keys with probability ``prod_i min(1, 1-(1-p_i)^{b_L} + beta)``,
    and each passing node fans out to 2 children.

    cost(lp) = sum over levels L >= lp of E[nodes visited at L] * r.
    """
    r = len(probs)
    nodes = float(1 << lp)
    total = 0.0
    for level in range(lp, max_depth + 1):
        total += nodes * r
        if level == max_depth:
            break
        b = window_tokens / (1 << level)
        pass_p = float(np.prod(np.minimum(
            1.0, 1.0 - np.power(1.0 - probs, b) + beta)))
        nodes = 2.0 * nodes * pass_p
        if nodes < 1e-9:
            break
    return total


def minimize_level_cost(probs: np.ndarray, max_depth: int,
                        window_tokens: int, beta: float,
                        pattern_len: int = 1) -> tuple[int, float]:
    """Seed level minimizing expected probes
    (``estimators/LevelCostMinimizer.java:15-55``): scan Lp in
    [0, max_depth - ceil(log2(pattern_len))] (a level must still host the
    pattern — ``MathUtils.childCanHost``) and take the argmin."""
    probs = np.clip(np.asarray(probs, dtype=np.float64), 1e-12, 1 - 1e-9)
    max_lp = max(0, max_depth - max(0, math.ceil(
        math.log2(max(1, pattern_len)))))
    best_lp, best_cost = 0, float("inf")
    for lp in range(0, max_lp + 1):
        c = cost_at_level(probs, lp, max_depth, window_tokens, beta)
        if c < best_cost:
            best_lp, best_cost = lp, c
    return best_lp, best_cost


class CostPlanner:
    """Per-(window, query) seed level by expected-probe-cost minimization
    (the ``CostFunctionIE``/``LevelCostMinimizer`` seam; independence
    model). Same results as root-seeded probing, different cost profile."""

    def __init__(self, fp: float, max_depth: int):
        self.fp = fp
        self.max_depth = max_depth

    def plan(self, cms, window_tokens: int, query_keys: np.ndarray) -> int:
        if cms is None or window_tokens <= 0:
            return 0
        est = cms.estimate(query_keys).astype(np.float64)
        probs = est / max(window_tokens, 1)
        lp, _ = minimize_level_cost(probs, self.max_depth, window_tokens,
                                    self.fp, pattern_len=len(query_keys))
        return lp


def memory_policy_level(freqs: np.ndarray, window_tokens: int, *,
                        quantile: float, conf: float, fp: float,
                        max_depth: int) -> int:
    """REACTIVE memory policy (``PMIndex/HBI.java:288-323``): from a
    distinct-key frequency sample of the window (HOPS/bottom-k
    representatives + CMS counts), take the q-quantile frequency and keep
    only levels >= the safe Lp — the shallow filters cannot prune tokens
    this frequent, so they are dropped (``ImplicitTree.dropFiltersUpToLp``
    ``tree/ImplicitTree.java:112-122``). Returns the first level to KEEP."""
    if len(freqs) == 0 or window_tokens <= 0:
        return 0
    freqs = np.sort(np.asarray(freqs, dtype=np.float64))
    rank = max(0, math.ceil(quantile * len(freqs)) - 1)
    p_q = float(np.clip(freqs[rank] / window_tokens, 1e-12, 1 - 1e-9))
    base = window_tokens / (1 << max_depth)
    lp = pruning_level_bloom(base, max_depth, conf, p_q, fp)
    return int(min(lp, max_depth))
