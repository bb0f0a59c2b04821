"""Corpus / per-source sketch aggregates over the sequences table.

The "wide" aggregations of SURVEY.md §2.5 expressed as mergeable-UDAF
pre-aggregation: ``map_batches`` emits ONE serialized partial sketch row per
(group x batch) — tokens never leave the map stage — and the tiny partial
stream is merged per group (``groupby().map_groups`` for many groups,
driver-side for the constant-key global case). Reference analogues:
exact truth map ``SamplingSketchExperiment.java:819-825`` (test oracle),
distinct counting :563, heavy hitters via CS estimates
``estimators/CSEstimator.java:67-91``, quantile rank pick :744-761.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import HbiConfig
from ..functions.tokenize import flat_tokens_and_offsets
from ..state import (KLL, BottomK, CountMinSketch, HyperLogLog, TDigest,
                     derive_seed, sketch_from_bytes)

GLOBAL_KINDS = ("hll", "cms", "kll_ntok", "tdigest_ntok", "bottomk")


def _new_global(cfg: HbiConfig) -> dict:
    return {
        "hll": HyperLogLog(cfg.hll_p, derive_seed(cfg.seed, "ghll")),
        "cms": CountMinSketch.from_eps_delta(cfg.cms_eps, cfg.cms_delta,
                                             derive_seed(cfg.seed, "gcms")),
        "kll_ntok": KLL(cfg.kll_k, derive_seed(cfg.seed, "gkll")),
        "tdigest_ntok": TDigest(cfg.tdigest_delta),
        "bottomk": BottomK(cfg.bottomk_k, derive_seed(cfg.seed, "gbk")),
    }


class GlobalSketchPartials:
    """Map stage: one partial row per (source x batch). Passed as a pickled
    INSTANCE -> elastic task pool (its only state is the config; an actor
    pool's startup cost buys nothing here)."""

    def __init__(self, cfg: HbiConfig, by_source: bool = True):
        self.cfg = cfg
        self.by_source = by_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        lengths = np.diff(offsets)
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False)
        if self.by_source:
            src = batch["source"]
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            sd = src.dictionary_encode()
            if isinstance(sd, pa.ChunkedArray):
                sd = sd.combine_chunks()
            codes = sd.indices.to_numpy(zero_copy_only=False)
            names = sd.dictionary.to_pylist()
        else:
            codes = np.zeros(batch.num_rows, dtype=np.int64)
            names = ["__all__"]
        tok_codes = np.repeat(codes, lengths)
        out_src, out_payload, out_rows, out_toks = [], [], [], []
        for ci, name in enumerate(names):
            rmask = codes == ci
            sk = _new_global(self.cfg)
            toks = flat[tok_codes == ci]
            sk["hll"].update(toks)
            sk["cms"].update(toks)
            sk["bottomk"].update(toks)
            sk["kll_ntok"].update(n_tok[rmask].astype(np.float64))
            sk["tdigest_ntok"].update(n_tok[rmask].astype(np.float64))
            out_src.append(name)
            out_payload.append(pickle.dumps(
                {k: v.to_bytes() for k, v in sk.items()},
                protocol=pickle.HIGHEST_PROTOCOL))
            out_rows.append(int(rmask.sum()))
            out_toks.append(int(len(toks)))
        return pa.table({
            "source": pa.array(out_src, pa.string()),
            "n_docs": pa.array(out_rows, pa.int64()),
            "n_tokens": pa.array(out_toks, pa.int64()),
            "payload": pa.array(out_payload, pa.binary()),
        })


def build_global_sketches(ds: "rd.Dataset", cfg: HbiConfig, *,
                          by_source: bool = True, concurrency=None,
                          batch_size: int = 2048) -> dict[str, dict]:
    """-> {source: {"sketches": {...}, "n_docs": int, "n_tokens": int}}.

    Partials are tiny (one row per source per batch); the final merge runs
    on the driver — at any scale the partial stream is O(batches), not
    O(tokens).
    """
    parts = ds.map_batches(
        GlobalSketchPartials(cfg, by_source), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size).take_all()
    out: dict[str, dict] = {}
    for row in parts:
        blob = pickle.loads(row["payload"])
        cur = out.setdefault(row["source"], {
            "sketches": None, "n_docs": 0, "n_tokens": 0})
        sk = {k: sketch_from_bytes(v) for k, v in blob.items()}
        if cur["sketches"] is None:
            cur["sketches"] = sk
        else:
            for k, v in sk.items():
                cur["sketches"][k].merge(v)
        cur["n_docs"] += row["n_docs"]
        cur["n_tokens"] += row["n_tokens"]
    return out


def distinct_tokens(ds: "rd.Dataset", cfg: HbiConfig, *,
                    by_source: bool = True) -> pd.DataFrame:
    """HLL distinct-token estimates (+KMV cross-check) per source/global."""
    agg = build_global_sketches(ds, cfg, by_source=by_source)
    rows = []
    for src in sorted(agg):
        s = agg[src]["sketches"]
        rows.append({
            "source": src,
            "hll_estimate": s["hll"].estimate(),
            "kmv_estimate": s["bottomk"].estimate_distinct(),
            "rel_error_bound": s["hll"].rel_error,
            "n_tokens": agg[src]["n_tokens"],
        })
    return pd.DataFrame(rows)


class _BatchTopK:
    """Per-batch exact top-M token candidates (heavy-hitter candidate gen)."""

    def __init__(self, m: int):
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, _ = flat_tokens_and_offsets(batch["tokens"])
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uk, counts = np.unique(flat, return_counts=True)
        if len(uk) > self.m:
            keep = np.argpartition(counts, -self.m)[-self.m:]
            uk, counts = uk[keep], counts[keep]
        return pa.table({"token": pa.array(uk.astype(np.int64)),
                         "cnt": pa.array(counts.astype(np.int64))})


def heavy_hitters(ds: "rd.Dataset", cfg: HbiConfig, k: int = 20, *,
                  candidate_factor: int = 8) -> pd.DataFrame:
    """Top-k tokens: candidates = union of per-batch exact top-(k*factor)
    (any global top-k token is a local top-k in at least one batch by
    pigeonhole when factor covers skew), counts estimated by the merged CMS
    (upper bound, eps*N error). Deterministic tie-break (cnt desc, token
    asc)."""
    cand = ds.map_batches(_BatchTopK(k * candidate_factor),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=8192)
    cand_df = cand.to_pandas().groupby("token", as_index=False)["cnt"].sum()
    agg = build_global_sketches(ds, cfg, by_source=False)["__all__"]
    cms = agg["sketches"]["cms"]
    toks = cand_df["token"].to_numpy()
    est = cms.estimate(toks.astype(np.uint64))
    out = pd.DataFrame({"token": toks, "est_count": est,
                        "partial_count": cand_df["cnt"]})
    out = out.sort_values(["est_count", "token"],
                          ascending=[False, True]).head(k)
    out["total_tokens"] = agg["n_tokens"]
    return out.reset_index(drop=True)


def ntok_quantiles(ds: "rd.Dataset", cfg: HbiConfig,
                   qs=(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) -> pd.DataFrame:
    """n_tok distribution quantiles from the merged KLL + t-digest."""
    agg = build_global_sketches(ds, cfg, by_source=False)["__all__"]
    kll = agg["sketches"]["kll_ntok"]
    td = agg["sketches"]["tdigest_ntok"]
    return pd.DataFrame({
        "q": list(qs),
        "kll": [kll.quantile(q) for q in qs],
        "tdigest": [td.quantile(q) for q in qs],
    })
