"""Reduce side of the sketch UDAF: merge serialized partials per
``(source, window_id)`` group.

Runs inside ``groupby(["source","window_id"]).map_groups(...)`` — the one
shuffle of the build, keyed exactly like the reference's per-tree locality
(``PMIndex/HBI.java:230-261``). Merges are the sketch kernels' associative
``merge`` (Bloom OR, CMS add, HLL max, HOPS min-select, bottom-k re-top-k,
KLL/t-digest compaction), so partial arrival order is irrelevant.
"""

from __future__ import annotations

import pickle

import pandas as pd

from ..config import HbiConfig
from ..state import sketch_from_bytes

INDEX_BLOB_COLS = ("bloom_tree", "hll", "cms", "kll_ntok", "tdigest_ntok",
                   "hops", "bottomk")


def merge_payloads(payloads) -> dict:
    """Merge a sequence of pickled sketch-dict payloads into live sketches.

    ``bloom_tree`` payloads are ``{level: bytes}`` dicts (PREDICTIVE
    pre-drop may omit shallow levels); the merged tree keeps the
    INTERSECTION of levels — a level absent from any partial would be
    missing that partial's keys and probing it would yield false
    negatives."""
    acc: dict[str, object] = {}
    for raw in payloads:
        blob = pickle.loads(raw)
        for kind, data in blob.items():
            if isinstance(data, dict):  # bloom tree: {level: bytes}
                levels = {int(lv): sketch_from_bytes(b)
                          for lv, b in data.items()}
                if kind not in acc:
                    acc[kind] = levels
                else:
                    mine = acc[kind]
                    common = set(mine) & set(levels)
                    acc[kind] = {lv: mine[lv].merge(levels[lv])
                                 for lv in common}
            else:
                sk = sketch_from_bytes(data)
                if kind not in acc:
                    acc[kind] = sk
                else:
                    acc[kind].merge(sk)
    return acc


def finalize_unique_partials(batch: pd.DataFrame, *, params_hash: str,
                             policy: dict | None = None) -> pd.DataFrame:
    """No-shuffle finalize: every partial row is already the only one for
    its (source, window) key (verified by a keys-only aggregate before this
    path is taken), so each row becomes an index row directly — the 900x
    heavier payload shuffle is skipped entirely."""
    if not len(batch):
        # empty map block (PartialSketchBuilder can emit empty tables):
        # return the index-row schema with zero rows instead of letting
        # merge_partials_group hit iloc[0]
        cols: dict[str, pd.Series] = {
            "source": pd.Series([], dtype=object),
            "window_id": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "params_hash": pd.Series([], dtype=object),
        }
        for kind in INDEX_BLOB_COLS:
            cols[kind] = pd.Series([], dtype=object)
        cols["root_bloom"] = pd.Series([], dtype=object)
        cols["index_bytes"] = pd.Series([], dtype="int64")
        return pd.DataFrame(cols)
    out = [merge_partials_group(batch.iloc[i:i + 1], params_hash=params_hash,
                                policy=policy)
           for i in range(len(batch))]
    return pd.concat(out, ignore_index=True)


def merge_partials_group(group: pd.DataFrame, *, params_hash: str,
                         policy: dict | None = None) -> pd.DataFrame:
    """map_groups fn (plain function -> elastic task pool, no CPU pinning):
    partial rows of one (source, window) -> one index row with per-kind blob
    columns + stats. The ``bloom_tree`` column holds a pickled
    ``{level: bytes}`` dict (levels may be dropped by the memory policy).

    Fast path: when the window received exactly ONE partial (the common
    case when batch boundaries align with windows) and no policy is
    active, its serialized bytes are reused verbatim — no
    deserialize/merge/recompress round-trip.
    """
    n_tokens_total = int(group["n_tokens"].sum())
    if len(group) == 1 and policy is None:
        blobs = {k: ({int(lv): bytes(b) for lv, b in v.items()}
                     if isinstance(v, dict) else bytes(v))
                 for k, v in pickle.loads(group["payload"].iloc[0]).items()}
    else:
        merged = merge_payloads(group["payload"].tolist())
        keep_from = 0
        if policy is not None and "bloom_tree" in merged:
            from ..pipelines.planner import memory_policy_level
            cms = merged.get("cms")
            sampler = merged.get("bottomk") or merged.get("hops")
            if cms is not None and sampler is not None:
                reps = sampler.sample_keys()
                freqs = cms.estimate(reps) if len(reps) else []
                keep_from = memory_policy_level(
                    freqs, n_tokens_total, quantile=policy["quantile"],
                    conf=policy["conf"], fp=policy["fp"],
                    max_depth=policy["max_depth"])
        blobs = {}
        for k, v in merged.items():
            if isinstance(v, dict):
                blobs[k] = {lv: s.to_bytes() for lv, s in v.items()
                            if lv >= keep_from}
            else:
                blobs[k] = v.to_bytes()
    row = {
        "source": [group["source"].iloc[0]],
        "window_id": [int(group["window_id"].iloc[0])],
        "n_docs": [int(group["n_docs"].sum())],
        "n_tokens": [n_tokens_total],
        "params_hash": [params_hash],
    }
    total_bytes = 0
    for kind in INDEX_BLOB_COLS:
        if kind in blobs:
            obj = blobs[kind]
            blob = (pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
                    if isinstance(obj, dict) else obj)
            total_bytes += len(blob)
            row[kind] = [blob]
        else:
            row[kind] = [None]
    # window-root (level-0) bloom as its own column: the super-level build
    # (pipelines/super_index.py) reads ONLY this column instead of
    # deserializing the whole tree blob per window
    tree = blobs.get("bloom_tree")
    row["root_bloom"] = [tree.get(0) if isinstance(tree, dict) else None]
    row["index_bytes"] = [total_bytes]
    return pd.DataFrame(row)
