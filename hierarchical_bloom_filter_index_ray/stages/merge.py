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
    """Merge a sequence of pickled sketch-dict payloads into live sketches."""
    acc: dict[str, object] = {}
    for raw in payloads:
        blob = pickle.loads(raw)
        for kind, data in blob.items():
            if isinstance(data, list):  # bloom tree: one filter per level
                levels = [sketch_from_bytes(b) for b in data]
                if kind not in acc:
                    acc[kind] = levels
                else:
                    for mine, new in zip(acc[kind], levels):
                        mine.merge(new)
            else:
                sk = sketch_from_bytes(data)
                if kind not in acc:
                    acc[kind] = sk
                else:
                    acc[kind].merge(sk)
    return acc


def merge_partials_group(group: pd.DataFrame, *, params_hash: str
                         ) -> pd.DataFrame:
    """map_groups fn (plain function -> elastic task pool, no CPU pinning):
    partial rows of one (source, window) -> one index row with per-kind blob
    columns + stats."""
    merged = merge_payloads(group["payload"].tolist())
    row = {
        "source": [group["source"].iloc[0]],
        "window_id": [int(group["window_id"].iloc[0])],
        "n_docs": [int(group["n_docs"].sum())],
        "n_tokens": [int(group["n_tokens"].sum())],
        "params_hash": [params_hash],
    }
    total_bytes = 0
    for kind in INDEX_BLOB_COLS:
        if kind in merged:
            obj = merged[kind]
            if isinstance(obj, list):
                blob = pickle.dumps([s.to_bytes() for s in obj],
                                    protocol=pickle.HIGHEST_PROTOCOL)
            else:
                blob = obj.to_bytes()
            total_bytes += len(blob)
            row[kind] = [blob]
        else:
            row[kind] = [None]
    row["index_bytes"] = [total_bytes]
    return pd.DataFrame(row)
