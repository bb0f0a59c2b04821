"""Cross-window bloom-tree upper levels (super-window filters).

The reference's window holds ``window/tree`` trees and ``HBI.report``
prunes across them before descending any single tree
(``PMIndex/HBI.java:139,207-266``); without that layer every query probes
every (source, window) partition — O(#windows) probe work per query, the
dominant query cost once windows number in the billions.

Ray shape: the per-window level-0 ("window root") blooms all key with the
SAME constant interval salt (``stages/sketch_build.py``: at level 0 the
interval id is 0 for every slot), so OR-merging ``super_fanout`` sibling
window roots yields a TRUE union membership filter probeable with the
original level-0 keys. Build is an iterative tiny aggregate over the
(shrinking) node set:

    level 1: groupby (source, window_id // F)   OR-merge window roots
    level h: groupby (source, node_id // F)     OR-merge level h-1 nodes

Each level's total bytes shrink by F, so the whole super index costs
~1/(F-1) of ONE tree level. Fixed-size filters saturate as load doubles
per level; stacking stops at ``super_fill_cap`` mean fill (a saturated
level cannot prune — query correctness never depends on super levels,
they only bound probe work). A window whose level-0 filter was dropped by
the memory policy propagates as an always-pass (null) node.

Query: descend from the top level, probing each frontier node with each
query's level-0 keys; survivors fan out to their F children; level-1
survivors expand to allowed (window, query) pairs that gate the per-window
tree probe. Missing tokens die at the top: O(F * levels) probes instead of
O(windows).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import HbiConfig
from ..state import sketch_from_bytes
from ..state.splitmix import derive_seed, splitmix64

SUPER_DIR = "super"
SUPER_META = "super_meta.json"
_SAT = "__saturated__"  # accumulator sentinel: child missing -> always-pass


def _root_salt(cfg: HbiConfig) -> np.uint64:
    """The constant level-0 probe salt (interval id 0, level-0 salt)."""
    s = derive_seed(cfg.seed, "interval_salt", 0) & 0xFFFFFFFFFFFFFFFF
    return splitmix64(np.uint64(0) ^ np.uint64(s))


def _extract_roots(batch: pd.DataFrame, fanout: int) -> pd.DataFrame:
    """Index rows -> level-1 partial rows (source, node_id, bloom|None)."""
    import pickle
    blooms = []
    for blob in batch["bloom_tree"]:
        if blob is None:
            blooms.append(None)
            continue
        tree = pickle.loads(blob)
        blooms.append(tree.get(0))  # None when the policy dropped level 0
    return pd.DataFrame({
        "source": batch["source"].astype(str),
        "node_id": (batch["window_id"].to_numpy() // fanout).astype(np.int64),
        "bloom": pd.Series(blooms, dtype=object),
    })


def _merge_nodes_block(df: pd.DataFrame) -> pd.DataFrame:
    """OR-merge child blooms per (source, node_id) within one block.

    Used twice, mirroring the stats combiner pattern: as a map-side
    in-block combiner (window-sorted blocks collapse most sibling groups
    before the shuffle) and as the per-group reduce after the groupby. A
    missing/always-pass child (None) makes the parent always-pass."""
    srcs, nodes, blooms, fills = [], [], [], []
    for (src, node), g in df.groupby(["source", "node_id"], sort=True):
        acc = None
        for v in g["bloom"]:
            if v is None:
                acc = _SAT
                break
            b = sketch_from_bytes(v)
            if acc is None:
                acc = b
            else:
                acc.merge(b)
        if acc is None or acc is _SAT:
            blob, fill = None, 1.0
        else:
            blob, fill = acc.to_bytes(), acc.fill_ratio
        srcs.append(str(src))
        nodes.append(int(node))
        blooms.append(blob)
        fills.append(float(fill))
    return pd.DataFrame({
        "source": srcs,
        "node_id": pd.Series(nodes, dtype="int64"),
        "bloom": pd.Series(blooms, dtype=object),
        "fill": pd.Series(fills, dtype="float64"),
    })


def build_super_index(out_dir: str, cfg: HbiConfig) -> dict:
    """Build the super-level store from a persisted index at ``out_dir``.

    Writes parquet rows (source, level, node_id, bloom, fill) under
    ``out_dir/super`` plus ``super_meta.json``; returns the meta dict.
    """
    from .build_index import PARTITIONS

    out = Path(out_dir)
    sup = out / SUPER_DIR
    if sup.exists():
        import shutil
        shutil.rmtree(sup)
    sup.mkdir(parents=True)
    F = cfg.super_fanout

    index_ds = rd.read_parquet(str(out / PARTITIONS),
                               columns=["source", "window_id", "bloom_tree"])
    n_sources = len(set(
        index_ds.select_columns(["source"]).unique("source")))
    child = index_ds.map_batches(_extract_roots, batch_format="pandas",
                                 fn_kwargs={"fanout": F})
    meta: dict = {"fanout": F, "levels": [], "params_hash": cfg.params_hash()}
    level = 1
    while level <= cfg.super_max_levels:
        combined = child.map_batches(_merge_nodes_block,
                                     batch_format="pandas")
        agg = combined.groupby(["source", "node_id"]).map_groups(
            _merge_nodes_block, batch_format="pandas").materialize()
        n_nodes = agg.count()
        mean_fill = float(agg.mean("fill"))
        agg.drop_columns(["fill"]).map_batches(
            lambda t, lv=level: t.append_column(
                "level", pa.array([lv] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
        ).write_parquet(str(sup / f"level={level}"))
        meta["levels"].append({"level": level, "nodes": int(n_nodes),
                               "mean_fill": round(mean_fill, 4)})
        if n_nodes <= n_sources or mean_fill > cfg.super_fill_cap:
            break
        child = agg.drop_columns(["fill"]).map_batches(
            lambda df: df.assign(node_id=df["node_id"].to_numpy() // F),
            batch_format="pandas")
        level += 1
    (out / SUPER_META).write_text(json.dumps(meta, indent=2))
    return meta


def load_super_meta(out_dir: str) -> dict | None:
    p = Path(out_dir) / SUPER_META
    if not p.exists():
        return None
    return json.loads(p.read_text())


class SuperPruneResult:
    """Per-query allowed windows after the super-level descend.

    - ``window_union``: {source: sorted np.int64 window ids} — filters
      index partitions before the per-window tree probe. ``None`` in place
      of an array means "all windows of this source" (no pruning info).
    - ``allowed``: {source: (win_sorted, offsets, qi_flat)} — per-window
      allowed query lists for the tree probe's seed levels.
    - ``probes``: number of (node, query) bloom probes performed — the
      quantity the super levels exist to bound (asserted in tests).
    """

    def __init__(self, window_union: dict, allowed: dict, probes: int,
                 covered_sources: set[str]):
        self.window_union = window_union
        self.allowed = allowed
        self.probes = probes
        self.covered_sources = covered_sources


def _probe_rows(rows: pd.DataFrame, frontier: dict, probe_keys: list,
                n_probes: list) -> list[tuple[str, int, int]]:
    """Probe each (row, query-in-frontier) pair; return survivors."""
    out = []
    for src, node, blob in zip(rows["source"], rows["node_id"],
                               rows["bloom"]):
        qs = frontier.get((str(src), int(node)))
        if qs is None:
            continue
        if blob is None:        # always-pass node (dropped level-0 child)
            out.extend((str(src), int(node), qi) for qi in qs)
            continue
        bloom = sketch_from_bytes(blob)
        for qi in qs:
            keys = probe_keys[qi]
            n_probes[0] += 1
            if bloom.contains(keys).all():
                out.append((str(src), int(node), qi))
    return out


def super_prune(out_dir: str, cfg: HbiConfig, compiled: list[dict], *,
                sources: list[str] | None = None,
                window_range: tuple[int, int] | None = None,
                driver_cache_bytes: int = 64 << 20) -> SuperPruneResult | None:
    """Descend the super levels for a compiled query batch.

    Small super stores (< ``driver_cache_bytes``) are read once and
    descended driver-locally (the upper tree is tiny relative to the index
    — a query coordinator would cache it); larger stores descend level by
    level with predicate-pushdown parquet reads and a frontier-filtered
    probe per level, so the frontier (true regions + FPR * nodes) is the
    only driver-resident state at any scale.
    """
    meta = load_super_meta(out_dir)
    if meta is None or not meta["levels"]:
        return None
    F = meta["fanout"]
    top = meta["levels"][-1]["level"]
    salt = _root_salt(cfg)
    probe_keys = [np.asarray(q["ngram_keys"], dtype=np.uint64) ^ salt
                  for q in compiled]
    n_q = len(compiled)
    sup_path = Path(out_dir) / SUPER_DIR
    total_bytes = sum(f.stat().st_size for f in sup_path.rglob("*.parquet"))
    local = total_bytes <= driver_cache_bytes

    def load_level(lv: int, node_filter: set | None) -> pd.DataFrame:
        ds = rd.read_parquet(str(sup_path / f"level={lv}"))
        df = ds.to_pandas() if node_filter is None else None
        if df is None:
            nodes = pa.array(sorted({n for _, n in node_filter}),
                             pa.int64())
            import pyarrow.compute as pc
            df = ds.map_batches(
                lambda t: t.filter(pc.is_in(t["node_id"],
                                            value_set=nodes)),
                batch_format="pyarrow").to_pandas()
        df["source"] = df["source"].astype(str)
        if sources is not None:
            df = df[df["source"].isin(set(sources))]
        return df

    cache: dict[int, pd.DataFrame] = {}
    if local:
        for lv in range(1, top + 1):
            cache[lv] = load_level(lv, None)

    def node_window_span(node: int, lv: int) -> tuple[int, int]:
        return node * F ** lv, (node + 1) * F ** lv

    # top frontier: every top-level node x every query (scope-filtered)
    top_df = cache[top] if local else load_level(top, None)
    frontier: dict[tuple[str, int], list[int]] = {}
    for src, node in zip(top_df["source"], top_df["node_id"]):
        lo, hi = node_window_span(int(node), top)
        if window_range is not None and (lo >= window_range[1]
                                         or hi <= window_range[0]):
            continue
        frontier[(str(src), int(node))] = list(range(n_q))
    covered = set(top_df["source"].unique())

    n_probes = [0]
    win_allowed: list[tuple[str, int, int]] = []
    for lv in range(top, 0, -1):
        if not frontier:
            break
        rows = cache[lv] if local else load_level(lv, set(frontier))
        fkeys = pd.MultiIndex.from_tuples(frontier.keys())
        rows = rows[pd.MultiIndex.from_arrays(
            [rows["source"], rows["node_id"]]).isin(fkeys)]
        survivors = _probe_rows(rows, frontier, probe_keys, n_probes)
        if lv == 1:
            frontier = {}
            win_allowed = survivors
            break
        nxt: dict[tuple[str, int], list[int]] = {}
        for src, node, qi in survivors:
            for c in range(F):
                key = (src, node * F + c)
                nxt.setdefault(key, []).append(qi)
        frontier = nxt

    # expand level-1 survivors to (source, window, qi)
    union: dict[str, np.ndarray] = {s: np.empty(0, np.int64)
                                    for s in covered}
    per_src: dict[str, list[tuple[int, int]]] = {}
    for src, node, qi in win_allowed:
        lo, hi = node_window_span(node, 1)
        if window_range is not None:
            lo = max(lo, window_range[0])
            hi = min(hi, window_range[1])
        for w in range(lo, hi):
            per_src.setdefault(src, []).append((w, qi))
    allowed: dict[str, tuple] = {}
    for src, pairs in per_src.items():
        arr = np.array(pairs, dtype=np.int64)
        order = np.lexsort((arr[:, 1], arr[:, 0]))
        arr = arr[order]
        wins, starts = np.unique(arr[:, 0], return_index=True)
        offs = np.concatenate([starts, [len(arr)]]).astype(np.int64)
        allowed[src] = (wins, offs, arr[:, 1])
        union[src] = wins
    return SuperPruneResult(union, allowed, n_probes[0], covered)
