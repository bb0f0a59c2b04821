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
import math
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
STORE_FORMAT = 2  # 2 = raw uint64 bloom words (v1 stored write_blob blobs)
_SAT = "__saturated__"  # accumulator sentinel: child missing -> always-pass


def _root_salt(cfg: HbiConfig) -> np.uint64:
    """The constant level-0 probe salt (interval id 0, level-0 salt)."""
    s = derive_seed(cfg.seed, "interval_salt", 0) & 0xFFFFFFFFFFFFFFFF
    return splitmix64(np.uint64(0) ^ np.uint64(s))


def _fill(words: np.ndarray) -> float:
    """Set-bit fraction of a raw uint64 word array."""
    if hasattr(np, "bitwise_count"):
        bits = int(np.bitwise_count(words).sum())
    else:
        bits = int(np.unpackbits(words.view(np.uint8)).sum())
    return bits / (len(words) * 64)


def _ref_bloom(cfg: HbiConfig):
    """The (m, k, seed) family every super node shares: identical to the
    window-root filters built by stages/sketch_build (level 0 sizing and
    seed chain)."""
    from ..state import BloomFilter
    from ..state.splitmix import derive_seed as ds_
    return BloomFilter(cfg.level_expected_distinct(0), cfg.fp,
                       ds_(cfg.seed, "bloom", 0))


def _extract_roots(batch: pd.DataFrame, fanout: int) -> pd.DataFrame:
    """Index rows -> level-0 node rows (source, node_id, bloom|None).

    Prefers the dedicated ``root_bloom`` column (written by
    ``stages/merge.py`` precisely so this scan reads ~1/levels of the
    index); falls back to unpickling ``bloom_tree`` for older indexes."""
    if "root_bloom" in batch.columns:
        blobs = list(batch["root_bloom"])
    else:
        import pickle
        blobs = []
        for blob in batch["bloom_tree"]:
            if blob is None:
                blobs.append(None)
                continue
            tree = pickle.loads(blob)
            blobs.append(tree.get(0))  # None when policy dropped level 0
    # super store protocol: RAW uint64 bloom words (no per-node blob
    # header/zlib — the descend decodes thousands of nodes; frombuffer is
    # free, zlib was the serial driver cost). Filter params (m, k, seed)
    # are reconstructed from the config at probe time.
    blooms = [None if b is None else
              sketch_from_bytes(b).words.tobytes() for b in blobs]
    return pd.DataFrame({
        "source": batch["source"].astype(str),
        "node_id": (batch["window_id"].to_numpy() // fanout).astype(np.int64),
        "bloom": pd.Series(blooms, dtype=object),
    })


SUBTREE_HEIGHT = 8  # levels built per groupby round (group = F^8 children)


def _build_subtree(g: pd.DataFrame, *, base_level: int, fanout: int,
                   height: int) -> pd.DataFrame:
    """map_groups reduce: from one subtree's level-``base_level`` nodes,
    OR-merge upward ``height`` levels locally (numpy word ORs — no
    per-level Ray job). Emits rows for levels base+1..base+height. A
    missing/always-pass child (None bloom) makes every ancestor
    always-pass."""
    cur: dict[int, object] = {}
    src = str(g["source"].iloc[0])
    for node, blob in zip(g["node_id"], g["bloom"]):
        cur[int(node)] = (None if blob is None
                          else np.frombuffer(blob, dtype=np.uint64))
    out_src, out_lv, out_node, out_bloom, out_fill = [], [], [], [], []
    for h in range(1, height + 1):
        nxt: dict[int, object] = {}
        for node, words in cur.items():
            parent = node // fanout
            if parent in nxt and nxt[parent] is _SAT:
                continue
            if words is None:
                nxt[parent] = _SAT
                continue
            acc = nxt.get(parent)
            if acc is None:
                # copy-on-first-merge keeps child rows reusable
                nxt[parent] = words.copy()
            elif acc is not _SAT:
                acc |= words
        for parent, acc in sorted(nxt.items()):
            sat = acc is _SAT
            out_src.append(src)
            out_lv.append(base_level + h)
            out_node.append(parent)
            out_bloom.append(None if sat else acc.tobytes())
            out_fill.append(1.0 if sat else _fill(acc))
        cur = {n: (None if a is _SAT else a) for n, a in nxt.items()}
    return pd.DataFrame({
        "source": out_src,
        "level": pd.Series(out_lv, dtype="int32"),
        "node_id": pd.Series(out_node, dtype="int64"),
        "bloom": pd.Series(out_bloom, dtype=object),
        "fill": pd.Series(out_fill, dtype="float64"),
    })


def build_super_index(out_dir: str, cfg: HbiConfig, *,
                      local_bytes_limit: int = 256 << 20) -> dict:
    """Build the super-level store from a persisted index at ``out_dir``.

    Subtree-batched: ONE groupby round builds ``SUBTREE_HEIGHT`` levels
    (each group holds at most F^8 = 256 child blooms, a bounded ~MBs
    payload at any corpus size), then recursion continues on the subtree
    roots — the node set shrinks 256x per round, so a billion windows
    need four rounds, not thirty sequential per-level jobs.

    Writes parquet rows (source, node_id, bloom, fill) under
    ``out_dir/super/level=H`` plus ``super_meta.json``; returns the meta
    dict.
    """
    from .build_index import PARTITIONS

    out = Path(out_dir)
    sup = out / SUPER_DIR
    if sup.exists():
        import shutil
        shutil.rmtree(sup)
    sup.mkdir(parents=True)
    F = cfg.super_fanout

    # n_sources from the manifest (no discovery job); root blooms from the
    # dedicated column (no full-tree deserialization)
    manifest_p = out / "manifest.json"
    if manifest_p.exists():
        n_sources = len(json.loads(manifest_p.read_text()).get(
            "completed_sources", [])) or 1
    else:
        ds0 = rd.read_parquet(str(out / PARTITIONS), columns=["source"])
        n_sources = len(set(ds0.unique("source")))
    import pyarrow.parquet as pq
    have_root = "root_bloom" in pq.read_schema(
        next((out / PARTITIONS).rglob("*.parquet")).as_posix()).names
    cols = (["source", "window_id", "root_bloom"] if have_root
            else ["source", "window_id", "bloom_tree"])
    meta: dict = {"format": STORE_FORMAT, "fanout": F, "levels": [],
                  "params_hash": cfg.params_hash()}

    # driver-local fast path for small stores: one pyarrow scan + in-proc
    # rollup beats several Ray jobs' fixed latency. The distributed rounds
    # below are the scale path (bounded F^8-children groups per round).
    root_bytes = sum(f.stat().st_size
                     for f in (out / PARTITIONS).rglob("*.parquet"))
    if have_root and root_bytes <= local_bytes_limit:
        import pyarrow.dataset as pads
        tbl = pads.dataset(str(out / PARTITIONS), format="parquet",
                           partitioning="hive").to_table(columns=cols)
        df = _extract_roots(tbl.to_pandas(), fanout=1)
        if len(df):
            max_win = int(df.groupby("source")["node_id"].max().max())
            height = min(cfg.super_max_levels,
                         max(1, math.ceil(math.log(max_win + 1, F))))
            frames = [
                _build_subtree(g, base_level=0, fanout=F, height=height)
                for _, g in df.groupby("source", sort=True)]
            rows_df = pd.concat(frames, ignore_index=True)
            stats = (rows_df.groupby("level")
                     .agg(nodes=("node_id", "size"),
                          mean_fill=("fill", "mean")).reset_index()
                     .sort_values("level"))
            stop_level = None
            for _, s in stats.iterrows():
                meta["levels"].append(
                    {"level": int(s["level"]), "nodes": int(s["nodes"]),
                     "mean_fill": round(float(s["mean_fill"]), 4)})
                if (s["mean_fill"] > cfg.super_fill_cap
                        or s["nodes"] <= n_sources):
                    stop_level = int(s["level"])
                    break
            keep_to = stop_level if stop_level is not None else height
            meta["levels"] = [lv for lv in meta["levels"]
                              if lv["level"] <= keep_to]
            for lv, g in rows_df[rows_df["level"] <= keep_to].groupby(
                    "level"):
                d = sup / f"level={int(lv)}"
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(
                    pa.table({
                        "source": pa.array(g["source"], pa.string()),
                        "node_id": pa.array(g["node_id"], pa.int64()),
                        "bloom": pa.array(list(g["bloom"]), pa.binary()),
                    }), str(d / "part-0.parquet"))
        (out / SUPER_META).write_text(json.dumps(meta, indent=2))
        return meta

    index_ds = rd.read_parquet(str(out / PARTITIONS), columns=cols)
    child = index_ds.map_batches(_extract_roots, batch_format="pandas",
                                 fn_kwargs={"fanout": 1})
    base = 0
    while base < cfg.super_max_levels:
        height = min(SUBTREE_HEIGHT, cfg.super_max_levels - base)
        span = F ** height

        def to_group_key(df: pd.DataFrame, *, span=span) -> pd.DataFrame:
            return df.assign(_grp=df["node_id"].to_numpy() // span)

        rows = (child.map_batches(to_group_key, batch_format="pandas")
                .groupby(["source", "_grp"])
                .map_groups(_build_subtree, batch_format="pandas",
                            fn_kwargs={"base_level": base, "fanout": F,
                                       "height": height})
                ).materialize()
        if rows.count() == 0:
            break
        # per-level stats (one tiny aggregate for all levels of the round)
        from ray.data.aggregate import Count, Mean
        stats = (rows.groupby("level")
                 .aggregate(Count(alias_name="nodes"),
                            Mean("fill", alias_name="mean_fill"))
                 .to_pandas().sort_values("level"))
        stop_level = None
        for _, s in stats.iterrows():
            meta["levels"].append({"level": int(s["level"]),
                                   "nodes": int(s["nodes"]),
                                   "mean_fill": round(float(s["mean_fill"]),
                                                      4)})
            if (s["mean_fill"] > cfg.super_fill_cap
                    or s["nodes"] <= n_sources):
                stop_level = int(s["level"])
                break
        keep_to = stop_level if stop_level is not None else base + height
        meta["levels"] = [lv for lv in meta["levels"]
                          if lv["level"] <= keep_to]
        import pyarrow.compute as pc
        (rows.map_batches(
            lambda t: t.filter(pc.less_equal(t["level"], keep_to)),
            batch_format="pyarrow")
         .drop_columns(["fill"])
         .write_parquet(str(sup), partition_cols=["level"], mode="append"))
        if stop_level is not None:
            break
        top = base + height
        child = rows.map_batches(
            lambda t, lv=top: t.filter(pc.equal(t["level"], lv)),
            batch_format="pyarrow").drop_columns(["level", "fill"])
        base = top
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
                n_probes: list, idx_cache: dict
                ) -> list[tuple[str, int, int]]:
    """Probe every (node, frontier-query) pair of one level in ONE
    vectorized gather: all super blooms share (m, k, seed), so each
    query's bloom bit positions are computed once (``idx_cache``) and the
    level probe is a fancy-index into the stacked node word matrix plus a
    per-pair reduceat — no per-pair Python or per-node deserialization
    beyond the word-array decode."""
    srcs = rows["source"].astype(str).tolist()
    nodes = rows["node_id"].astype(int).tolist()
    blobs = list(rows["bloom"])
    out: list[tuple[str, int, int]] = []
    mats: list[np.ndarray] = []
    pair_mat: list[int] = []
    pair_meta: list[tuple[str, int, int]] = []
    for src, node, blob in zip(srcs, nodes, blobs):
        qs = frontier.get((src, node))
        if qs is None:
            continue
        if blob is None:        # always-pass node (dropped level-0 child)
            out.extend((src, node, qi) for qi in qs)
            continue
        mi = len(mats)
        mats.append(np.frombuffer(blob, dtype=np.uint64))
        for qi in qs:
            if qi not in idx_cache:
                idx = idx_cache["ref"]._indices(probe_keys[qi])
                idx_cache[qi] = ((idx >> np.uint64(6)).ravel(),
                                 (idx & np.uint64(63)).ravel())
            pair_mat.append(mi)
            pair_meta.append((src, node, qi))
    if not pair_meta:
        return out
    n_probes[0] += len(pair_meta)
    words = np.stack(mats)
    seg_lens = np.array([len(idx_cache[qi][0]) for _, _, qi in pair_meta],
                        dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
    rows_rep = np.repeat(np.array(pair_mat, dtype=np.int64), seg_lens)
    widx = np.concatenate([idx_cache[qi][0] for _, _, qi in pair_meta])
    bits = np.concatenate([idx_cache[qi][1] for _, _, qi in pair_meta])
    vals = (words[rows_rep, widx.astype(np.int64)] >> bits) & np.uint64(1)
    ok = np.logical_and.reduceat(vals.astype(bool), offs)
    out.extend(meta for meta, good in zip(pair_meta, ok) if good)
    return out


_LOCAL_CACHE: dict[tuple, dict] = {}


def _load_super_local(sup_path: str) -> dict[int, pd.DataFrame]:
    """One plain-pyarrow read of the whole (small) super store, split per
    level — a single filesystem scan instead of one Ray read job per
    level. Cached across calls keyed by (path, latest parquet mtime)."""
    import pyarrow.dataset as pads
    files = sorted(Path(sup_path).rglob("*.parquet"))
    stamp = (sup_path, max((f.stat().st_mtime_ns for f in files),
                           default=0), len(files))
    hit = _LOCAL_CACHE.get(sup_path)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    tbl = pads.dataset(sup_path, format="parquet",
                       partitioning="hive").to_table()
    df = tbl.to_pandas()
    df["source"] = df["source"].astype(str)
    out = {int(lv): g.drop(columns=["level"])
           for lv, g in df.groupby("level")}
    _LOCAL_CACHE.clear()  # bound memory: keep one store at a time
    _LOCAL_CACHE[sup_path] = (stamp, out)
    return out


def super_prune(out_dir: str, cfg: HbiConfig, compiled: list[dict], *,
                sources: list[str] | None = None,
                window_range: tuple[int, int] | None = None,
                driver_cache_bytes: int = 1 << 30) -> SuperPruneResult | None:
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
    if meta.get("format") != STORE_FORMAT:
        return None  # older store layout: skip pruning rather than misread
    if meta.get("params_hash") not in (None, cfg.params_hash()):
        # filters were sized/seeded under a different config; probing them
        # with this cfg's key family would mis-index — skip pruning (the
        # per-window probe still guards correctness via its own checks)
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
        cache = _load_super_local(str(sup_path))
        if sources is not None:
            src_set = set(sources)
            cache = {lv: df[df["source"].isin(src_set)]
                     for lv, df in cache.items()}

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
    # shared across levels: every super node is in the same (m, k, seed)
    # filter family as the window roots, reconstructed from the config
    idx_cache: dict = {"ref": _ref_bloom(cfg)}
    win_allowed: list[tuple[str, int, int]] = []
    for lv in range(top, 0, -1):
        if not frontier:
            break
        rows = cache[lv] if local else load_level(lv, set(frontier))
        fkeys = pd.MultiIndex.from_tuples(frontier.keys())
        rows = rows[pd.MultiIndex.from_arrays(
            [rows["source"], rows["node_id"]]).isin(fkeys)]
        survivors = _probe_rows(rows, frontier, probe_keys, n_probes,
                                idx_cache)
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
