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


class _Level:
    """Probe-ready representation of one super level: all node blooms
    stacked into ONE uint64 word matrix at load time (stacking once per
    store open amortizes across every query batch — the per-descend
    ``np.stack`` was the dominant serial probe cost), plus a per-source
    sorted node index for vectorized (source, node) -> row lookup."""

    __slots__ = ("index", "mat", "null_rows", "sources", "nodes")

    def __init__(self, df: pd.DataFrame):
        srcs = df["source"].astype(str).to_numpy(dtype=object)
        nodes = df["node_id"].to_numpy().astype(np.int64)
        blobs = list(df["bloom"])
        null = np.array([b is None for b in blobs], dtype=bool)
        n_words = next((len(b) // 8 for b in blobs if b is not None), 0)
        mat = np.zeros((len(blobs), max(n_words, 1)), dtype=np.uint64)
        for i, b in enumerate(blobs):
            if b is not None:
                mat[i] = np.frombuffer(b, dtype=np.uint64)
        self.mat = mat
        self.null_rows = null
        self.sources = srcs
        self.nodes = nodes
        self.index: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for s in np.unique(srcs) if len(srcs) else []:
            rows = np.nonzero(srcs == s)[0]
            order = np.argsort(nodes[rows])
            self.index[str(s)] = (nodes[rows[order]], rows[order])

    def lookup(self, src: np.ndarray, node: np.ndarray
               ) -> np.ndarray:
        """Row index per (source, node) pair; -1 where absent."""
        out = np.full(len(src), -1, dtype=np.int64)
        for s in np.unique(src) if len(src) else []:
            ent = self.index.get(str(s))
            if ent is None:
                continue
            nodes_sorted, rows = ent
            m = src == s
            pos = np.searchsorted(nodes_sorted, node[m])
            ok = pos < len(nodes_sorted)
            hit = np.zeros(int(m.sum()), dtype=bool)
            hit[ok] = nodes_sorted[pos[ok]] == node[m][ok]
            tgt = np.nonzero(m)[0][hit]
            out[tgt] = rows[pos[hit]]
        return out


def _load_super_local(sup_path: str) -> dict[int, "_Level"]:
    """One plain-pyarrow read of the whole (small) super store, split per
    level into probe-ready ``_Level`` structs. Cached across calls keyed
    by (path, latest parquet mtime) — in the query-coordinator actor this
    cache makes the store open a once-per-index cost, not per-batch."""
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
    out = {int(lv): _Level(g.drop(columns=["level"]))
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
    n_q = len(compiled)
    sup_path = Path(out_dir) / SUPER_DIR
    total_bytes = sum(f.stat().st_size for f in sup_path.rglob("*.parquet"))
    local = total_bytes <= driver_cache_bytes

    if local:
        levels = _load_super_local(str(sup_path))
        f_src, f_node, f_qi, covered, probes = _descend_local(
            levels, top, F, cfg, compiled,
            sources=sources, window_range=window_range)
    else:
        f_src, f_node, f_qi, covered, probes = _descend_streaming(
            sup_path, top, F, cfg, compiled,
            sources=sources, window_range=window_range)

    union, allowed = _expand_allowed(f_src, f_node, f_qi, F,
                                     window_range, covered)
    return SuperPruneResult(union, allowed, probes, covered)


def _query_bit_positions(cfg: HbiConfig, compiled: list[dict]
                         ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-query bloom (word, bit) positions, computed ONCE per descend —
    every super node shares the window-root (m, k, seed) family."""
    salt = _root_salt(cfg)
    ref = _ref_bloom(cfg)
    widx: list[np.ndarray] = []
    bbits: list[np.ndarray] = []
    for q in compiled:
        idx = ref._indices(
            np.asarray(q["ngram_keys"], dtype=np.uint64) ^ salt)
        widx.append((idx >> np.uint64(6)).ravel().astype(np.int64))
        bbits.append((idx & np.uint64(63)).ravel())
    return widx, bbits


def _descend_local(levels: dict[int, "_Level"], top: int, F: int,
                   cfg: HbiConfig, compiled: list[dict], *,
                   sources, window_range
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              set, int]:
    """Vectorized descend over probe-ready ``_Level`` structs: the
    frontier is three parallel pair arrays (source, node, query); each
    level costs one (source, node) -> row lookup plus ONE fancy-index
    bit gather per distinct query — no per-pair Python, no per-descend
    ``np.stack`` (the matrix was stacked once at store open)."""
    widx, bbits = _query_bit_positions(cfg, compiled)
    n_q = len(compiled)
    lvl_top = levels[top]
    src_parts: list[np.ndarray] = []
    node_parts: list[np.ndarray] = []
    allowed_src = None if sources is None else set(sources)
    for s, (nodes_sorted, _rows) in sorted(lvl_top.index.items()):
        if allowed_src is not None and s not in allowed_src:
            continue
        node_parts.append(nodes_sorted)
        src_parts.append(np.full(len(nodes_sorted), s, dtype=object))
    covered = set(lvl_top.index)
    if allowed_src is not None:
        covered &= allowed_src
    empty = (np.empty(0, dtype=object), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if not node_parts:
        return (*empty, covered, 0)
    t_src = np.concatenate(src_parts)
    t_node = np.concatenate(node_parts)
    if window_range is not None:
        span = F ** top
        keep = ((t_node + 1) * span > window_range[0]) \
            & (t_node * span < window_range[1])
        t_src, t_node = t_src[keep], t_node[keep]
    f_src = np.repeat(t_src, n_q)
    f_node = np.repeat(t_node, n_q)
    f_qi = np.tile(np.arange(n_q, dtype=np.int64), len(t_node))
    probes = 0
    for lv in range(top, 0, -1):
        if not len(f_src):
            return (*empty, covered, probes)
        L = levels[lv]
        rows = L.lookup(f_src, f_node)
        present = rows >= 0
        f_src, f_node, f_qi, rows = (f_src[present], f_node[present],
                                     f_qi[present], rows[present])
        nullr = L.null_rows[rows]
        ok = nullr.copy()  # always-pass nodes (policy-dropped children)
        todo = ~nullr
        if todo.any():
            for qi in np.unique(f_qi[todo]):
                sel = todo & (f_qi == qi)
                r = rows[sel]
                vals = ((L.mat[r[:, None], widx[qi][None, :]]
                         >> bbits[qi][None, :]) & np.uint64(1))
                ok[sel] = vals.all(axis=1)
                probes += len(r)
        f_src, f_node, f_qi = f_src[ok], f_node[ok], f_qi[ok]
        if lv == 1:
            break
        f_src = np.repeat(f_src, F)
        f_qi = np.repeat(f_qi, F)
        f_node = (f_node[:, None] * F
                  + np.arange(F, dtype=np.int64)).ravel()
    return f_src, f_node, f_qi, covered, probes


def _descend_streaming(sup_path: Path, top: int, F: int, cfg: HbiConfig,
                       compiled: list[dict], *, sources, window_range
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  set, int]:
    """Level-by-level descend for stores too big to cache: each level is
    a predicate-pushdown parquet read filtered to the frontier's nodes,
    so the frontier (true regions + FPR * nodes) is the only resident
    state at any scale."""
    n_q = len(compiled)
    salt = _root_salt(cfg)
    probe_keys = [np.asarray(q["ngram_keys"], dtype=np.uint64) ^ salt
                  for q in compiled]

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

    top_df = load_level(top, None)
    frontier: dict[tuple[str, int], list[int]] = {}
    span = F ** top
    for src, node in zip(top_df["source"], top_df["node_id"]):
        lo, hi = int(node) * span, (int(node) + 1) * span
        if window_range is not None and (lo >= window_range[1]
                                         or hi <= window_range[0]):
            continue
        frontier[(str(src), int(node))] = list(range(n_q))
    covered = set(top_df["source"].unique())
    n_probes = [0]
    idx_cache: dict = {"ref": _ref_bloom(cfg)}
    win_allowed: list[tuple[str, int, int]] = []
    for lv in range(top, 0, -1):
        if not frontier:
            break
        rows = load_level(lv, set(frontier))
        fkeys = pd.MultiIndex.from_tuples(frontier.keys())
        rows = rows[pd.MultiIndex.from_arrays(
            [rows["source"], rows["node_id"]]).isin(fkeys)]
        survivors = _probe_rows(rows, frontier, probe_keys, n_probes,
                                idx_cache)
        if lv == 1:
            win_allowed = survivors
            break
        nxt: dict[tuple[str, int], list[int]] = {}
        for src, node, qi in survivors:
            for c in range(F):
                nxt.setdefault((src, node * F + c), []).append(qi)
        frontier = nxt
    if win_allowed:
        f_src = np.array([s for s, _, _ in win_allowed], dtype=object)
        f_node = np.array([n for _, n, _ in win_allowed], dtype=np.int64)
        f_qi = np.array([q for _, _, q in win_allowed], dtype=np.int64)
    else:
        f_src = np.empty(0, dtype=object)
        f_node = np.empty(0, np.int64)
        f_qi = np.empty(0, np.int64)
    return f_src, f_node, f_qi, covered, n_probes[0]


def _expand_allowed(f_src: np.ndarray, f_node: np.ndarray,
                    f_qi: np.ndarray, F: int, window_range,
                    covered: set) -> tuple[dict, dict]:
    """Level-1 survivor pairs -> per-source allowed-window structs
    (vectorized: one factorize + one lexsort, no per-pair Python)."""
    union: dict[str, np.ndarray] = {s: np.empty(0, np.int64)
                                    for s in covered}
    allowed: dict[str, tuple] = {}
    if not len(f_src):
        return union, allowed
    w = (f_node[:, None] * F + np.arange(F, dtype=np.int64)).ravel()
    s = np.repeat(f_src, F)
    q = np.repeat(f_qi, F)
    if window_range is not None:
        keep = (w >= window_range[0]) & (w < window_range[1])
        w, s, q = w[keep], s[keep], q[keep]
    if not len(w):
        return union, allowed
    uniq_src, codes = np.unique(s, return_inverse=True)
    order = np.lexsort((q, w, codes))
    codes, w, q = codes[order], w[order], q[order]
    bounds = np.searchsorted(codes, np.arange(len(uniq_src) + 1))
    for i, src in enumerate(uniq_src):
        wi = w[bounds[i]:bounds[i + 1]]
        qi = q[bounds[i]:bounds[i + 1]]
        wins, starts = np.unique(wi, return_index=True)
        offs = np.concatenate([starts, [len(wi)]]).astype(np.int64)
        allowed[str(src)] = (wins, offs, qi)
        union[str(src)] = wins
    return union, allowed


_COORD_NAME = "hbi_super_coordinator"
# descend shard pool: a 288-query batch descends ~1.5 s on ONE actor
# (measured round 4) — a serial per-batch floor that caps query scaling.
# Sharding the query list across a small actor pool moves that time into
# the parallel fraction; small batches (the common oracle case) keep a
# single actor. Each pool member caches the same read-only store; on a
# multi-node cluster Ray spreads the pool, so the cache cost is per-node.
_COORD_POOL = 4
_QUERIES_PER_SHARD = 64


def _coordinator(shard: int = 0):
    import ray
    name = _COORD_NAME if shard == 0 else f"{_COORD_NAME}_{shard}"
    return _SuperCoordinatorImpl.options(
        name=name, get_if_exists=True, num_cpus=0).remote()


class _SuperCoordinator:
    """Long-lived query-coordinator actor: holds the probe-ready super
    store cache (``_load_super_local``) so repeated query batches pay the
    store open/stack cost once per index, and the DESCEND RUNS OFF THE
    DRIVER — the driver dispatches it and immediately proceeds to
    schedule the probe pipeline, whose tasks resolve the result lazily
    from the object store (reference semantics preserved: this is purely
    an execution change of ``PMIndex/HBI.java:207-266`` across-trees
    pruning). ``num_cpus=0``: the descend is a brief numpy burst; never
    reserve a slot from the worker pool for it."""

    def prune(self, out_dir: str, cfg: HbiConfig, compiled: list[dict],
              sources, window_range):
        return super_prune(out_dir, cfg, compiled, sources=sources,
                           window_range=window_range)

    def warm(self, out_dir: str) -> bool:
        sup = Path(out_dir) / SUPER_DIR
        if sup.exists():
            _load_super_local(str(sup))
            # run one throwaway descend: the FIRST prune in a fresh
            # actor pays ~1-2 s of import/setup (measured) that would
            # otherwise land inside the first query's timed path
            meta = load_super_meta(out_dir)
            if meta is not None and meta["levels"] \
                    and meta.get("format") == STORE_FORMAT:
                from .build_index import load_manifest
                from .query_index import compile_queries
                man = load_manifest(out_dir)
                if man is not None and man.get("config"):
                    cfg = HbiConfig.from_json(man["config"])
                    dummy = compile_queries(
                        [("__warm", [1] * max(1, cfg.ngram))], cfg)
                    super_prune(out_dir, cfg, dummy)
        return True


def _merge_prune_results(offsets: list[int], parts: list
                         ) -> SuperPruneResult | None:
    """Merge per-shard descend results (shard s covers compiled queries
    [offsets[s], offsets[s] + len(shard))) into one batch-wide
    ``SuperPruneResult``: window unions union per source, per-window
    allowed query lists concatenate with the shard's query indices
    remapped to batch positions."""
    import ray
    parts = ray.get(list(parts))
    if any(p is None for p in parts):
        return None
    union: dict = {}
    per_src_w: dict[str, list] = {}
    for p in parts:
        for s, w in p.window_union.items():
            per_src_w.setdefault(s, []).append(w)
    for s, ws in per_src_w.items():
        union[s] = (None if any(w is None for w in ws)
                    else np.unique(np.concatenate(ws))
                    if ws else np.empty(0, np.int64))
    per_src_a: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
    for off, p in zip(offsets, parts):
        for s, (wins, offs, qi) in p.allowed.items():
            seg = np.diff(offs)
            per_src_a.setdefault(s, []).append(
                (np.repeat(wins, seg), qi + off))
    allowed: dict = {}
    for s, chunks in per_src_a.items():
        w = np.concatenate([c[0] for c in chunks])
        q = np.concatenate([c[1] for c in chunks])
        order = np.lexsort((q, w))
        w, q = w[order], q[order]
        uw, starts = np.unique(w, return_index=True)
        offs = np.concatenate([starts, [len(w)]]).astype(np.int64)
        allowed[s] = (uw, offs, q)
    covered = set()
    for p in parts:
        covered |= p.covered_sources
    return SuperPruneResult(union, allowed,
                            sum(p.probes for p in parts), covered)


def _make_remote():
    import ray
    return ray.remote(_SuperCoordinator)


_SuperCoordinatorImpl = None
_MergePruneImpl = None


def super_prune_async(out_dir: str, cfg: HbiConfig, compiled: list[dict],
                      *, sources: list[str] | None = None,
                      window_range: tuple[int, int] | None = None):
    """Dispatch the descend to the coordinator actor; returns an
    ``ObjectRef[SuperPruneResult]`` — or None when the store cannot prune
    (absent / older format / params mismatch), checked driver-side from
    the tiny meta file so the cheap no-op cases stay synchronous."""
    global _SuperCoordinatorImpl
    meta = load_super_meta(out_dir)
    if meta is None or not meta["levels"]:
        return None
    if meta.get("format") != STORE_FORMAT:
        return None
    if meta.get("params_hash") not in (None, cfg.params_hash()):
        return None
    global _MergePruneImpl
    import ray
    if _SuperCoordinatorImpl is None:
        _SuperCoordinatorImpl = _make_remote()
    n_shards = min(_COORD_POOL,
                   max(1, len(compiled) // _QUERIES_PER_SHARD))
    if n_shards <= 1:
        return _coordinator().prune.remote(out_dir, cfg, compiled,
                                           sources, window_range)
    size = (len(compiled) + n_shards - 1) // n_shards
    refs, offs = [], []
    for s in range(n_shards):
        part = compiled[s * size:(s + 1) * size]
        if not part:
            break
        refs.append(_coordinator(s).prune.remote(
            out_dir, cfg, part, sources, window_range))
        offs.append(s * size)
    if _MergePruneImpl is None:
        _MergePruneImpl = ray.remote(num_cpus=0)(_merge_prune_results)
    # refs nested in a list (not expanded): the merge task ray.gets the
    # small per-shard results itself
    return _MergePruneImpl.remote(offs, refs)


def warm_super_coordinator(out_dir: str, shards: int = _COORD_POOL
                           ) -> bool:
    """Open the super store inside the coordinator actor pool (one-time,
    untimed cost per index — the bench/driver analogue of query
    coordinators keeping the upper tree resident)."""
    global _SuperCoordinatorImpl
    import ray
    if _SuperCoordinatorImpl is None:
        _SuperCoordinatorImpl = _make_remote()
    return all(ray.get([_coordinator(s).warm.remote(out_dir)
                        for s in range(max(1, shards))]))
