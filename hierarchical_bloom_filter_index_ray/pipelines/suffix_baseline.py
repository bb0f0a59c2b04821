"""Exact baseline index family (differential oracles): a distributed
suffix-ARRAY index plus an index-free linear scan.

Reference parity: the reference ships exact baseline indexes whose sole
role is differential ground truth for ``HBI.report`` —
``PMIndex/SuffixTreeIndex.java`` (Ukkonen tree per window, 866 LoC),
``PMIndex/OnlineSuffixTree.java`` (865), ``tree/ssws/*`` (suffix
tree/array builders, ~2,300) and ``PMIndex/RegexIndex.java:45-63``
(exact linear scan); ``HBIDatasetBenchmark.compared``
(``HBIDatasetBenchmark.java:106-154``) normalizes (sort+dedup) and diffs
the per-query match lists. This module rebuilds that role
Ray-Data-first rather than porting the pointer-chasing trees:

- :func:`build_suffix_index` — sequences ``Dataset`` →
  ``add_window_columns`` → ``groupby(source, window_id).map_groups``
  (one suffix array per window, rank-doubling wholly in numpy) →
  ``write_parquet(partition_cols=["source"])``. A suffix ARRAY replaces
  the suffix TREE: the ``(flat_tokens, sa)`` pair is Arrow-native,
  zero-copy out of the object store, and binary-searchable without any
  deserialization — an implicit structure, exactly like the bloom
  side's implicit interval hierarchy (``tree/ImplicitTree.java``).
- :func:`suffix_membership` / :func:`suffix_membership_ds` — per-window
  O(m log n) suffix-array range search → ``(query_id, doc_id[,
  n_matches])`` with the SAME schema and overlap-counting semantics as
  ``membership_query`` (every start position counts,
  ``HBI.report``'s per-position semantics), so the two paths are
  directly diffable.
- :func:`linear_scan_membership` — the ``RegexIndex`` analogue: no
  index at all; the adaptive ``_match_pairs`` sweep over every row.

Partitioning assumption (documented per the custom-operator rule): one
output row per ``(source, window_id)`` whose flat token array is
bounded by ``docs_per_window`` × max doc length — the same per-window
locality bound the bloom leaf verify relies on (SURVEY §3.4: raw
tokens never leave the tree that indexed them). Windows stream through
the executor one block at a time; nothing materializes globally. The
binary search per (window, query) is a ~log2(window_tokens)-step loop
— a log-factor driver of numpy slice compares, not a per-row Python
loop.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..config import HbiConfig
from ..stages.window import add_window_columns

SUFFIX_MANIFEST = "suffix_manifest.json"
SUFFIX_PARTITIONS = "sa_partitions"


# ---------------------------------------------------------------------------
# suffix-array construction (vectorized rank doubling, Manber–Myers)
# ---------------------------------------------------------------------------

def suffix_array(tokens: np.ndarray) -> np.ndarray:
    """Suffix array of an integer token array — O(n log² n) rank
    doubling, every pass a ``np.lexsort`` + vectorized re-rank (no
    per-suffix Python work). Shorter-is-prefix sorts first (standard
    lexicographic order on finite suffixes), which the searches below
    rely on."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, np.int64)
    # initial rank = dense rank of single tokens
    _, rank = np.unique(tokens, return_inverse=True)
    rank = rank.astype(np.int64)
    order = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        # rank of the suffix k positions later; -1 = past the end,
        # which sorts before every real rank => proper prefixes first
        rank2 = np.full(n, -1, np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        r_ord, r2_ord = rank[order], rank2[order]
        bump = np.ones(n, dtype=bool)
        bump[1:] = (r_ord[1:] != r_ord[:-1]) | (r2_ord[1:] != r2_ord[:-1])
        new = np.cumsum(bump) - 1
        rank = np.empty(n, np.int64)
        rank[order] = new
        if new[-1] == n - 1:        # all ranks distinct: done
            break
        k *= 2
    return order.astype(np.int64)


def _cmp_suffix(flat: np.ndarray, start: int, pat: np.ndarray) -> int:
    """Compare suffix ``flat[start:]`` truncated to ``len(pat)`` tokens
    against ``pat``: -1 / 0 / +1. A suffix shorter than the pattern that
    matches as far as it goes is LESS (it can never contain the
    pattern)."""
    m = len(pat)
    s = flat[start:start + m]
    ln = len(s)
    neq = np.nonzero(s != pat[:ln])[0]
    if len(neq):
        i = neq[0]
        return -1 if s[i] < pat[i] else 1
    return -1 if ln < m else 0


def sa_range(flat: np.ndarray, sa: np.ndarray, pat: np.ndarray
             ) -> tuple[int, int]:
    """Half-open ``sa`` index range of suffixes whose first ``len(pat)``
    tokens equal ``pat`` (classic double binary search)."""
    lo, hi = 0, len(sa)
    while lo < hi:                       # lower bound: first suffix >= pat
        mid = (lo + hi) // 2
        if _cmp_suffix(flat, sa[mid], pat) < 0:
            lo = mid + 1
        else:
            hi = mid
    first = lo
    hi = len(sa)
    while lo < hi:                       # upper bound: first suffix > pat
        mid = (lo + hi) // 2
        if _cmp_suffix(flat, sa[mid], pat) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return first, lo


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

def _one_row_list(values: np.ndarray, typ: pa.DataType) -> pa.ListArray:
    """One-row list<typ> column wrapping ``values`` zero-copy."""
    flat = pa.array(np.ascontiguousarray(values), typ)
    return pa.ListArray.from_arrays(
        pa.array([0, len(values)], pa.int32()), flat)


def _build_window_group(t: pa.Table) -> pa.Table:
    """One (source, window_id) group → one suffix-array row. Built as
    explicit Arrow (not pandas) so the list columns persist as plain
    ``list<...>`` instead of Ray's variable-shaped tensor extension."""
    import pyarrow.compute as pc

    t = t.take(pc.sort_indices(t.select(["slot"]),
                               sort_keys=[("slot", "ascending")]))
    tok = t["tokens"].combine_chunks()
    if not (pa.types.is_list(tok.type) or pa.types.is_large_list(tok.type)):
        # pandas-originated Datasets carry Ray's variable-shaped tensor
        # extension instead of list<int32>; normalize (cold path)
        tok = pa.array(tok.to_pylist(), pa.list_(pa.int32()))
    flat = np.asarray(tok.flatten()).astype(np.int32, copy=False)
    lens = np.asarray(pc.list_value_length(tok), dtype=np.int64)
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    sa = suffix_array(flat)
    return pa.table({
        "source": pa.array([str(t["source"][0])], pa.string()),
        "window_id": pa.array([t["window_id"][0].as_py()], pa.int64()),
        "n_docs": pa.array([t.num_rows], pa.int32()),
        "n_tokens": pa.array([len(flat)], pa.int64()),
        # keep the source's doc_id dtype (int or string) so results are
        # byte-diffable against membership_query's passthrough column
        "doc_ids": pa.ListArray.from_arrays(
            pa.array([0, t.num_rows], pa.int32()),
            t["doc_id"].combine_chunks()),
        "doc_offsets": _one_row_list(offs, pa.int64()),
        "flat_tokens": _one_row_list(flat, pa.int32()),
        "sa": _one_row_list(sa, pa.int64()),
    })


def build_suffix_index(ds: "rd.Dataset", cfg: HbiConfig, out_dir: str,
                       *, batch_size: int = 1024) -> dict:
    """Build the exact suffix-array baseline index next to (or instead
    of) the bloom index: same windowing (``add_window_columns``), same
    shuffle key, one Arrow-native row per window, partitioned by
    source for pruned scoped reads."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    part_dir = out / SUFFIX_PARTITIONS
    if part_dir.exists():
        import shutil
        shutil.rmtree(part_dir)

    cols = ["doc_id", "tokens", "source"]
    windowed = (ds.select_columns(cols)
                  .map_batches(add_window_columns, batch_format="pyarrow",
                               batch_size=batch_size,
                               fn_kwargs={"cfg": cfg}))
    built = windowed.groupby(["source", "window_id"]).map_groups(
        _build_window_group, batch_format="pyarrow")
    built.write_parquet(str(part_dir), partition_cols=["source"])

    # manifest: lineage + per-source metrics, suffix-side format guard
    stats = rd.read_parquet(
        str(part_dir), columns=["source", "window_id", "n_docs",
                                "n_tokens"]).to_pandas()
    stats["source"] = stats["source"].astype(str)
    per_source = {
        s: {"n_windows": int(len(g)), "n_docs": int(g["n_docs"].sum()),
            "n_tokens": int(g["n_tokens"].sum())}
        for s, g in stats.groupby("source")}
    man = {"format_version": 1, "kind": "suffix_array",
           "params_hash": cfg.params_hash(),
           "docs_per_window": cfg.docs_per_window,
           "sources": per_source,
           "total_windows": int(len(stats)),
           "total_docs": int(stats["n_docs"].sum()),
           "total_tokens": int(stats["n_tokens"].sum())}
    (out / SUFFIX_MANIFEST).write_text(json.dumps(man, indent=1))
    return man


def load_suffix_index(out_dir: str, *, sources: list[str] | None = None
                      ) -> "rd.Dataset":
    """Dataset over the persisted per-window suffix arrays; ``sources``
    prunes partition directories at the read."""
    root = Path(out_dir) / SUFFIX_PARTITIONS
    if sources is None:
        return rd.read_parquet(str(root))
    paths = [str(root / f"source={s}") for s in sources
             if (root / f"source={s}").exists()]
    if not paths:
        raise ValueError(f"no suffix partitions for sources={sources} "
                         f"under {root}")
    return rd.read_parquet(paths)


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

def _list_rows(col: pa.ChunkedArray):
    """Zero-copy (values, offsets) view of a list column."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):        # zero chunks edge
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else \
            pa.array([], arr.type)
    offs = np.asarray(arr.offsets)
    vals = np.asarray(arr.values)
    return vals, offs


def _probe_windows_fn(queries: list[tuple[str, list[int]]],
                      with_counts: bool):
    """Per-block window probe: for each (window row, query), binary
    search the suffix array, map hit positions to docs, drop positions
    whose match would cross a doc boundary, count per doc."""
    qids = [q for q, _ in queries]
    pats = [np.asarray(p, dtype=np.int32) for _, p in queries]

    def f(t: pa.Table) -> pa.Table:
        doc_type = t.schema.field("doc_ids").type.value_type
        out_qid: list[np.ndarray] = []
        out_idx: list[np.ndarray] = []
        out_cnt: list[np.ndarray] = []
        id_arr = None
        if t.num_rows:
            fvals, foffs = _list_rows(t["flat_tokens"])
            svals, soffs = _list_rows(t["sa"])
            ovals, ooffs = _list_rows(t["doc_offsets"])
            ids_list = t["doc_ids"].combine_chunks()
            id_arr = ids_list.values          # dtype-preserving flat ids
            id_offs = np.asarray(ids_list.offsets)
            for r in range(t.num_rows):
                flat = fvals[foffs[r]:foffs[r + 1]]
                sa = svals[soffs[r]:soffs[r + 1]]
                offs = ovals[ooffs[r]:ooffs[r + 1]]
                for qi, pat in enumerate(pats):
                    if not len(pat) or len(pat) > len(flat):
                        continue
                    lo, hi = sa_range(flat, sa, pat)
                    if hi <= lo:
                        continue
                    pos = sa[lo:hi]
                    d = np.searchsorted(offs, pos, side="right") - 1
                    ok = pos + len(pat) <= offs[d + 1]
                    if not ok.any():
                        continue
                    dd, cnt = np.unique(d[ok], return_counts=True)
                    out_qid.append(np.full(len(dd), qi, np.int32))
                    out_idx.append(id_offs[r] + dd)
                    out_cnt.append(cnt.astype(np.int64))
        if not out_qid:
            cols = {"query_id": pa.array([], pa.string()),
                    "doc_id": pa.array([], doc_type)}
            if with_counts:
                cols["n_matches"] = pa.array([], pa.int64())
            return pa.table(cols)
        qi_all = np.concatenate(out_qid)
        cols = {
            "query_id": pa.DictionaryArray.from_arrays(
                pa.array(qi_all), pa.array(qids, pa.string())
            ).cast(pa.string()),
            "doc_id": id_arr.take(pa.array(np.concatenate(out_idx))),
        }
        if with_counts:
            cols["n_matches"] = pa.array(np.concatenate(out_cnt))
        return pa.table(cols)

    return f


def suffix_membership_ds(index_ds: "rd.Dataset",
                         queries: list[tuple[str, list[int]]],
                         *, with_counts: bool = False) -> "rd.Dataset":
    """Dataset-returning exact membership over the suffix-array index —
    hits stay distributed (same contract as ``membership_query_ds``)."""
    cols = ["flat_tokens", "sa", "doc_offsets", "doc_ids"]
    return index_ds.select_columns(cols).map_batches(
        _probe_windows_fn(queries, with_counts), batch_format="pyarrow")


def suffix_membership(index_ds: "rd.Dataset",
                      queries: list[tuple[str, list[int]]],
                      *, with_counts: bool = False) -> pa.Table:
    """Collected + deterministically sorted convenience path (same
    contract as ``membership_query``)."""
    import ray

    ds = suffix_membership_ds(index_ds, queries, with_counts=with_counts)
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    if not blocks:
        cols = {"query_id": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.string())}
        if with_counts:
            cols["n_matches"] = pa.array([], pa.int64())
        return pa.table(cols)
    tbl = pa.concat_tables(blocks)
    return tbl.sort_by([("query_id", "ascending"),
                        ("doc_id", "ascending")])


def linear_scan_membership(sequences_ds: "rd.Dataset",
                           queries: list[tuple[str, list[int]]],
                           *, with_counts: bool = False) -> pa.Table:
    """The ``RegexIndex`` analogue (``PMIndex/RegexIndex.java:45-63``):
    exact full scan with NO index — every (row, query) pair goes through
    the same adaptive ``_match_pairs`` sweep the bloom path's verifier
    uses. The slow-but-trivially-correct corner of the differential
    triangle: bloom+verify == suffix array == linear scan."""
    import ray

    from ..functions import flat_tokens_and_offsets
    from .query_index import _match_pairs

    qids = [q for q, _ in queries]
    pats = [np.asarray(p, dtype=np.int32) for _, p in queries]

    def scan(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = {"query_id": pa.array([], pa.string()),
                 "doc_id": pa.array([], t.schema.field("doc_id").type)}
        if with_counts:
            empty["n_matches"] = pa.array([], pa.int64())
        if not n:
            return pa.table(empty)
        flat, offsets = flat_tokens_and_offsets(t["tokens"])
        pair_rows = np.tile(np.arange(n, dtype=np.int64), len(pats))
        pair_qis = np.repeat(np.arange(len(pats), dtype=np.int32), n)
        rows, qis, cnts = _match_pairs(flat, offsets, pair_rows,
                                       pair_qis, pats)
        if not len(rows):
            return pa.table(empty)
        doc = t["doc_id"].combine_chunks().take(pa.array(rows))
        cols = {
            "query_id": pa.DictionaryArray.from_arrays(
                pa.array(qis), pa.array(qids, pa.string())
            ).cast(pa.string()),
            "doc_id": doc,
        }
        if with_counts:
            cols["n_matches"] = pa.array(cnts, pa.int64())
        return pa.table(cols)

    ds = sequences_ds.select_columns(["doc_id", "tokens"]).map_batches(
        scan, batch_format="pyarrow")
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return pa.table({"query_id": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.string()),
                         **({"n_matches": pa.array([], pa.int64())}
                            if with_counts else {})})
    return pa.concat_tables(blocks).sort_by(
        [("query_id", "ascending"), ("doc_id", "ascending")])
