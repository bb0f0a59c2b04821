"""Membership / pattern query engine over the persisted index.

Mirrors the reference's query path (``PMIndex/HBI.report``
``PMIndex/HBI.java:415-605``) in two Ray stages:

1. **Probe** (``map_batches`` over the *index* Dataset): per (source,
   window) partition, sweep the bloom tree level by level — a vectorized
   BFS over (interval, query) pairs: one bulk ``contains`` per level
   instead of one per tree node. All-n-grams-present -> descend, first
   miss -> prune (the semantics of ``search/BlockSearch.java:15-128`` +
   ``search/IntervalScanner.java:7-89``); leaf survivors emit candidate
   doc slots. No false negatives by Bloom construction. With ``conf``
   set, a ``MostFreqPlanner`` injects each query at its seed level
   (``search/MostFreqPruning.java:31-52``) — cost only, results unchanged.
2. **Verify** (``map_batches`` over the *sequences* Dataset, compact
   numpy candidate structs broadcast — a semi-join): exact sliding-window
   token-sequence match against the raw rows, the analogue of
   ``search/VerifierLinearLeafProbe.java:16-150`` with the Parquet data as
   the reference's ``StreamBuffer`` ground truth.

Result: exact (query_id, doc_id) matches — false positives are pruned by
verification; the bloom tree only bounds the verify workload (that is the
reference's design too).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import HbiConfig
from ..functions.tokenize import flat_tokens_and_offsets
from ..state import sketch_from_bytes
from ..state.splitmix import U64, derive_seed, hash_u64, splitmix64


def compile_queries(queries: list[tuple[str, list[int]]], cfg: HbiConfig,
                    *, strides: bool = False) -> list[dict]:
    """Pattern compiler (``search/Pattern.java:22-97``): token sequence ->
    sliding n-gram keys in the same key space as the index build.

    ``strides=True`` probes only every ngram-th key (the reference's
    strided effective-ngram mode, ``search/Pattern.java:37-44`` /
    ``search/BlockSearch.java:142-155``): fewer probe keys per node, same
    exact results (verification is exact either way) — a probe-cost knob.
    """
    ngram_seed = derive_seed(cfg.seed, "ngram")
    out = []
    for qid, tokens in queries:
        toks = np.asarray(tokens, dtype=np.int32)
        if len(toks) < cfg.ngram:
            raise ValueError(
                f"query {qid!r} shorter than ngram={cfg.ngram}")
        h = hash_u64(toks.astype(np.uint64), ngram_seed)
        acc = h.copy()
        for j in range(1, cfg.ngram):
            shifted = np.empty_like(h)
            shifted[:-j] = h[j:]
            shifted[-j:] = 0
            acc = splitmix64(acc ^ shifted)
        keys = acc[: len(toks) - cfg.ngram + 1]
        if strides and cfg.ngram > 1:
            keys = keys[:: cfg.ngram]
        out.append({"query_id": qid, "tokens": toks, "ngram_keys": keys})
    return out


def _grouped_arange(starts: np.ndarray, lens: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Flat gather indices for per-pair key segments + segment offsets."""
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(offs[:-1], lens) + np.repeat(starts, lens))
    return idx, offs


class BloomProbe:
    """Index-partition probe (vectorized level-sweep BFS)."""

    def __init__(self, cfg: HbiConfig, queries_ref, conf: float | None = None,
                 planner: str | None = None):
        self.cfg = cfg
        self.conf = conf
        # planner seam: None | "mostfreq" (MostFreqPruning) | "cost"
        # (LevelCostMinimizer / CostFunctionIE independence model)
        self.planner_kind = planner or ("mostfreq" if conf is not None
                                        else None)
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.queries = qs
        self.q_keys = (np.concatenate([q["ngram_keys"] for q in qs])
                       if qs else np.empty(0, dtype=np.uint64))
        self.q_lens = np.array([len(q["ngram_keys"]) for q in qs],
                               dtype=np.int64)
        self.q_bounds = np.zeros(len(qs) + 1, dtype=np.int64)
        np.cumsum(self.q_lens, out=self.q_bounds[1:])
        self.level_salts = np.array(
            [derive_seed(cfg.seed, "interval_salt", lv) & 0xFFFFFFFFFFFFFFFF
             for lv in range(cfg.num_levels)], dtype=np.uint64)

    def _sweep(self, blooms: dict, seed_levels: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
        """BFS over (interval, query) pairs; returns surviving leaf pairs
        (slots, query_idx). ``seed_levels[q]`` = level at which query q
        enters the frontier (clamped to available levels)."""
        wb = self.cfg.window_bits
        cur_iv = np.empty(0, dtype=np.int64)
        cur_qi = np.empty(0, dtype=np.int64)
        for lv in range(wb + 1):
            entering = np.nonzero(seed_levels == lv)[0]
            if len(entering):
                n_iv = 1 << lv
                cur_iv = np.concatenate(
                    [cur_iv, np.repeat(np.arange(n_iv, dtype=np.int64),
                                       len(entering))])
                cur_qi = np.concatenate(
                    [cur_qi, np.tile(entering, n_iv)])
            if len(cur_iv) == 0:
                continue
            bloom = blooms.get(lv)
            if bloom is not None:  # level may be dropped by memory policy
                lens = self.q_lens[cur_qi]
                key_idx, offs = _grouped_arange(self.q_bounds[cur_qi], lens)
                salts = splitmix64(cur_iv.astype(np.uint64)
                                   ^ self.level_salts[lv])
                keys = self.q_keys[key_idx] ^ np.repeat(salts, lens)
                hits = bloom.contains(keys)
                ok = np.logical_and.reduceat(hits, offs[:-1]) \
                    if len(hits) else np.empty(0, dtype=bool)
                cur_iv, cur_qi = cur_iv[ok], cur_qi[ok]
            if lv == wb or len(cur_iv) == 0:
                break
            cur_iv = np.concatenate([cur_iv * 2, cur_iv * 2 + 1])
            cur_qi = np.tile(cur_qi, 2)
        return cur_iv, cur_qi

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out: list[tuple[str, int, np.ndarray, np.ndarray]] = []
        n_q = len(self.queries)
        if n_q:
            sources = batch["source"].to_pylist()
            windows = batch["window_id"].to_pylist()
            blobs = batch["bloom_tree"].to_pylist()
            has_planner = (self.planner_kind is not None
                           and "cms" in batch.column_names)
            cms_blobs = batch["cms"].to_pylist() if has_planner else None
            n_tokens = (batch["n_tokens"].to_pylist()
                        if "n_tokens" in batch.column_names else None)
            for r, (src, win, blob) in enumerate(zip(sources, windows,
                                                     blobs)):
                if blob is None:
                    continue
                blooms = {int(lv): sketch_from_bytes(b)
                          for lv, b in pickle.loads(blob).items()}
                min_lvl = min(blooms)
                if has_planner and cms_blobs[r] is not None:
                    from .planner import CostPlanner, MostFreqPlanner
                    if self.planner_kind == "cost":
                        planner = CostPlanner(cfg.fp, cfg.window_bits)
                    else:
                        planner = MostFreqPlanner(self.conf or 0.95, cfg.fp,
                                                  cfg.window_bits)
                    cms = sketch_from_bytes(cms_blobs[r])
                    wtok = int(n_tokens[r]) if n_tokens else 0
                    seed_levels = np.array(
                        [min(max(planner.plan(
                            cms, wtok,
                            self.q_keys[self.q_bounds[q]:self.q_bounds[q + 1]]
                        ), min_lvl), cfg.window_bits) for q in range(n_q)],
                        dtype=np.int64)
                else:
                    seed_levels = np.full(n_q, min_lvl, dtype=np.int64)
                slots, qi = self._sweep(blooms, seed_levels)
                if len(slots):
                    out.append((src, win, slots, qi))
        if not out:
            return pa.table({
                "query_idx": pa.array([], pa.int32()),
                "source": pa.array([], pa.string()),
                "window_id": pa.array([], pa.int64()),
                "slot": pa.array([], pa.int32()),
            })
        srcs = np.concatenate([[s] * len(sl) for s, _, sl, _ in out])
        wins = np.concatenate([np.full(len(sl), w, dtype=np.int64)
                               for _, w, sl, _ in out])
        slots = np.concatenate([sl for _, _, sl, _ in out])
        qis = np.concatenate([qi for _, _, _, qi in out])
        return pa.table({
            "query_idx": pa.array(qis.astype(np.int32), pa.int32()),
            "source": pa.array(srcs.tolist(), pa.string()),
            "window_id": pa.array(wins, pa.int64()),
            "slot": pa.array(slots.astype(np.int32), pa.int32()),
        })


class ExactVerifier:
    """Sequences-side exact verification (semi-join on broadcast compact
    candidate structs ``{source: (sorted_doc_idx, offsets, query_idx)}``)."""

    def __init__(self, cfg: HbiConfig, cand_ref, queries_ref):
        self.cfg = cfg
        self.cands = ray.get(cand_ref) if not isinstance(cand_ref, dict) \
            else cand_ref
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.q_tokens = [np.asarray(q["tokens"], dtype=np.int32) for q in qs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.window import doc_index
        di = doc_index(batch)
        srcs = np.asarray(batch["source"].to_pylist(), dtype=object)
        # 1) collect all candidate (row, query) pairs of this batch
        pr_parts: list[np.ndarray] = []
        pq_parts: list[np.ndarray] = []
        for src in set(srcs.tolist()):
            if src not in self.cands:
                continue
            uniq_di, offs, qi_flat = self.cands[src]
            rows = np.nonzero(srcs == src)[0]
            pos = np.searchsorted(uniq_di, di[rows])
            pos_ok = pos < len(uniq_di)
            match = np.zeros(len(rows), dtype=bool)
            match[pos_ok] = uniq_di[pos[pos_ok]] == di[rows[pos_ok]]
            m_rows = rows[match]
            m_pos = pos[match]
            if not len(m_rows):
                continue
            lens = offs[m_pos + 1] - offs[m_pos]
            take, _ = _grouped_arange(offs[m_pos], lens)
            pr_parts.append(np.repeat(m_rows, lens))
            pq_parts.append(qi_flat[take])
        if not pr_parts:
            return pa.table({
                "query_idx": pa.array([], pa.int32()),
                "doc_id": pa.array([], batch["doc_id"].type
                                   if batch.num_rows else pa.string()),
            })
        pair_rows = np.concatenate(pr_parts)
        pair_qis = np.concatenate(pq_parts)
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        # 2) per query: one vectorized shifted-compare sweep over the
        #    gathered candidate-doc token stream (no per-candidate Python)
        out_row_parts: list[np.ndarray] = []
        out_qi_parts: list[np.ndarray] = []
        for qi in np.unique(pair_qis):
            q = self.q_tokens[qi]
            L = len(q)
            rows_q = pair_rows[pair_qis == qi]
            seg_lens = offsets[rows_q + 1] - offsets[rows_q]
            fits = seg_lens >= L
            rows_q, seg_lens = rows_q[fits], seg_lens[fits]
            if not len(rows_q):
                continue
            take, sub_offs = _grouped_arange(offsets[rows_q], seg_lens)
            sub = flat[take]
            m = sub == q[0]
            for j in range(1, L):
                m[len(sub) - j:] = False
                m[:len(sub) - j] &= sub[j:] == q[j]
            # a match starting at local position t needs t + L <= row_len
            row_of = np.repeat(np.arange(len(rows_q)), seg_lens)
            local = (np.arange(len(sub), dtype=np.int64)
                     - np.repeat(sub_offs[:-1], seg_lens))
            m &= local <= np.repeat(seg_lens - L, seg_lens)
            hit = np.unique(row_of[m])
            if len(hit):
                out_row_parts.append(rows_q[hit])
                out_qi_parts.append(np.full(len(hit), qi, dtype=np.int32))
        if not out_row_parts:
            return pa.table({
                "query_idx": pa.array([], pa.int32()),
                "doc_id": pa.array([], batch["doc_id"].type
                                   if batch.num_rows else pa.string()),
            })
        out_rows = np.concatenate(out_row_parts)
        out_qis = np.concatenate(out_qi_parts)
        return pa.table({
            "query_idx": pa.array(out_qis, pa.int32()),
            "doc_id": batch["doc_id"].take(
                pa.array(out_rows, pa.int64())),
        })


def membership_query(index_ds: "rd.Dataset", sequences_ds: "rd.Dataset",
                     queries: list[tuple[str, list[int]]], cfg: HbiConfig,
                     *, probe_concurrency=None, conf: float | None = None,
                     planner: str | None = None, strides: bool = False,
                     sources: list[str] | None = None,
                     window_range: tuple[int, int] | None = None,
                     per_query_scope: list[tuple] | None = None) -> pa.Table:
    """Exact pattern-membership results for a batch of queries.

    Returns a pyarrow Table (query_id, doc_id) — sorted for determinism.
    The candidate set travels driver-side between the two stages as
    compact numpy arrays; it is bounded by true_hits + FPR * windows *
    docs_per_window (the same asymmetry the reference exploits).

    ``sources`` / ``window_range`` scope the query (FIXTURES.md F3): index
    partitions outside the scope are pruned before any probe — the Ray
    analogue of the reference's window-horizon partition pruning
    (``PMIndex/HBI.java:263-266``).
    """
    import pyarrow.compute as pc

    compiled = compile_queries(queries, cfg, strides=strides)
    if sources is not None:
        keep = pa.array(sorted(sources))
        index_ds = index_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["source"], value_set=keep)),
            batch_format="pyarrow")
    if window_range is not None:
        lo, hi = window_range
        index_ds = index_ds.map_batches(
            lambda t: t.filter(pc.and_(
                pc.greater_equal(t["window_id"], lo),
                pc.less(t["window_id"], hi))),
            batch_format="pyarrow")
    cols = ["source", "window_id", "bloom_tree"]
    if conf is not None or planner is not None:
        cols += ["cms", "n_tokens"]
    # plain callable INSTANCES -> elastic task pool (no actor-pool startup
    # cost; compiled queries ride along in the serialized closure)
    cand = index_ds.select_columns(cols).map_batches(
        BloomProbe(cfg, compiled, conf=conf, planner=planner),
        batch_format="pyarrow", batch_size=64).to_pandas()

    if per_query_scope is not None and len(cand):
        # (source|None, window_id|None) per query: filter candidates the
        # scoped query may not see (FIXTURES.md F3 per-query scoping)
        q_src = np.array([s if s is not None else "" for s, _ in
                          per_query_scope], dtype=object)
        q_win = np.array([w if w is not None else -1 for _, w in
                          per_query_scope], dtype=np.int64)
        qi = cand["query_idx"].to_numpy()
        src_ok = (q_src[qi] == "") | (q_src[qi] == cand["source"].to_numpy())
        win_ok = (q_win[qi] == -1) | (q_win[qi]
                                      == cand["window_id"].to_numpy())
        cand = cand[src_ok & win_ok]

    cand_structs: dict[str, tuple] = {}
    if len(cand):
        di_all = ((cand["window_id"].to_numpy() << cfg.window_bits)
                  | cand["slot"].to_numpy())
        qi_all = cand["query_idx"].to_numpy().astype(np.int64)
        src_all = cand["source"].to_numpy()
        for src in np.unique(src_all):
            m = src_all == src
            di, qi = di_all[m], qi_all[m]
            order = np.lexsort((qi, di))
            di, qi = di[order], qi[order]
            uniq, starts = np.unique(di, return_index=True)
            offs = np.concatenate([starts, [len(di)]]).astype(np.int64)
            cand_structs[str(src)] = (uniq, offs, qi)
    c_ref = ray.put(cand_structs)
    q_ref = ray.put(compiled)
    hits = sequences_ds.map_batches(
        ExactVerifier(cfg, c_ref, q_ref), batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    qid_arr = np.array([q["query_id"] for q in compiled], dtype=object)
    tbl = pa.table({
        "query_id": pa.array(
            qid_arr[hits["query_idx"].to_numpy()].tolist() if len(hits)
            else [], pa.string()),
        "doc_id": pa.Array.from_pandas(hits["doc_id"]) if len(hits)
        else pa.array([], pa.string()),
    })
    return tbl.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def membership_query_table(index_ds: "rd.Dataset",
                           sequences_ds: "rd.Dataset",
                           queries_table: pa.Table, cfg: HbiConfig,
                           **kwargs) -> pa.Table:
    """Batch query surface over a queries table (FIXTURES.md F3 schema):
    ``query_id: string, qtokens: list<int32>`` with optional per-query
    ``source: string|null`` and ``window_id: int64|null`` scope columns."""
    qids = queries_table["query_id"].to_pylist()
    qtoks = queries_table["qtokens"].to_pylist()
    queries = list(zip(qids, qtoks))
    scope = None
    names = queries_table.column_names
    if "source" in names or "window_id" in names:
        srcs = (queries_table["source"].to_pylist() if "source" in names
                else [None] * len(qids))
        wins = (queries_table["window_id"].to_pylist()
                if "window_id" in names else [None] * len(qids))
        scope = list(zip(srcs, wins))
    return membership_query(index_ds, sequences_ds, queries, cfg,
                            per_query_scope=scope, **kwargs)
