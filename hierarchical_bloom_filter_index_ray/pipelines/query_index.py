"""Membership / pattern query engine over the persisted index.

Mirrors the reference's query path (``PMIndex/HBI.report``
``PMIndex/HBI.java:415-605``) in two Ray stages:

1. **Probe** (``map_batches`` over the *index* Dataset, queries broadcast
   via ``ray.put`` -> ``fn_constructor_kwargs``): per (source, window)
   partition, descend the bloom tree from the root — probe every query
   n-gram at the current interval, all-present -> push children, first-miss
   -> prune (exactly ``search/BlockSearch.java:15-128`` + the DFS of
   ``search/IntervalScanner.java:7-89``); leaf hits emit candidate doc
   slots. No false negatives by Bloom construction.
2. **Verify** (``map_batches`` over the *sequences* Dataset, candidate doc
   set broadcast — a semi-join): exact sliding-window token-sequence match
   against the raw rows, the analogue of
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


def compile_queries(queries: list[tuple[str, list[int]]], cfg: HbiConfig
                    ) -> list[dict]:
    """Pattern compiler (``search/Pattern.java:22-97``): token sequence ->
    sliding n-gram keys in the same key space as the index build."""
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
        out.append({"query_id": qid, "tokens": toks, "ngram_keys": keys})
    return out


class BloomProbe:
    """Index-partition probe. One deserialization of each window's bloom
    tree per batch row; all queries probed vectorized per node.

    With ``conf`` set, a ``MostFreqPlanner`` chooses a per-query seed
    level from the window's CMS (``search/MostFreqPruning.java:31-52``);
    the DFS then starts at all intervals of that level. Seed choice only
    affects probe cost, never results.
    """

    def __init__(self, cfg: HbiConfig, queries_ref, conf: float | None = None):
        self.cfg = cfg
        self.conf = conf
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.queries = qs
        # concatenated key array + per-query segment bounds for bulk probes
        self.q_keys = (np.concatenate([q["ngram_keys"] for q in qs])
                       if qs else np.empty(0, dtype=np.uint64))
        counts = np.array([len(q["ngram_keys"]) for q in qs], dtype=np.int64)
        self.q_bounds = np.zeros(len(qs) + 1, dtype=np.int64)
        np.cumsum(counts, out=self.q_bounds[1:])
        self.level_salts = np.array(
            [derive_seed(cfg.seed, "interval_salt", lv) & 0xFFFFFFFFFFFFFFFF
             for lv in range(cfg.num_levels)], dtype=np.uint64)

    def _probe_window(self, blooms, active: np.ndarray, level: int,
                      interval: int, out_rows: list) -> None:
        """DFS node visit: probe all active queries' keys at (level,
        interval); survivors descend / emit at leaf."""
        cfg = self.cfg
        salt = splitmix64(U64(interval) ^ self.level_salts[level])
        # bulk-probe concatenated keys of active queries
        seg_lens = self.q_bounds[active + 1] - self.q_bounds[active]
        keys = np.concatenate(
            [self.q_keys[self.q_bounds[a]:self.q_bounds[a + 1]]
             for a in active]) ^ salt
        hits = blooms[level].contains(keys)
        seg_starts = np.zeros(len(active), dtype=np.int64)
        np.cumsum(seg_lens[:-1], out=seg_starts[1:])
        all_hit = np.logical_and.reduceat(hits, seg_starts) \
            if len(hits) else np.empty(0, dtype=bool)
        # reduceat quirk: empty segments — impossible here (>=1 key/query)
        survivors = active[all_hit]
        if len(survivors) == 0:
            return
        if level == cfg.window_bits:  # leaf: interval == doc slot
            out_rows.append((interval, survivors))
            return
        self._probe_window(blooms, survivors, level + 1, interval * 2,
                           out_rows)
        self._probe_window(blooms, survivors, level + 1, interval * 2 + 1,
                           out_rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out_qid, out_src, out_win, out_slot = [], [], [], []
        if len(self.queries):
            sources = batch["source"].to_pylist()
            windows = batch["window_id"].to_pylist()
            blobs = batch["bloom_tree"].to_pylist()
            has_planner = (self.conf is not None
                           and "cms" in batch.column_names)
            cms_blobs = batch["cms"].to_pylist() if has_planner else None
            n_tokens = (batch["n_tokens"].to_pylist()
                        if "n_tokens" in batch.column_names else None)
            all_q = np.arange(len(self.queries), dtype=np.int64)
            for r, (src, win, blob) in enumerate(zip(sources, windows,
                                                     blobs)):
                if blob is None:
                    continue
                tree = pickle.loads(blob)
                blooms = {int(lv): sketch_from_bytes(b)
                          for lv, b in tree.items()}
                min_lvl = min(blooms)
                rows: list = []
                if has_planner and cms_blobs[r] is not None:
                    from .planner import MostFreqPlanner
                    planner = MostFreqPlanner(self.conf, cfg.fp,
                                              cfg.window_bits)
                    cms = sketch_from_bytes(cms_blobs[r])
                    wtok = int(n_tokens[r]) if n_tokens else 0
                    by_lp: dict[int, list[int]] = {}
                    for qi in all_q:
                        keys = self.q_keys[self.q_bounds[qi]:
                                           self.q_bounds[qi + 1]]
                        lp = planner.plan(cms, wtok, keys)
                        lp = min(max(lp, min_lvl), cfg.window_bits)
                        by_lp.setdefault(lp, []).append(int(qi))
                    for lp, qidx in by_lp.items():
                        qarr = np.array(qidx, dtype=np.int64)
                        for interval in range(1 << lp):
                            self._probe_window(blooms, qarr, lp, interval,
                                               rows)
                else:
                    for interval in range(1 << min_lvl):
                        self._probe_window(blooms, all_q, min_lvl, interval,
                                           rows)
                for slot, survivors in rows:
                    for qi in survivors.tolist():
                        out_qid.append(self.queries[qi]["query_id"])
                        out_src.append(src)
                        out_win.append(win)
                        out_slot.append(slot)
        return pa.table({
            "query_id": pa.array(out_qid, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "window_id": pa.array(out_win, pa.int64()),
            "slot": pa.array(out_slot, pa.int32()),
        })


class ExactVerifier:
    """Sequences-side exact verification (semi-join on broadcast candidates).

    ``cand_ref`` holds {doc_index: [query_idx, ...]} plus the query token
    arrays; rows whose doc_index has no candidates are dropped before any
    token work.
    """

    def __init__(self, cfg: HbiConfig, cand_ref, queries_ref):
        self.cfg = cfg
        # keyed by (source, doc_index): doc indices are per-source
        self.cands: dict[tuple[str, int], list[int]] = ray.get(cand_ref) \
            if not isinstance(cand_ref, dict) else cand_ref
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.q_tokens = [np.asarray(q["tokens"], dtype=np.int32) for q in qs]
        self.q_ids = [q["query_id"] for q in qs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.window import doc_index
        di = doc_index(batch)
        srcs = batch["source"].to_pylist()
        # vectorized candidate mask: np.isin per source present in the batch
        by_src: dict[str, np.ndarray] = {}
        mask = np.zeros(len(di), dtype=bool)
        for s in set(srcs):
            if s not in by_src:
                by_src[s] = np.array(
                    [d for (cs, d) in self.cands if cs == s], dtype=np.int64)
            rows = np.fromiter((x == s for x in srcs), dtype=bool,
                               count=len(srcs))
            if len(by_src[s]):
                mask |= rows & np.isin(di, by_src[s])
        out_qid, out_doc = [], []
        if mask.any():
            sub = batch.filter(pa.array(mask))
            sub_di = di[mask]
            sub_src = [s for s, m in zip(srcs, mask) if m]
            flat, offsets = flat_tokens_and_offsets(sub["tokens"])
            doc_ids = sub["doc_id"].to_pylist()
            for r in range(sub.num_rows):
                doc_toks = flat[offsets[r]:offsets[r + 1]]
                for qi in self.cands[(sub_src[r], int(sub_di[r]))]:
                    q = self.q_tokens[qi]
                    if len(doc_toks) >= len(q):
                        sw = np.lib.stride_tricks.sliding_window_view(
                            doc_toks, len(q))
                        if (sw == q).all(axis=1).any():
                            out_qid.append(self.q_ids[qi])
                            out_doc.append(doc_ids[r])
        return pa.table({
            "query_id": pa.array(out_qid, pa.string()),
            "doc_id": pa.array(out_doc,
                               batch["doc_id"].type if batch.num_rows
                               else pa.string()),
        })


def membership_query(index_ds: "rd.Dataset", sequences_ds: "rd.Dataset",
                     queries: list[tuple[str, list[int]]], cfg: HbiConfig,
                     *, probe_concurrency=None,
                     conf: float | None = None) -> pa.Table:
    """Exact pattern-membership results for a batch of queries.

    Returns a pyarrow Table (query_id, doc_id) — sorted for determinism.
    The candidate set is collected on the driver between the two stages; it
    is bounded by true_hits + FPR * windows * docs_per_window, kilobytes at
    any realistic FPR (the same asymmetry the reference exploits).
    """
    compiled = compile_queries(queries, cfg)
    cols = ["source", "window_id", "bloom_tree"]
    if conf is not None:
        cols += ["cms", "n_tokens"]
    # plain callable INSTANCES -> elastic task pool (no actor-pool startup
    # cost; the compiled queries ride along in the serialized closure —
    # they are small by construction)
    cand = index_ds.select_columns(cols).map_batches(
        BloomProbe(cfg, compiled, conf=conf), batch_format="pyarrow",
        batch_size=64).take_all()

    qid_to_idx = {q["query_id"]: i for i, q in enumerate(compiled)}
    cand_map: dict[tuple[str, int], list[int]] = {}
    for row in cand:
        di = (int(row["window_id"]) << cfg.window_bits) | int(row["slot"])
        cand_map.setdefault((row["source"], di), []).append(
            qid_to_idx[row["query_id"]])
    hits = sequences_ds.map_batches(
        ExactVerifier(cfg, cand_map, compiled), batch_format="pyarrow",
        zero_copy_batch=True).take_all()
    tbl = pa.table({
        "query_id": pa.array([h["query_id"] for h in hits], pa.string()),
        "doc_id": pa.array([h["doc_id"] for h in hits]),
    })
    return tbl.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])
