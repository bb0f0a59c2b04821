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
from ..state.splitmix import derive_seed, hash_u64, splitmix64


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
    """Flat gather indices for per-pair key segments + segment offsets.

    Built as a strided cumsum (ones + boundary scatter + one cumsum pass)
    rather than arange minus two ``np.repeat``s — three memory passes
    instead of five over what is the hot path's largest temporary."""
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    if not total:
        return np.empty(0, np.int64), offs
    nz = lens > 0
    starts_nz = starts[nz]
    offs_nz = offs[:-1][nz]
    # int32 gather indices when they fit: this array is the verify hot
    # path's largest temporary, and the fancy-index reads it end to end —
    # halving its width measurably cuts DRAM pressure at high worker
    # counts (the single-box scaling ceiling)
    hi = int(starts_nz.max()) + int(lens.max())
    dt = np.int32 if hi < 2**31 - 1 and total < 2**31 - 1 else np.int64
    idx = np.ones(total, dtype=dt)
    # at each segment boundary, jump from the previous segment's last
    # index (+1 already applied by the ones) to the next segment's start
    idx[offs_nz[0]] = starts_nz[0]
    if len(starts_nz) > 1:
        prev_last = starts_nz[:-1] + np.diff(offs_nz) - 1
        idx[offs_nz[1:]] = starts_nz[1:] - prev_last
    np.cumsum(idx, out=idx)
    return idx, offs


class BloomProbe:
    """Index-partition probe (vectorized level-sweep BFS)."""

    def __init__(self, cfg: HbiConfig, queries_ref, conf: float | None = None,
                 planner: str | None = None, allowed_ref=None,
                 markov_model=None, probe_distinct: bool = False):
        self.cfg = cfg
        self.conf = conf
        # NgramModel for planner="markov" (bytes or live instance)
        self.markov_model = (sketch_from_bytes(markov_model)
                             if isinstance(markov_model, bytes)
                             else markov_model)
        # planner seam: None | "mostfreq" (MostFreqPruning) | "cost"
        # (LevelCostMinimizer / CostFunctionIE independence model) |
        # "ie" / "ie_selective" (full IE; SelectiveFanout regime) |
        # "multilevel" | "setconf" | "markov"
        self.planner_kind = planner or ("mostfreq" if conf is not None
                                        else None)
        # super-level gate: {source: (win_sorted, offsets, qi_flat)} — a
        # window only probes the queries that survived the cross-window
        # descend down to it (pipelines/super_index.py). An ObjectRef here
        # (the ASYNC descend running on the coordinator actor) is resolved
        # lazily on the worker at first batch, so constructing this probe
        # on the driver never blocks on the descend.
        self._allowed_src = allowed_ref
        self._allowed_ready = (allowed_ref is None
                               or isinstance(allowed_ref, dict))
        self.allowed = allowed_ref if self._allowed_ready else None
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.queries = qs
        # probe_distinct: the BlockSearchCharSet variant
        # (search/BlockSearchCharSet.java) — probe each node with the
        # DISTINCT n-gram keys only. The candidate test is an AND over
        # set membership, so duplicate keys add zero information;
        # repeated-token patterns probe fewer keys with identical results.
        key_segs = ([np.unique(q["ngram_keys"]) for q in qs]
                    if probe_distinct
                    else [q["ngram_keys"] for q in qs])
        self.q_keys = (np.concatenate(key_segs)
                       if qs else np.empty(0, dtype=np.uint64))
        self.q_lens = np.array([len(k) for k in key_segs], dtype=np.int64)
        self.q_bounds = np.zeros(len(qs) + 1, dtype=np.int64)
        np.cumsum(self.q_lens, out=self.q_bounds[1:])
        self.level_salts = np.array(
            [derive_seed(cfg.seed, "interval_salt", lv) & 0xFFFFFFFFFFFFFFFF
             for lv in range(cfg.num_levels)], dtype=np.uint64)
        self.probe_key_count = 0  # bloom keys probed (cost instrumentation)

    def _sweep(self, blooms: dict, seed_levels: np.ndarray,
               key_levels: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
        """BFS over (interval, query) pairs; returns surviving leaf pairs
        (slots, query_idx). ``seed_levels[q]`` = level at which query q
        enters the frontier (clamped to available levels).

        ``key_levels`` (flat, aligned with ``self.q_keys``): per-TOKEN
        activation levels — the ``MultiLevelPruning`` semantics
        (``search/MultiLevelPruning.java:23-32``): a node at level L is
        probed only with the query tokens whose plan level <= L (shallower
        filters answer "yes" almost surely for frequent tokens and are
        uninformative). ``None`` probes every token at every level."""
        wb = self.cfg.window_bits
        sorted_keys = self.q_keys
        active_len = None
        if key_levels is not None:
            # sort keys within each query segment by activation level; the
            # level-L active set is then a prefix per query
            key_qidx = np.repeat(np.arange(len(self.q_lens)), self.q_lens)
            order = np.lexsort((key_levels, key_qidx))
            sorted_keys = self.q_keys[order]
            sorted_lv = key_levels[order]
            active_len = np.empty((len(self.q_lens), wb + 1), dtype=np.int64)
            for q in range(len(self.q_lens)):
                seg = sorted_lv[self.q_bounds[q]:self.q_bounds[q + 1]]
                active_len[q] = np.searchsorted(seg, np.arange(wb + 1),
                                                side="right")
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
                lens = (self.q_lens[cur_qi] if active_len is None
                        else active_len[cur_qi, lv])
                nz = lens > 0
                ok = np.ones(len(cur_iv), dtype=bool)
                if nz.any():
                    key_idx, offs = _grouped_arange(
                        self.q_bounds[cur_qi[nz]], lens[nz])
                    salts = splitmix64(cur_iv[nz].astype(np.uint64)
                                       ^ self.level_salts[lv])
                    keys = sorted_keys[key_idx] ^ np.repeat(salts, lens[nz])
                    self.probe_key_count += len(keys)
                    hits = bloom.contains(keys)
                    ok[nz] = np.logical_and.reduceat(hits, offs[:-1]) \
                        if len(hits) else np.empty(0, dtype=bool)
                cur_iv, cur_qi = cur_iv[ok], cur_qi[ok]
            if lv == wb:
                break
            # NOTE: an empty frontier must NOT end the sweep — queries with
            # deeper seed levels still enter at later iterations
            if len(cur_iv):
                cur_iv = np.concatenate([cur_iv * 2, cur_iv * 2 + 1])
                cur_qi = np.tile(cur_qi, 2)
        return cur_iv, cur_qi

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if not self._allowed_ready:
            # NON-blocking: apply the cross-window gate only once the
            # async descend has finished — earlier batches probe with
            # the full query list (same exact results, downstream
            # verify is exact either way), so the probe pipeline never
            # stalls behind the coordinator
            ready, _ = ray.wait([self._allowed_src], timeout=0)
            if ready:
                obj = ray.get(self._allowed_src)
                self.allowed = (obj.allowed if obj is not None
                                and hasattr(obj, "allowed") else obj)
                self._allowed_ready = True
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
                q_gate = None
                if self.allowed is not None:
                    struct = self.allowed.get(str(src))
                    if struct is None:
                        continue  # no query survived to this source
                    wins_a, offs_a, qi_a = struct
                    pos = np.searchsorted(wins_a, win)
                    if pos >= len(wins_a) or wins_a[pos] != win:
                        continue  # no query survived to this window
                    q_gate = qi_a[offs_a[pos]:offs_a[pos + 1]]
                blooms = {int(lv): sketch_from_bytes(b)
                          for lv, b in pickle.loads(blob).items()}
                min_lvl = min(blooms)
                key_levels = None
                if (self.planner_kind == "markov"
                        and self.markov_model is not None
                        and n_tokens is not None):
                    from .planner import MarkovPlanner
                    mk = MarkovPlanner(self.markov_model, self.conf or 0.95,
                                       cfg.fp, cfg.window_bits)
                    wtok = int(n_tokens[r])
                    seed_levels = np.array(
                        [min(max(mk.plan_tokens(wtok, q["tokens"]),
                                 min_lvl), cfg.window_bits)
                         for q in self.queries], dtype=np.int64)
                elif has_planner and cms_blobs[r] is not None:
                    cms = sketch_from_bytes(cms_blobs[r])
                    wtok = int(n_tokens[r]) if n_tokens else 0
                    if self.planner_kind == "multilevel" and wtok > 0:
                        # per-TOKEN seed levels from one bulk CMS estimate
                        # (search/MultiLevelPruning.java:23-32)
                        from .planner import pruning_levels_bloom_vec
                        est = cms.estimate(self.q_keys).astype(np.float64)
                        probs = np.clip(est / wtok, 1e-12, 1 - 1e-9)
                        base = wtok / (1 << cfg.window_bits)
                        key_levels = np.clip(
                            pruning_levels_bloom_vec(
                                base, cfg.window_bits, self.conf or 0.95,
                                probs, cfg.fp),
                            min_lvl, cfg.window_bits)
                        seed_levels = np.minimum.reduceat(
                            key_levels, self.q_bounds[:-1])
                    else:
                        from .planner import (CostPlanner, IECostPlanner,
                                              MostFreqPlanner,
                                              SetConfPlanner)
                        if self.planner_kind == "cost":
                            planner = CostPlanner(cfg.fp, cfg.window_bits)
                        elif self.planner_kind == "ie":
                            planner = IECostPlanner(cfg.fp,
                                                    cfg.window_bits)
                        elif self.planner_kind == "ie_selective":
                            # SelectiveFanout regime (SelectiveFanout.java)
                            planner = IECostPlanner(cfg.fp,
                                                    cfg.window_bits,
                                                    selective=True)
                        elif self.planner_kind == "setconf":
                            planner = SetConfPlanner(self.conf or 0.95,
                                                     cfg.window_bits)
                        else:
                            planner = MostFreqPlanner(self.conf or 0.95,
                                                      cfg.fp,
                                                      cfg.window_bits)
                        seed_levels = np.array(
                            [min(max(planner.plan(
                                cms, wtok,
                                self.q_keys[self.q_bounds[q]:
                                            self.q_bounds[q + 1]]
                            ), min_lvl), cfg.window_bits)
                             for q in range(n_q)], dtype=np.int64)
                else:
                    seed_levels = np.full(n_q, min_lvl, dtype=np.int64)
                if q_gate is not None:
                    gated = np.full(n_q, cfg.window_bits + 1, dtype=np.int64)
                    gated[q_gate] = seed_levels[q_gate]  # > wb never enters
                    seed_levels = gated
                slots, qi = self._sweep(blooms, seed_levels, key_levels)
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


def _match_pairs(flat: np.ndarray, offsets: np.ndarray,
                 pair_rows: np.ndarray, pair_qis: np.ndarray,
                 q_tokens: list[np.ndarray]
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact sliding-window match for a set of (row, query) candidate
    pairs, adaptive per query:

    - **full-scan** (high-cardinality queries): when a query's candidate
      segments cover >= ``HBI_FULLSCAN_FRAC`` (default 0.5) of the
      batch's flat token array, the shifted-compare sweep runs over the
      WHOLE flat array sequentially and the matched rows are intersected
      with the candidate row set afterwards. The per-pair segment gather
      is skipped entirely — for frequent patterns it was re-reading each
      row's tokens once per candidate query (~5 GB of random gathers per
      288-query batch at sf0.1x4), which saturated the memory bus and
      capped multi-worker scaling; the flat array is a few MB and
      streams through cache. Intersecting afterwards keeps results
      identical: candidates are a superset of true matches (bloom
      no-false-negative) and the intersection re-applies any upstream
      per-query scope filtering exactly.
    - **gather** (selective queries): candidate segments are gathered in
      ONE global fancy-index across all such queries (round-4 perf: the
      old per-query gather rebuilt arange/repeat index arrays 288x per
      batch — ~70% of verify CPU was index construction, not matching),
      and each query runs its sweep over its own contiguous slice.

    Per-row tail positions are killed by L-1 sparse scatters instead of
    materializing a per-token local-position array. Returns (matched row
    indices, matched query indices, per-pair occurrence counts —
    overlapping starts each count, matching the reference's
    per-position ``report``)."""
    import os as _os
    empty = (np.empty(0, np.int64), np.empty(0, np.int32),
             np.empty(0, np.int64))
    if not len(pair_rows):
        return empty
    offsets = np.asarray(offsets)
    order = np.argsort(pair_qis, kind="stable")
    pr, pq = pair_rows[order], pair_qis[order]
    seg_lens = offsets[pr + 1] - offsets[pr]
    qlens = np.array([len(q) for q in q_tokens], dtype=np.int64)
    fits = seg_lens >= qlens[pq]
    pr, pq, seg_lens = pr[fits], pq[fits], seg_lens[fits]
    if not len(pr):
        return empty
    uq = np.unique(pq)
    qbounds = np.searchsorted(pq, uq)
    qbounds = np.concatenate([qbounds, [len(pq)]])
    qcounts = qbounds[1:] - qbounds[:-1]
    n_flat = len(flat)
    n_rows = len(offsets) - 1
    frac = float(_os.environ.get("HBI_FULLSCAN_FRAC", "0.5"))
    seg_cum = np.concatenate([[0], np.cumsum(seg_lens)])
    scan_q = ((seg_cum[qbounds[1:]] - seg_cum[qbounds[:-1]])
              >= frac * max(1, n_flat))
    # one global gather over the pairs of gather-path queries only
    pair_scan = np.repeat(scan_q, qcounts)
    pr_g, seg_g = pr[~pair_scan], seg_lens[~pair_scan]
    if len(pr_g):
        take, sub_offs = _grouped_arange(offsets[pr_g], seg_g)
        sub = flat[take]
    else:
        sub = flat[:0]
        sub_offs = np.zeros(1, np.int64)
    qb_g = np.concatenate(
        [[0], np.cumsum(np.where(scan_q, 0, qcounts))])
    # reused full-scan buffers (allocated once per batch, not per query)
    m_buf = tmp_buf = None
    out_row_parts: list[np.ndarray] = []
    out_qi_parts: list[np.ndarray] = []
    out_cnt_parts: list[np.ndarray] = []
    for t, qi in enumerate(uq):
        a, b = int(qbounds[t]), int(qbounds[t + 1])
        q = q_tokens[qi]
        L = len(q)
        if scan_q[t]:
            if m_buf is None:
                m_buf = np.empty(n_flat, dtype=bool)
                tmp_buf = np.empty(n_flat, dtype=bool)
            m = m_buf
            np.equal(flat, q[0], out=m)
            for j in range(1, L):
                m[n_flat - j:] = False
                np.equal(flat[j:], q[j], out=tmp_buf[:n_flat - j])
                m[:n_flat - j] &= tmp_buf[:n_flat - j]
            # kill in-row tail starts (t + L <= row_len); the guard keeps
            # a short row's scatter from reaching into the previous row
            for j in range(1, L):
                idx = offsets[1:] - j
                ok = idx >= offsets[:-1]
                m[idx[ok]] = False
            posm = np.nonzero(m)[0]
            if not len(posm):
                continue
            rowm = np.searchsorted(offsets, posm, side="right") - 1
            counts = np.bincount(rowm, minlength=n_rows)
            hit = np.nonzero(counts)[0]
            cand = np.unique(pr[a:b])
            pos = np.searchsorted(cand, hit)
            okc = pos < len(cand)
            okc[okc] = cand[pos[okc]] == hit[okc]
            sel = hit[okc]
            if len(sel):
                out_row_parts.append(sel.astype(np.int64))
                out_qi_parts.append(np.full(len(sel), qi, dtype=np.int32))
                out_cnt_parts.append(counts[sel].astype(np.int64))
            continue
        ga, gb = int(qb_g[t]), int(qb_g[t + 1])
        s0, s1 = int(sub_offs[ga]), int(sub_offs[gb])
        subq = sub[s0:s1]
        offsq = sub_offs[ga:gb + 1] - s0
        n = len(subq)
        m = subq == q[0]
        for j in range(1, L):
            m[n - j:] = False
            m[:n - j] &= subq[j:] == q[j]
        # a match starting at local position t needs t + L <= row_len:
        # zero the last L-1 start positions of every row (each row fits,
        # so these scatters never cross into the previous row)
        for j in range(1, L):
            m[offsq[1:] - j] = False
        posm = np.nonzero(m)[0]
        if not len(posm):
            continue
        rowm = np.searchsorted(offsq, posm, side="right") - 1
        counts = np.bincount(rowm, minlength=gb - ga)
        hit = np.nonzero(counts)[0]
        if len(hit):
            out_row_parts.append(pr_g[ga:gb][hit])
            out_qi_parts.append(np.full(len(hit), qi, dtype=np.int32))
            out_cnt_parts.append(counts[hit].astype(np.int64))
    if not out_row_parts:
        return empty
    return (np.concatenate(out_row_parts), np.concatenate(out_qi_parts),
            np.concatenate(out_cnt_parts))


# per-worker-process cache of the last assembled candidate-struct set,
# keyed by the exchange's ref identities: map_batches with a plain
# callable instance runs as a TASK pool, so every task deserializes a
# fresh ExactVerifier and would re-ray.get + re-assemble the same slice
# structs (measured ~35 core-s per 288-query batch at 8 workers — plasma
# fetch contention, not compute). Worker processes are reused across
# tasks; caching one struct set per process cuts the fetches from
# O(tasks) to O(workers). Holding the views pins at most one batch's
# structs in plasma per worker until the next query batch replaces them.
_STRUCT_CACHE: dict = {}
# per-worker-process cache of the resolved candidate-gate bloom (see
# BloomGateVerifier: the UDF must ship refs, not the bloom itself)
_GATE_CACHE: dict = {}


class ExactVerifier:
    """Sequences-side exact verification (semi-join on broadcast compact
    candidate structs ``{source: (sorted_doc_idx, offsets, query_idx)}``)."""

    def __init__(self, cfg: HbiConfig, cand_ref, queries_ref,
                 with_counts: bool = False):
        self.cfg = cfg
        if isinstance(cand_ref, dict):
            self.cands = cand_ref
            self._cand_src = None
        else:
            # ObjectRef or list of hash-sliced struct refs from the
            # parallel exchange: resolve LAZILY at first batch — this
            # __init__ runs on the DRIVER when the instance is passed to
            # map_batches, and an eager ray.get here would pull every
            # struct into the task closure (shipped per task) instead of
            # letting workers read them zero-copy from plasma
            self.cands = None
            self._cand_src = cand_ref
        qs = ray.get(queries_ref) if not isinstance(queries_ref, list) \
            else queries_ref
        self.q_tokens = [np.asarray(q["tokens"], dtype=np.int32) for q in qs]
        self.with_counts = with_counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os as _os
        import time as _t
        _prof = _os.environ.get("HBI_QPROF")
        _w0, _c0 = _t.perf_counter(), _t.process_time()
        from ..stages.window import doc_index
        _fetch = 0.0
        if self.cands is None:
            _f0 = _t.perf_counter()
            src = self._cand_src
            key = (tuple(r.hex() for r in src) if isinstance(src, list)
                   else src.hex())
            cached = _STRUCT_CACHE.get(key)
            if cached is not None:
                self.cands = cached
            else:
                if isinstance(src, list):
                    self.cands = {}
                    for part in ray.get(src):
                        self.cands.update(part)
                else:
                    self.cands = ray.get(src)
                _STRUCT_CACHE.clear()  # hold at most one struct set
                _STRUCT_CACHE[key] = self.cands
            _fetch = _t.perf_counter() - _f0
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
        def empty():
            cols = {
                "query_idx": pa.array([], pa.int32()),
                "doc_id": pa.array([], batch["doc_id"].type
                                   if batch.num_rows else pa.string()),
            }
            if self.with_counts:
                cols["n_matches"] = pa.array([], pa.int64())
            return pa.table(cols)

        if not pr_parts:
            return empty()
        pair_rows = np.concatenate(pr_parts)
        pair_qis = np.concatenate(pq_parts)
        _wp = _t.perf_counter()
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        _wf = _t.perf_counter()
        out_rows, out_qis, out_cnts = _match_pairs(
            flat, offsets, pair_rows, pair_qis, self.q_tokens)
        if _prof:
            with open(f"/tmp/qprof/{_os.getpid()}.jsonl", "a") as fh:
                import json as _json
                fh.write(_json.dumps({
                    "wall": round(_t.perf_counter() - _w0, 4),
                    "cpu": round(_t.process_time() - _c0, 4),
                    "fetch": round(_fetch, 4),
                    "t_pairs": round(_wp - _w0 - _fetch, 4),
                    "t_flat": round(_wf - _wp, 4),
                    "t_match": round(_t.perf_counter() - _wf, 4),
                    "rows": batch.num_rows, "pairs": len(pair_rows),
                }) + "\n")
        if not len(out_rows):
            return empty()
        cols = {
            "query_idx": pa.array(out_qis, pa.int32()),
            "doc_id": batch["doc_id"].take(
                pa.array(out_rows, pa.int64())),
        }
        if self.with_counts:
            cols["n_matches"] = pa.array(out_cnts, pa.int64())
        return pa.table(cols)


class BloomGateVerifier:
    """Sequences-side verification gated by a broadcast FIXED-SIZE bloom
    over candidate (source, doc_index) keys — the distributed candidate
    exchange. The driver never materializes the candidate set; a frequent
    token whose candidates approach corpus size costs one bloom (MBs), not
    a corpus-sized broadcast. Rows passing the gate are exact-verified
    against every query (gate false positives and cross-query admissions
    only add verify work; results stay exact). Emits (query_idx, doc_id,
    source, window_id) so scope filters can re-apply exactly after the
    (lossy) gate."""

    def __init__(self, cfg: HbiConfig, bloom_ref, queries_ref,
                 key_seed: int, with_counts: bool = False):
        self.cfg = cfg
        # hold REFS only: this instance is cloudpickled as the UDF, so
        # resolving here would inline the gate bloom into every task's
        # payload (observed 128 MB/task at the sf1 soak — the bloom is
        # sized to the candidate count). Resolve lazily on the worker,
        # once per process (_GATE_CACHE), zero-copy from local plasma.
        self._bloom_ref = bloom_ref
        self._queries_ref = queries_ref
        self.bloom = None
        self.q_tokens = None
        self.key_seed = key_seed
        self.with_counts = with_counts

    def _resolve(self):
        if self.bloom is not None:
            return
        if isinstance(self._bloom_ref, bytes):
            self.bloom = sketch_from_bytes(self._bloom_ref)
        else:
            key = self._bloom_ref.hex()
            cached = _GATE_CACHE.get(key)
            if cached is None:
                cached = sketch_from_bytes(ray.get(self._bloom_ref))
                _GATE_CACHE.clear()  # hold at most one gate bloom
                _GATE_CACHE[key] = cached
            self.bloom = cached
        qs = self._queries_ref if isinstance(self._queries_ref, list) \
            else ray.get(self._queries_ref)
        self.q_tokens = [np.asarray(q["tokens"], dtype=np.int32) for q in qs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.splitmix import hash_str_u64
        from ..stages.window import doc_index

        def empty():
            cols = {
                "query_idx": pa.array([], pa.int32()),
                "doc_id": pa.array([], batch["doc_id"].type
                                   if batch.num_rows else pa.string()),
                "source": pa.array([], pa.string()),
                "window_id": pa.array([], pa.int64()),
            }
            if self.with_counts:
                cols["n_matches"] = pa.array([], pa.int64())
            return pa.table(cols)

        if not batch.num_rows:
            return empty()
        self._resolve()
        di = doc_index(batch)
        srcs = np.asarray(batch["source"].to_pylist(), dtype=object)
        uniq_src, inv = np.unique(srcs, return_inverse=True)
        src_hash = np.array([hash_str_u64(str(s), self.key_seed)
                             for s in uniq_src], dtype=np.uint64)
        keys = splitmix64(src_hash[inv] ^ di.astype(np.uint64))
        rows = np.nonzero(self.bloom.contains(keys))[0]
        if not len(rows):
            return empty()
        n_q = len(self.q_tokens)
        pair_rows = np.repeat(rows, n_q)
        pair_qis = np.tile(np.arange(n_q, dtype=np.int64), len(rows))
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        out_rows, out_qis, out_cnts = _match_pairs(
            flat, offsets, pair_rows, pair_qis, self.q_tokens)
        if not len(out_rows):
            return empty()
        take = pa.array(out_rows, pa.int64())
        cols = {
            "query_idx": pa.array(out_qis, pa.int32()),
            "doc_id": batch["doc_id"].take(take),
            "source": pa.array(srcs[out_rows].tolist(), pa.string()),
            "window_id": pa.array(
                di[out_rows] >> self.cfg.window_bits, pa.int64()),
        }
        if self.with_counts:
            cols["n_matches"] = pa.array(out_cnts, pa.int64())
        return pa.table(cols)


class _SuperGate:
    """Index-partition prefilter from the ASYNC super descend: keeps only
    (source, window) rows some query survived to. Resolves the
    coordinator actor's ``SuperPruneResult`` lazily on the WORKER (first
    batch) so the driver schedules the probe pipeline without waiting for
    the descend — reads and the descend overlap."""

    def __init__(self, sprune_ref):
        self._ref = sprune_ref
        self._ready = False
        self._union = None
        self._covered = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self._ready:
            # non-blocking (see BloomProbe): gate once the descend is
            # done, pass rows through before that — pruning is an
            # optimization, never a correctness requirement
            done, _ = ray.wait([self._ref], timeout=0)
            if not done:
                return t
            res = ray.get(self._ref)
            # super_prune can return None (store absent / format or
            # params mismatch re-checked in the actor, e.g. a concurrent
            # expire_windows deleted out/super) — mirror BloomProbe and
            # degrade to a pass-through gate instead of AttributeError
            if res is not None:
                self._union = res.window_union
                self._covered = res.covered_sources
            self._ready = True
        if self._union is None or not t.num_rows:
            return t
        srcs = np.asarray(t["source"].to_pylist(), dtype=object)
        wins = t["window_id"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(srcs), dtype=bool)
        for s in np.unique(srcs):
            m = srcs == s
            if str(s) not in self._covered:
                keep[m] = True  # source unknown to the super store
                continue
            w = self._union.get(str(s))
            if w is None or not len(w):
                continue
            pos = np.searchsorted(w, wins[m])
            posc = np.minimum(pos, len(w) - 1)
            keep[m] = w[posc] == wins[m]
        return t.filter(pa.array(keep))


@ray.remote
def _split_block_parts(K: int, window_bits: int, block: pa.Table):
    """Stage 1 of the candidate exchange shuffle: split ONE candidate
    block into K per-slice parts (source hash-partitioned, numpy
    payloads). Called with ``num_returns=K`` so each slice's share is an
    independent object — the block itself is decoded exactly once, on a
    task Ray can schedule next to the block (ADVICE r3: the old
    single-stage design expanded every block ref into every slice task,
    a K-fold fetch on a cluster)."""
    import zlib as _z
    out: list[dict[str, tuple]] = [dict() for _ in range(K)]
    b = block
    if b.num_rows:
        col = b.column("source").combine_chunks()
        de = (col if pa.types.is_dictionary(col.type)
              else col.dictionary_encode())
        vocab = de.dictionary.to_pylist()
        idx = de.indices.to_numpy(zero_copy_only=False)
        di_all = ((b["window_id"].to_numpy(zero_copy_only=False)
                   << window_bits)
                  | b["slot"].to_numpy(zero_copy_only=False))
        qi_all = (b["query_idx"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        for code, src in enumerate(vocab):
            m = idx == code
            if not m.any():
                continue
            k = _z.crc32(str(src).encode()) % K
            out[k][str(src)] = (di_all[m], qi_all[m])
    return tuple(out)


@ray.remote
def _merge_slice(window_bits: int, parts: list):
    """Stage 2: merge one slice's per-block parts into compact verify
    structs. ``parts`` is a list of NESTED ObjectRefs (not expanded as
    args) resolved here, so the fetch is exactly this slice's own share
    of each block — cross-node traffic equals the data the slice needs,
    once. Two returns: ({source: (sorted_doc_idx, offsets, query_idx)},
    window union) — the driver fetches only the tiny window union; the
    structs go worker-to-worker through the object store."""
    agg: dict[str, list[tuple]] = {}
    for p in ray.get(list(parts)):
        for src, pair in p.items():
            agg.setdefault(src, []).append(pair)
    structs: dict[str, tuple] = {}
    wins_all: list[np.ndarray] = []
    for src, chunks in agg.items():
        di = np.concatenate([c[0] for c in chunks])
        qi = np.concatenate([c[1] for c in chunks])
        order = np.lexsort((qi, di))
        di, qi = di[order], qi[order]
        uniq, starts = np.unique(di, return_index=True)
        offs = np.concatenate([starts, [len(di)]]).astype(np.int64)
        structs[src] = (uniq, offs, qi)
        wins_all.append(np.unique(uniq >> np.int64(window_bits)))
    wins = (np.unique(np.concatenate(wins_all)) if wins_all
            else np.empty(0, np.int64))
    return structs, wins


def prune_sequence_files(sequences_meta: list[dict], cand_structs: dict,
                         cfg: HbiConfig) -> list[str]:
    """Files of a window-aligned corpus layout that can contain ANY
    candidate doc: keep a file iff its [window_lo, window_hi) intersects
    the union of candidate windows (vectorized interval check)."""
    wins: set[int] = set()
    for uniq_di, _, _ in cand_structs.values():
        wins.update(np.unique(
            np.asarray(uniq_di, dtype=np.int64)
            >> cfg.window_bits).tolist())
    return _prune_files_by_windows(
        sequences_meta, np.array(sorted(wins), dtype=np.int64))


def _wins_from_prune(res, manifest_sources: list[str],
                     sources: list[str] | None) -> np.ndarray | None:
    """Candidate-window superset derived from the super descend result,
    mirroring ``_SuperGate`` exactly: a covered source contributes its
    window union (empty = every query died there); an uncovered source
    passes the gate unfiltered, so no file can be pruned — return None
    and let the caller fall back to the exact candidate unions."""
    if res is None:
        return None
    relevant = (manifest_sources if sources is None
                else [s for s in manifest_sources if s in set(sources)])
    parts: list[np.ndarray] = []
    for s in relevant:
        if s not in res.covered_sources:
            return None
        w = res.window_union.get(str(s))
        if w is None or not len(w):
            continue
        parts.append(np.asarray(w, dtype=np.int64))
    return (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.int64))


def _prune_files_by_windows(sequences_meta: list[dict],
                            w: np.ndarray) -> list[str]:
    if not len(w):
        return []
    los = np.array([m["window_lo"] for m in sequences_meta],
                   dtype=np.int64)
    his = np.array([m["window_hi"] for m in sequences_meta],
                   dtype=np.int64)
    # file needed iff some candidate window w satisfies lo <= w < hi:
    # the smallest candidate >= lo must be < hi
    pos = np.searchsorted(w, los, side="left")
    ok = (pos < len(w)) & (np.where(pos < len(w), w[np.minimum(
        pos, len(w) - 1)], np.iinfo(np.int64).max) < his)
    return [m["path"] for m, keep in zip(sequences_meta, ok) if keep]


def window_aligned_layout(path: str, rows_per_file: int,
                          docs_per_file_per_source: int,
                          cfg: HbiConfig) -> list[dict]:
    """Layout metadata for a corpus written as equal-row window-aligned
    files in sorted order (e.g. the bench synth corpus: sources
    interleaved round-robin, ``rows_per_file`` rows each -> every source
    advances ``docs_per_file_per_source`` docs per file)."""
    from pathlib import Path as _P
    files = sorted(str(p) for p in _P(path).glob("*.parquet"))
    if docs_per_file_per_source % cfg.docs_per_window:
        raise ValueError("files must hold whole windows per source")
    span = docs_per_file_per_source >> cfg.window_bits
    return [{"path": f, "window_lo": i * span, "window_hi": (i + 1) * span}
            for i, f in enumerate(files)]


def _scope_filter_fn(sources, window_range, per_query_scope):
    """Vectorized (source, window, per-query) scope re-check as a
    map_batches callable over verified-hit blocks carrying ``source`` /
    ``window_id`` columns — the exact re-application after a lossy
    admitting gate, distributed instead of driver-side. None when no
    scoping is active."""
    if sources is None and window_range is None and per_query_scope is None:
        return None
    src_set = set(sources) if sources is not None else None
    if per_query_scope is not None:
        q_src = np.array([s if s is not None else "" for s, _ in
                          per_query_scope], dtype=object)
        q_win = np.array([w if w is not None else -1 for _, w in
                          per_query_scope], dtype=np.int64)

    def f(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        keep = np.ones(t.num_rows, dtype=bool)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        win = t["window_id"].to_numpy(zero_copy_only=False)
        if src_set is not None:
            keep &= np.array([s in src_set for s in src], dtype=bool)
        if window_range is not None:
            keep &= (win >= window_range[0]) & (win < window_range[1])
        if per_query_scope is not None:
            qi = t["query_idx"].to_numpy(zero_copy_only=False)
            keep &= ((q_src[qi] == "") | (q_src[qi] == src))
            keep &= (q_win[qi] == -1) | (q_win[qi] == win)
        return t.filter(pa.array(keep))

    return f


def _verify_distributed(cand_mat: "rd.Dataset", sequences_ds: "rd.Dataset",
                        compiled: list[dict], cfg: HbiConfig, q_ref,
                        n_cand: int, *, sources, window_range,
                        per_query_scope, with_counts: bool = False):
    """Distributed candidate exchange: aggregate candidate (source,
    doc_index) keys into ONE fixed-size bloom (a distributed tree reduce —
    candidates never reach the driver), broadcast it to the verify stage,
    and re-apply every scope filter exactly on the verified hits (the gate
    is lossy in the admitting direction only). Returns a LAZY Dataset of
    (query_idx, doc_id[, n_matches]) — hits never pass through the driver
    (VERDICT r3 #1) — or None when there are no candidates."""
    from ..stages.aggregate import BloomAgg
    from ..state.splitmix import derive_seed, hash_str_u64

    if n_cand == 0:
        return None
    key_seed = derive_seed(cfg.seed, "cand_gate")

    def to_keys(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"ckey": pa.array([], pa.uint64())})
        srcs = np.asarray(t["source"].to_pylist(), dtype=object)
        uniq_src, inv = np.unique(srcs, return_inverse=True)
        src_hash = np.array([hash_str_u64(str(s), key_seed)
                             for s in uniq_src], dtype=np.uint64)
        di = ((t["window_id"].to_numpy(zero_copy_only=False)
               << cfg.window_bits)
              | t["slot"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        keys = splitmix64(src_hash[inv] ^ di)
        return pa.table({"ckey": pa.array(keys, pa.uint64())})

    agg = cand_mat.map_batches(to_keys, batch_format="pyarrow").aggregate(
        BloomAgg(cfg.seed, n=max(int(n_cand), 1024), fp=1e-3, on="ckey",
                 alias_name="cand_bloom"))
    bloom_ref = ray.put(agg["cand_bloom"])
    hits_ds = sequences_ds.map_batches(
        BloomGateVerifier(cfg, bloom_ref, q_ref, key_seed,
                          with_counts=with_counts),
        batch_format="pyarrow", zero_copy_batch=True)
    scope = _scope_filter_fn(sources, window_range, per_query_scope)
    if scope is not None:
        hits_ds = hits_ds.map_batches(scope, batch_format="pyarrow")
    return hits_ds.select_columns(
        ["query_idx", "doc_id"] + (["n_matches"] if with_counts else []))


def _membership_hits(index_ds: "rd.Dataset", sequences_ds: "rd.Dataset",
                     queries: list[tuple[str, list[int]]], cfg: HbiConfig,
                     *, probe_concurrency=None, conf: float | None = None,
                     planner: str | None = None, strides: bool = False,
                     sources: list[str] | None = None,
                     window_range: tuple[int, int] | None = None,
                     per_query_scope: list[tuple] | None = None,
                     super_dir: str | None = None,
                     candidate_mode: str = "auto",
                     broadcast_limit: int = 16_000_000,
                     markov_model=None,
                     with_counts: bool = False,
                     probe_distinct: bool = False,
                     sequences_meta: list[dict] | None = None,
                     stats: dict | None = None):
    """Shared front of the membership query: compile -> async super
    descend -> partition-pruned bloom probe -> candidate exchange ->
    LAZY verified-hits Dataset of (query_idx, doc_id[, n_matches]).

    Returns ``(hits_ds | None, compiled)``. Nothing hit-sized touches
    the driver here (VERDICT r3 #1): the hits stay a Dataset for the
    caller to collect (``membership_query``, the small-result
    convenience path) or keep distributed (``membership_query_ds``,
    the scale path).

    ``sources`` / ``window_range`` scope the query (FIXTURES.md F3): index
    partitions outside the scope are pruned before any probe — the Ray
    analogue of the reference's window-horizon partition pruning
    (``PMIndex/HBI.java:263-266``).

    ``super_dir``: an index directory holding cross-window super levels
    (``pipelines/super_index.py``, the reference's across-trees pruning
    ``PMIndex/HBI.java:207-266``): the super descend runs first, index
    partitions outside any query's surviving windows are never read into
    the probe, and each surviving window only probes the queries that
    reached it — probe work drops from O(windows) to O(log windows) for
    absent tokens.

    ``stats``: optional dict filled with probe telemetry
    (candidates, n_queries, super_probes, mode) for benchmarking —
    the Ray analogue of the reference's perf counters
    (``utilities/BenchmarkOrchestrator.java`` CSV columns).

    ``sequences_meta``: optional window-aligned file layout of the
    sequences corpus — ``[{"path": ..., "window_lo": L, "window_hi": H}]``
    (half-open window range per file, any source). When given and the
    candidate exchange runs in broadcast mode, the verify stage reads
    ONLY the files whose window range intersects a candidate window —
    for selective queries the verify cost stops being O(corpus) and
    becomes O(candidate windows), the sequences-side analogue of the
    super-level index pruning. Results are identical either way (the
    pruned set is a superset of every candidate's file).
    """
    import pyarrow.compute as pc

    compiled = compile_queries(queries, cfg, strides=strides)
    # async descend: dispatched to the coordinator actor; the driver
    # proceeds to schedule the probe pipeline and every consumer resolves
    # the ref lazily on its worker (VERDICT r2 #1: no driver-serial
    # descend on the query critical path)
    sprune_ref = None
    if super_dir is not None:
        from .super_index import super_prune_async
        sprune_ref = super_prune_async(super_dir, cfg, compiled,
                                       sources=sources,
                                       window_range=window_range)
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
    allowed_struct = None
    if sprune_ref is not None:
        index_ds = index_ds.map_batches(_SuperGate(sprune_ref),
                                        batch_format="pyarrow")
        allowed_struct = sprune_ref  # BloomProbe resolves lazily too
    cols = ["source", "window_id", "bloom_tree"]
    if conf is not None or planner is not None:
        cols += ["cms", "n_tokens"]
    # plain callable INSTANCES -> elastic task pool (no actor-pool startup
    # cost; compiled queries ride along in the serialized closure).
    # batch_size=None: batches follow the read's block layout, which lets
    # Ray FUSE ReadParquet->gate->Project->BloomProbe into one task — the
    # bloom blobs (the index's dominant bytes) never round-trip through
    # the object store between read and probe
    cand_ds = index_ds.select_columns(cols).map_batches(
        BloomProbe(cfg, compiled, conf=conf, planner=planner,
                   allowed_ref=allowed_struct,
                   probe_distinct=probe_distinct,
                   markov_model=(markov_model.to_bytes()
                                 if markov_model is not None
                                 and not isinstance(markov_model, bytes)
                                 else markov_model)),
        batch_format="pyarrow")

    if per_query_scope is not None:
        # (source|None, window_id|None) per query: filter candidates the
        # scoped query may not see (FIXTURES.md F3 per-query scoping)
        q_src = np.array([s if s is not None else "" for s, _ in
                          per_query_scope], dtype=object)
        q_win = np.array([w if w is not None else -1 for _, w in
                          per_query_scope], dtype=np.int64)

        def scope_filter(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            qi = t["query_idx"].to_numpy(zero_copy_only=False)
            src = np.asarray(t["source"].to_pylist(), dtype=object)
            win = t["window_id"].to_numpy(zero_copy_only=False)
            ok = (((q_src[qi] == "") | (q_src[qi] == src))
                  & ((q_win[qi] == -1) | (q_win[qi] == win)))
            return t.filter(pa.array(ok))

        cand_ds = cand_ds.map_batches(scope_filter, batch_format="pyarrow")

    # candidate exchange: broadcast the exact per-source structs while the
    # candidate count is sane (16M pairs ~ 400 MB of compact arrays built
    # by PARALLEL hash-sliced tasks and shared via plasma — one copy per
    # node, zero-copy numpy reads, and the exact structs let the verify
    # probe ONLY the candidate (row, query) pairs); switch to the
    # fixed-size bloom gate when a frequent token would make the broadcast
    # corpus-sized
    import time as _time
    _t0 = _time.perf_counter()
    cand_mat = cand_ds.materialize()
    n_cand = cand_mat.count()
    if stats is not None:
        stats["t_probe"] = round(_time.perf_counter() - _t0, 3)
        stats["candidates"] = n_cand
        stats["n_queries"] = len(compiled)
        if sprune_ref is not None:
            res = ray.get(sprune_ref)
            stats["super_probes"] = 0 if res is None else res.probes
    mode = candidate_mode
    if mode == "auto":
        mode = "broadcast" if n_cand <= broadcast_limit else "distributed"
    if stats is not None:
        stats["mode"] = mode
    q_ref = ray.put(compiled)
    _t1 = _time.perf_counter()
    if mode == "distributed":
        hits_ds = _verify_distributed(cand_mat, sequences_ds, compiled,
                                      cfg, q_ref, n_cand, sources=sources,
                                      window_range=window_range,
                                      per_query_scope=per_query_scope,
                                      with_counts=with_counts)
        if stats is not None:
            stats["t_exchange"] = round(_time.perf_counter() - _t1, 3)
        return hits_ds, compiled
    # PARALLEL candidate exchange: a two-stage shuffle of Ray tasks —
    # per-block split (num_returns=K, each block decoded once, near its
    # data), then per-slice merges over nested refs that fetch exactly
    # their own share. The compact verify structs travel worker-to-worker
    # through the object store; the driver only ever fetches the tiny
    # per-slice candidate-window unions (for file pruning), and only when
    # file pruning is on.
    # file-pruning windows: prefer the descend's window union — already
    # a driver-resident superset of every candidate window (the gate
    # filtered index rows to exactly those windows), so the exchange
    # needs NO driver-side sync at all and the verify read schedules
    # against lazy struct refs while the merge tasks are still running
    # (round-4 scaling work: the exchange barrier was ~1 s of the
    # per-batch serial floor)
    cand_wins: np.ndarray | None = None
    if not n_cand:
        cand_wins = np.empty(0, np.int64)
    elif sequences_meta is not None and sprune_ref is not None \
            and super_dir is not None:
        from .build_index import load_manifest
        man = load_manifest(super_dir)
        if man and man.get("sources"):
            cand_wins = _wins_from_prune(ray.get(sprune_ref),
                                         sorted(man["sources"]), sources)
    refs = cand_mat.to_arrow_refs()
    c_ref: list = []
    if n_cand and refs:
        K = min(16, max(2, len(refs)))
        part_refs = [
            _split_block_parts.options(num_returns=K).remote(
                K, cfg.window_bits, r) for r in refs]
        pairs = [_merge_slice.options(num_returns=2).remote(
            cfg.window_bits, [pr[k] for pr in part_refs])
            for k in range(K)]
        c_ref = [p[0] for p in pairs]
        if sequences_meta is not None and cand_wins is None:
            # exact-union fallback (no super store / uncovered source):
            # window unions drive file pruning only — without
            # sequences_meta, skip this driver sync entirely; the
            # verify stage resolves the structs lazily on its workers
            win_parts = [w for w in ray.get([p[1] for p in pairs])
                         if len(w)]
            cand_wins = (np.unique(np.concatenate(win_parts))
                         if win_parts else np.empty(0, np.int64))
    if cand_wins is None:
        cand_wins = np.empty(0, np.int64)
    if stats is not None:
        stats["t_exchange"] = round(_time.perf_counter() - _t1, 3)
    verify_ds = sequences_ds
    if sequences_meta is not None:
        paths = _prune_files_by_windows(sequences_meta, cand_wins)
        if stats is not None:
            # verify-stage read telemetry (the reference's
            # BenchmarkOrchestrator bytes-scanned counters): how much of
            # the corpus the candidate-file pruning let the verify skip
            import os as _os
            stats["verify_files"] = len(paths)
            stats["verify_files_total"] = len(sequences_meta)
            try:
                stats["verify_bytes"] = sum(
                    _os.path.getsize(p) for p in paths)
                stats["verify_bytes_total"] = sum(
                    _os.path.getsize(m["path"]) for m in sequences_meta)
            except OSError:
                pass
        if not paths:
            verify_ds = None
        else:
            import ray.data as rd_
            # one block per file: stops the read from SplitBlocks-ing
            # (which breaks Read->ExactVerifier fusion) — the token
            # stream then never round-trips through the object store
            verify_ds = rd_.read_parquet(
                paths, override_num_blocks=len(paths))
    if verify_ds is None:
        return None, compiled
    hits_ds = verify_ds.map_batches(
        ExactVerifier(cfg, c_ref, q_ref, with_counts=with_counts),
        batch_format="pyarrow", zero_copy_batch=True)
    return hits_ds, compiled


def _empty_result(with_counts: bool) -> pa.Table:
    cols = {"query_id": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.string())}
    if with_counts:
        cols["n_matches"] = pa.array([], pa.int64())
    return pa.table(cols)


def _expand_qids_fn(compiled: list[dict], with_counts: bool,
                    block_sort: bool):
    """(query_idx, doc_id[, n_matches]) -> (query_id, doc_id[,
    n_matches]) per block: dictionary expansion in C instead of a Python
    .tolist() over every hit row; optional per-block sort (sorted-run
    output for merge-on-read consumers)."""
    qids = pa.array([q["query_id"] for q in compiled], pa.string())

    def f(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_result(with_counts)
        qi_idx = t["query_idx"].combine_chunks().cast(pa.int32())
        cols = {
            "query_id": pa.DictionaryArray.from_arrays(
                qi_idx, qids).cast(pa.string()),
            "doc_id": t["doc_id"].combine_chunks(),
        }
        if with_counts:
            cols["n_matches"] = t["n_matches"].combine_chunks().cast(
                pa.int64())
        out = pa.table(cols)
        if block_sort:
            out = out.sort_by([("query_id", "ascending"),
                               ("doc_id", "ascending")])
        return out

    return f


def membership_query(index_ds: "rd.Dataset", sequences_ds: "rd.Dataset",
                     queries: list[tuple[str, list[int]]], cfg: HbiConfig,
                     *, with_counts: bool = False,
                     stats: dict | None = None, **kwargs) -> pa.Table:
    """Exact pattern-membership results for a batch of queries, collected
    to ONE pyarrow Table (query_id, doc_id[, n_matches]) sorted for
    determinism — the small-result convenience path. When the hit set can
    be large (frequent tokens x big corpus: billions of rows at 100 TB),
    use ``membership_query_ds`` instead: same pipeline, but the verified
    hits stay a Dataset end-to-end (per-block sorted or distributed-
    sorted) and never pass through the driver.

    See ``_membership_hits`` for the full pipeline shape and the meaning
    of the keyword options (sources/window_range/per_query_scope scoping,
    super_dir pruning, candidate_mode/broadcast_limit exchange control,
    sequences_meta file pruning, stats telemetry)."""
    import time as _time

    hits_ds, compiled = _membership_hits(
        index_ds, sequences_ds, queries, cfg, with_counts=with_counts,
        stats=stats, **kwargs)
    _t1 = _time.perf_counter()
    hits = None
    if hits_ds is not None:
        # stay arrow: concat block refs zero-copy — no pandas round-trip
        blocks = [b for b in ray.get(hits_ds.to_arrow_refs())
                  if b.num_rows]
        hits = pa.concat_tables(blocks) if blocks else None
    if stats is not None:
        stats["t_verify"] = round(_time.perf_counter() - _t1, 3)
    if hits is None or not hits.num_rows:
        return _empty_result(with_counts)
    tbl = _expand_qids_fn(compiled, with_counts, block_sort=False)(hits)
    return tbl.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def membership_query_ds(index_ds: "rd.Dataset", sequences_ds: "rd.Dataset",
                        queries: list[tuple[str, list[int]]],
                        cfg: HbiConfig, *, with_counts: bool = False,
                        sort: str | None = "block",
                        stats: dict | None = None,
                        **kwargs) -> "rd.Dataset":
    """Dataset-returning membership query — the scale path (VERDICT r3
    #1). The verified hits stay distributed: consume with
    ``write_parquet`` / ``iter_batches`` / an aggregate; a frequent-token
    batch returning billions of (query_id, doc_id) rows never flows
    through one process.

    ``sort``: ``None`` (no ordering — the reference's result
    normalization is order-insensitive, ``HBIDatasetBenchmark.java:
    156-182``), ``"block"`` (each output block sorted by (query_id,
    doc_id): sorted runs for merge-on-read consumers; the default), or
    ``"global"`` (a distributed ``Dataset.sort`` — total order across
    blocks without driver collection)."""
    import ray.data as rd_

    hits_ds, compiled = _membership_hits(
        index_ds, sequences_ds, queries, cfg, with_counts=with_counts,
        stats=stats, **kwargs)
    if hits_ds is None:
        return rd_.from_arrow(_empty_result(with_counts))
    out = hits_ds.map_batches(
        _expand_qids_fn(compiled, with_counts, block_sort=sort == "block"),
        batch_format="pyarrow")
    if sort == "global":
        out = out.sort(["query_id", "doc_id"])
    return out


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
