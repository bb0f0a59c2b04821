"""Cross-window super levels: build, probe-count bounds, and result
invariance (the across-trees pruning of ``PMIndex/HBI.java:139,207-266``;
SURVEY §7.1 step 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from hierarchical_bloom_filter_index_ray import HbiConfig
from hierarchical_bloom_filter_index_ray.pipelines import (
    build_index, compile_queries, load_index, load_super_meta,
    membership_query, super_prune)
from hierarchical_bloom_filter_index_ray.sources import synth_sequences

CFG = HbiConfig(seed=42, docs_per_window=64, fp=0.01, ngram=1,
                expected_tokens_per_doc=64, expected_distinct_per_doc=48,
                hll_p=12, cms_eps=0.02, cms_delta=0.05)
N_ROWS = 4096  # 2 sources x 32 windows of 64 docs
N_SOURCES = 2
CORPUS_ROWS_PER_FILE = 1024  # 512 docs/source/file = 8 whole windows


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    path = tmp_path_factory.mktemp("superdata") / "seqs"
    synth_sequences(N_ROWS, seed=7, n_sources=N_SOURCES, vocab=200_000,
                    len_min=8, len_max=64,
                    override_num_blocks=N_ROWS // CORPUS_ROWS_PER_FILE
                    ).write_parquet(
        str(path), min_rows_per_file=CORPUS_ROWS_PER_FILE,
        max_rows_per_file=CORPUS_ROWS_PER_FILE)
    return str(path)


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("superindex")
    build_index(rd.read_parquet(corpus), CFG, str(out), batch_size=512)
    return str(out)


@pytest.fixture(scope="module")
def sample_tokens(ray_session, corpus):
    # deterministic: Dataset.take() returns whichever block lands first
    # (scheduling-dependent), which made scoped-query hit sets vary
    import pyarrow.parquet as pq
    from pathlib import Path
    first = sorted(Path(corpus).glob("*.parquet"))[0]
    rows = pq.read_table(first).slice(0, 4).to_pylist()
    return [[int(t) for t in r["tokens"][:3]] for r in rows]


class TestSuperBuild:
    def test_meta_levels_stack(self, index_dir):
        meta = load_super_meta(index_dir)
        assert meta is not None and meta["fanout"] == CFG.super_fanout
        # 32 windows/source at fanout 2: up to 5 levels before 1 node/src
        assert len(meta["levels"]) >= 2
        nodes = [lv["nodes"] for lv in meta["levels"]]
        assert all(a > b for a, b in zip(nodes, nodes[1:]))

    def test_missing_token_dies_at_top(self, index_dir):
        """The headline property: an absent token probes O(levels) super
        nodes instead of O(windows) window trees."""
        compiled = compile_queries(
            [("missing", [2**30 + 5, 2**30 + 6])], CFG)
        res = super_prune(index_dir, CFG, compiled)
        assert res is not None
        total_windows = 2 * (N_ROWS // 2 // CFG.docs_per_window)
        assert res.probes < total_windows // 2
        # every source's allowed-window union should be (near-)empty;
        # bloom FPR can leak a handful, never the full window set
        leaked = sum(len(w) for w in res.window_union.values())
        assert leaked <= max(4, total_windows // 8)

    def test_present_token_reaches_its_windows(self, index_dir,
                                               sample_tokens):
        compiled = compile_queries([("q0", sample_tokens[0])], CFG)
        res = super_prune(index_dir, CFG, compiled)
        assert res is not None
        assert sum(len(w) for w in res.window_union.values()) >= 1

    def test_distributed_build_matches_local(self, index_dir, corpus,
                                             sample_tokens, tmp_path):
        """The Ray-rounds build path (forced via local_bytes_limit=0)
        produces the same levels/nodes and the same prune decisions as the
        driver-local fast path."""
        import shutil

        from hierarchical_bloom_filter_index_ray.pipelines.super_index import \
            build_super_index
        local_meta = load_super_meta(index_dir)
        dup = tmp_path / "dup"
        shutil.copytree(index_dir, dup)
        dist_meta = build_super_index(str(dup), CFG, local_bytes_limit=0)
        assert [(lv["level"], lv["nodes"]) for lv in dist_meta["levels"]] \
            == [(lv["level"], lv["nodes"]) for lv in local_meta["levels"]]
        queries = [("q0", sample_tokens[0]),
                   ("missing", [2**28 + 1, 2**28 + 2])]
        compiled = compile_queries(queries, CFG)
        a = super_prune(index_dir, CFG, compiled)
        b = super_prune(str(dup), CFG, compiled)
        assert a.probes == b.probes
        for src in set(a.allowed) | set(b.allowed):
            assert np.array_equal(a.allowed[src][0], b.allowed[src][0])

    def test_distributed_descend_matches_local(self, index_dir,
                                               sample_tokens):
        queries = [("q0", sample_tokens[0]),
                   ("missing", [2**29 + 1, 2**29 + 2])]
        compiled = compile_queries(queries, CFG)
        a = super_prune(index_dir, CFG, compiled)
        b = super_prune(index_dir, CFG, compiled, driver_cache_bytes=0)
        assert a.probes == b.probes
        assert set(a.allowed) == set(b.allowed)
        for src in a.allowed:
            wa, oa, qa = a.allowed[src]
            wb, ob, qb = b.allowed[src]
            assert np.array_equal(wa, wb)
            assert np.array_equal(oa, ob)
            assert np.array_equal(qa, qb)


class TestSuperQuery:
    def test_results_invariant_under_super_pruning(self, index_dir, corpus,
                                                   sample_tokens):
        """Super levels bound COST only — verified results are identical
        with and without them (no false negatives by Bloom construction)."""
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        queries.append(("missing", [2**30 + 5, 2**30 + 6]))
        idx = load_index(index_dir)
        seqs = rd.read_parquet(corpus)
        base = membership_query(idx, seqs, queries, CFG)
        pruned = membership_query(load_index(index_dir),
                                  rd.read_parquet(corpus), queries, CFG,
                                  super_dir=index_dir)
        assert base.num_rows > 0
        assert base.equals(pruned)

    def test_distributed_candidate_exchange_matches_broadcast(
            self, index_dir, corpus, sample_tokens):
        """candidate_mode="distributed" (fixed-size bloom gate, no driver
        candidate materialization) returns exactly the broadcast path's
        results — including under global source/window scoping, where the
        gate's false positives must be re-filtered exactly."""
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        queries.append(("missing", [2**30 + 9, 2**30 + 10]))
        base = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG,
                                candidate_mode="broadcast")
        dist = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG,
                                candidate_mode="distributed")
        assert base.num_rows > 0
        assert base.equals(dist)
        base_s = membership_query(load_index(index_dir),
                                  rd.read_parquet(corpus), queries, CFG,
                                  sources=["src1"], window_range=(2, 20),
                                  candidate_mode="broadcast")
        dist_s = membership_query(load_index(index_dir),
                                  rd.read_parquet(corpus), queries, CFG,
                                  sources=["src1"], window_range=(2, 20),
                                  candidate_mode="distributed")
        assert base_s.equals(dist_s)

    def test_with_counts_exact_occurrences(self, index_dir, corpus,
                                           sample_tokens):
        """with_counts=True returns per-(query, doc) occurrence counts ==
        a numpy sliding-window oracle (overlapping starts each count),
        identical through the broadcast AND distributed verify paths."""
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        queries.append(("missing", [2**30 + 7, 2**30 + 8]))
        idx = load_index(index_dir)
        seqs = rd.read_parquet(corpus)
        got = membership_query(idx, seqs, queries, CFG,
                               with_counts=True).to_pandas()
        dist = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG,
                                candidate_mode="distributed",
                                with_counts=True).to_pandas()
        pd.testing.assert_frame_equal(got, dist)
        raw = rd.read_parquet(corpus).to_pandas()
        toks_by_doc = dict(zip(raw["doc_id"],
                               (np.asarray(t) for t in raw["tokens"])))
        want = {}
        for name, q in queries:
            q = np.asarray(q)
            for did, arr in toks_by_doc.items():
                if len(arr) < len(q):
                    continue
                wins = np.lib.stride_tricks.sliding_window_view(
                    arr, len(q))
                c = int((wins == q).all(axis=1).sum())
                if c:
                    want[(name, did)] = c
        assert {(r["query_id"], r["doc_id"]): r["n_matches"]
                for _, r in got.iterrows()} == want
        assert (got["n_matches"] >= 1).all()

    def test_expire_windows(self, index_dir, corpus, sample_tokens,
                            tmp_path):
        """Retention: expiring windows < W drops exactly those rows
        (sharded layout unlinks whole shard dirs, boundary shard
        rewrites), refreshes manifest + super store, and queries equal a
        window_range=(W, inf) scope on the un-expired index."""
        import shutil as sh

        from hierarchical_bloom_filter_index_ray.pipelines import (
            expire_windows, load_manifest)
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        cutoff = 10
        want = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG,
                                window_range=(cutoff, 1 << 60))
        for shard in (None, 4):
            d = tmp_path / f"exp{shard}"
            if shard is None:
                sh.copytree(index_dir, d)
            else:
                build_index(rd.read_parquet(corpus), CFG, str(d),
                            batch_size=512, shard_windows=shard)
            man = expire_windows(str(d), CFG, before_window=cutoff)
            assert man["expired_before_window"] == cutoff
            left = load_index(str(d)).to_pandas()
            assert int(left["window_id"].min()) == cutoff
            # 32 windows/source, 2 sources -> 22 left each
            assert man["total_windows"] == 2 * (32 - cutoff)
            if shard is not None:
                # shards 0,1 wholly expired -> dirs gone; shard 2 boundary
                src_dirs = sorted((d / "partitions").glob("source=*"))
                assert src_dirs
                names = sorted(p.name for p in src_dirs[0].glob("shard=*"))
                assert names == [f"shard={k}" for k in range(2, 8)]
            got = membership_query(load_index(str(d)),
                                   rd.read_parquet(corpus), queries, CFG,
                                   super_dir=str(d))
            assert got.equals(want)

    def test_sequences_file_pruning(self, index_dir, corpus,
                                    sample_tokens, tmp_path):
        """sequences_meta: verify reads only candidate-window files.
        Results identical to the full scan; a one-window candidate set
        keeps exactly one file; missing-everywhere queries keep none."""
        from hierarchical_bloom_filter_index_ray.pipelines import (
            prune_sequence_files, window_aligned_layout)
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        queries.append(("missing", [2**30 + 21, 2**30 + 22]))
        idx = load_index(index_dir)
        seqs = rd.read_parquet(corpus)
        meta = window_aligned_layout(corpus, CORPUS_ROWS_PER_FILE,
                                     CORPUS_ROWS_PER_FILE // N_SOURCES,
                                     CFG)
        assert len(meta) > 1
        base = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG)
        pruned = membership_query(idx, seqs, queries, CFG,
                                  sequences_meta=meta)
        assert base.num_rows > 0
        assert base.equals(pruned)
        # selectivity: candidates in window 0 only -> exactly file 0
        bits = CFG.window_bits
        cand = {"src0": (np.array([3], dtype=np.int64),  # window 0 doc
                         np.array([0, 1], dtype=np.int64),
                         np.array([0], dtype=np.int64))}
        keep = prune_sequence_files(meta, cand, CFG)
        assert keep == [meta[0]["path"]]
        last_win = (meta[-1]["window_lo"]) << bits
        cand2 = {"src0": (np.array([last_win], dtype=np.int64),
                          np.array([0, 1], dtype=np.int64),
                          np.array([0], dtype=np.int64))}
        assert prune_sequence_files(meta, cand2, CFG) == \
            [meta[-1]["path"]]
        assert prune_sequence_files(meta, {}, CFG) == []

    def test_scoped_query_with_super(self, index_dir, corpus,
                                     sample_tokens):
        queries = [("q0", sample_tokens[0])]
        idx = load_index(index_dir)
        seqs = rd.read_parquet(corpus)
        base = membership_query(idx, seqs, queries, CFG, sources=["src0"],
                                window_range=(0, 16))
        pruned = membership_query(load_index(index_dir),
                                  rd.read_parquet(corpus), queries, CFG,
                                  sources=["src0"], window_range=(0, 16),
                                  super_dir=index_dir)
        assert base.equals(pruned)


class TestSuperCombinedModes:
    def test_policy_dropped_roots_become_always_pass(self, ray_session,
                                                     tmp_path):
        """A window whose level-0 bloom was dropped by the memory policy
        must propagate as an always-pass super node — queries stay exact
        with super pruning enabled."""
        from hierarchical_bloom_filter_index_ray.sources import \
            synth_sequences
        cfg_pol = HbiConfig(seed=11, docs_per_window=64, fp=0.01, hll_p=12,
                            cms_eps=0.02, cms_delta=0.05,
                            policy_quantile=0.5, policy_conf=0.95)
        ds = synth_sequences(1024, seed=3, n_sources=2, vocab=4)
        out = tmp_path / "pol"
        build_index(ds, cfg_pol, str(out), batch_size=128)
        # policy with vocab=4 drops shallow levels incl. level 0
        import pickle
        idx_pd = load_index(str(out)).to_pandas()
        assert any(min(pickle.loads(b)) > 0 for b in idx_pd["bloom_tree"])
        rows = ds.take(3)
        queries = [(f"q{i}", [int(r["tokens"][0])])
                   for i, r in enumerate(rows)]
        plain = membership_query(load_index(str(out)), ds, queries,
                                 cfg_pol)
        pruned = membership_query(load_index(str(out)), ds, queries,
                                  cfg_pol, super_dir=str(out))
        assert plain.num_rows > 0
        assert plain.equals(pruned)

    def test_parallel_exchange_slices_match_serial_build(self,
                                                          ray_session):
        """The K hash-sliced struct-build tasks reproduce exactly the
        single-pass serial construction: same sources, same sorted
        (doc_idx, offsets, query_idx) arrays, same window unions —
        including empty slices and multi-block sources."""
        import ray
        import pyarrow as pa
        from hierarchical_bloom_filter_index_ray.pipelines.query_index \
            import _merge_slice, _split_block_parts

        rng = np.random.default_rng(3)
        window_bits = 5
        blocks = []
        for _ in range(4):
            n = 500
            blocks.append(pa.table({
                "source": pa.array(rng.choice(
                    ["s0", "s1", "s2"], n).tolist()),
                "window_id": pa.array(
                    rng.integers(0, 16, n), pa.int64()),
                "slot": pa.array(rng.integers(0, 32, n), pa.int64()),
                "query_idx": pa.array(rng.integers(0, 7, n), pa.int64()),
            }))
        blocks.append(blocks[0].slice(0, 0))  # empty block
        K = 4
        block_refs = [ray.put(b) for b in blocks]
        part_refs = [_split_block_parts.options(num_returns=K).remote(
            K, window_bits, r) for r in block_refs]
        outs = [_merge_slice.options(num_returns=2).remote(
            window_bits, [pr[k] for pr in part_refs]) for k in range(K)]
        structs: dict = {}
        wins_parts = []
        for sref, wref in outs:
            structs.update(ray.get(sref))
            w = ray.get(wref)
            if len(w):
                wins_parts.append(w)
        got_wins = np.unique(np.concatenate(wins_parts))
        # serial reference construction
        import pandas as pd
        df = pd.concat([b.to_pandas() for b in blocks])
        df["di"] = (df["window_id"].to_numpy() << window_bits) \
            | df["slot"].to_numpy()
        want_wins = np.unique(df["window_id"].to_numpy())
        assert np.array_equal(got_wins, want_wins)
        assert set(structs) == set(df["source"].unique())
        for src, g in df.groupby("source"):
            di = g["di"].to_numpy()
            qi = g["query_idx"].to_numpy().astype(np.int64)
            order = np.lexsort((qi, di))
            di, qi = di[order], qi[order]
            uniq, starts = np.unique(di, return_index=True)
            offs = np.concatenate([starts, [len(di)]]).astype(np.int64)
            gu, go, gq = structs[src]
            assert np.array_equal(gu, uniq)
            assert np.array_equal(go, offs)
            assert np.array_equal(gq, qi)

    def test_per_query_scope_distributed_mode(self, index_dir, corpus,
                                              sample_tokens):
        """Per-query (source, window) scoping must survive the lossy bloom
        gate of the distributed candidate exchange (re-applied exactly on
        verified hits)."""
        from hierarchical_bloom_filter_index_ray.pipelines import \
            membership_query_table
        import pyarrow as pa
        qt = pa.table({
            "query_id": pa.array(["q0", "q1"]),
            "qtokens": pa.array([sample_tokens[0], sample_tokens[1]],
                                pa.list_(pa.int32())),
            "source": pa.array(["src0", None]),
            "window_id": pa.array([None, 3], pa.int64()),
        })
        base = membership_query_table(load_index(index_dir),
                                      rd.read_parquet(corpus), qt, CFG,
                                      candidate_mode="broadcast")
        dist = membership_query_table(load_index(index_dir),
                                      rd.read_parquet(corpus), qt, CFG,
                                      candidate_mode="distributed")
        assert base.equals(dist)

    def test_multilevel_planner_with_super_gating(self, index_dir, corpus,
                                                  sample_tokens):
        queries = [(f"q{i}", toks) for i, toks in enumerate(sample_tokens)]
        queries.append(("missing", [2**30 + 5, 2**30 + 6]))
        base = membership_query(load_index(index_dir),
                                rd.read_parquet(corpus), queries, CFG)
        combo = membership_query(load_index(index_dir),
                                 rd.read_parquet(corpus), queries, CFG,
                                 planner="multilevel", super_dir=index_dir)
        assert base.num_rows > 0
        assert base.equals(combo)


class TestRound4FloorCuts:
    """Round-4 query-path floor work: the sharded descend merge and the
    descend-union file pruning (exchange sync removal)."""

    def test_sharded_descend_equals_single(self, index_dir, corpus,
                                           sample_tokens):
        """A batch large enough to shard across the coordinator pool
        returns bit-identical prune state to the serial descend."""
        import ray

        from hierarchical_bloom_filter_index_ray.pipelines.super_index \
            import _QUERIES_PER_SHARD, super_prune, super_prune_async
        queries = []
        for i in range(3 * _QUERIES_PER_SHARD):
            toks = sample_tokens[i % len(sample_tokens)]
            queries.append((f"q{i}", [int(t) + (i // len(sample_tokens))
                                      for t in toks]))
        queries.append(("missing", [2**30 + 1, 2**30 + 2]))
        compiled = compile_queries(queries, CFG)
        serial = super_prune(index_dir, CFG, compiled)
        sharded = ray.get(super_prune_async(index_dir, CFG, compiled))
        assert serial is not None and sharded is not None
        assert sharded.probes == serial.probes
        assert sharded.covered_sources == serial.covered_sources
        assert set(sharded.window_union) == set(serial.window_union)
        for s, w in serial.window_union.items():
            if w is None:
                assert sharded.window_union[s] is None
            else:
                np.testing.assert_array_equal(sharded.window_union[s], w)
        assert set(sharded.allowed) == set(serial.allowed)
        for s, (wins, offs, qi) in serial.allowed.items():
            w2, o2, q2 = sharded.allowed[s]
            np.testing.assert_array_equal(w2, wins)
            np.testing.assert_array_equal(o2, offs)
            # per-window query lists are sets (merge may reorder)
            for k in range(len(wins)):
                assert (set(q2[o2[k]:o2[k + 1]].tolist())
                        == set(qi[offs[k]:offs[k + 1]].tolist()))

    def test_wins_from_prune_mirrors_gate(self, index_dir, sample_tokens):
        """The descend-union pruning helper returns exactly the windows
        the _SuperGate would pass — and refuses to prune (None) when a
        relevant source is not covered by the store."""
        import ray

        from hierarchical_bloom_filter_index_ray.pipelines.query_index \
            import _wins_from_prune
        from hierarchical_bloom_filter_index_ray.pipelines.super_index \
            import super_prune
        compiled = compile_queries(
            [("q0", sample_tokens[0]),
             ("missing", [2**30 + 1, 2**30 + 2])], CFG)
        res = super_prune(index_dir, CFG, compiled)
        assert res is not None
        srcs = sorted(res.covered_sources)
        wins = _wins_from_prune(res, srcs, None)
        assert wins is not None
        expect = np.unique(np.concatenate(
            [res.window_union[s] for s in srcs
             if res.window_union.get(s) is not None
             and len(res.window_union[s])]))
        np.testing.assert_array_equal(wins, expect)
        # an uncovered relevant source forbids pruning entirely
        assert _wins_from_prune(res, srcs + ["not_in_store"], None) is None
        # scoping to covered sources restores pruning
        assert _wins_from_prune(res, srcs + ["not_in_store"],
                                srcs) is not None
        assert _wins_from_prune(None, srcs, None) is None
