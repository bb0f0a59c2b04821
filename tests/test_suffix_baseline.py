"""Exact baseline index family: suffix-array correctness properties and
the three-way differential the reference runs between HBI and its exact
baselines (``HBIDatasetBenchmark.compared``, ``HBIDatasetBenchmark.java:
106-154``): bloom+verify == suffix-array index == index-free linear scan
on identical queries, normalized (sort) per query."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from hierarchical_bloom_filter_index_ray import HbiConfig
from hierarchical_bloom_filter_index_ray.functions import (
    flat_tokens_and_offsets, tokenize_documents)
from hierarchical_bloom_filter_index_ray.pipelines import (
    build_index, build_suffix_index, linear_scan_membership, load_index,
    load_suffix_index, membership_query, suffix_membership,
    suffix_membership_ds)
from hierarchical_bloom_filter_index_ray.pipelines.suffix_baseline import (
    sa_range, suffix_array)
from hierarchical_bloom_filter_index_ray.sources import (
    documents_as_sequences, synth_sequences)

CFG = HbiConfig(seed=42, docs_per_window=64, fp=0.01, ngram=1,
                expected_tokens_per_doc=64, expected_distinct_per_doc=48,
                hll_p=12, cms_eps=0.02, cms_delta=0.05)


class TestSuffixArray:
    def _brute(self, a: np.ndarray) -> np.ndarray:
        sufs = [tuple(a[i:].tolist()) for i in range(len(a))]
        return np.array(sorted(range(len(a)), key=lambda i: sufs[i]),
                        dtype=np.int64)

    @pytest.mark.parametrize("n,hi,seed", [
        (0, 4, 0), (1, 4, 1), (2, 2, 2), (7, 2, 3), (64, 3, 4),
        (200, 5, 5), (257, 1, 6),   # hi=1 => all-equal tokens (worst ties)
        (300, 1000, 7),
    ])
    def test_matches_bruteforce(self, n, hi, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, hi, size=n).astype(np.int32)
        assert np.array_equal(suffix_array(a), self._brute(a))

    def test_range_counts_equal_sliding_window(self):
        """sa_range hit count == naive sliding-window occurrence count,
        including overlapping occurrences, for random patterns."""
        rng = np.random.default_rng(11)
        a = rng.integers(0, 4, size=400).astype(np.int32)
        sa = suffix_array(a)
        for m in (1, 2, 3, 5):
            for _ in range(20):
                i = int(rng.integers(0, len(a) - m))
                pat = a[i:i + m]
                lo, hi = sa_range(a, sa, pat)
                sw = np.lib.stride_tricks.sliding_window_view(a, m)
                want = int((sw == pat).all(axis=1).sum())
                assert hi - lo == want
        # absent pattern
        lo, hi = sa_range(a, sa, np.array([9, 9, 9], np.int32))
        assert hi == lo


class TestDifferential:
    """Build all three answers over the sf0.001 corpus and over a synth
    corpus; the normalized match lists must be identical."""

    @pytest.fixture(scope="class")
    def built(self, ray_session, tmp_path_factory):
        out = tmp_path_factory.mktemp("sa_idx")
        ds = documents_as_sequences("/root/testdata/sf0.001",
                                    seed=CFG.seed)
        build_index(ds, CFG, str(out / "bloom"), batch_size=128,
                    concurrency=2)
        man = build_suffix_index(
            documents_as_sequences("/root/testdata/sf0.001",
                                   seed=CFG.seed),
            CFG, str(out / "sa"))
        return out, man

    @pytest.fixture(scope="class")
    def seq_table(self, ray_session):
        tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
        return tokenize_documents(tbl, seed=CFG.seed)

    def _queries(self, seq_table):
        flat, offsets = flat_tokens_and_offsets(seq_table["tokens"])
        t0 = int(flat[0])
        tri = [int(x) for x in flat[offsets[3]:offsets[3] + 3]]
        penta = [int(x) for x in flat[offsets[7]:offsets[7] + 5]]
        return [("q_uni", [t0]), ("q_tri", tri), ("q_penta", penta),
                ("q_missing", [2 ** 30 + 7])]

    def test_manifest(self, built, seq_table):
        _, man = built
        assert man["kind"] == "suffix_array"
        assert man["total_docs"] == seq_table.num_rows
        assert man["total_tokens"] == int(
            np.sum(seq_table["n_tok"].to_numpy()))
        assert man["params_hash"] == CFG.params_hash()

    def test_three_way_equal(self, built, seq_table, ray_session):
        out, _ = built
        queries = self._queries(seq_table)
        seqs = documents_as_sequences("/root/testdata/sf0.001",
                                      seed=CFG.seed)
        bloom = membership_query(load_index(str(out / "bloom")), seqs,
                                 queries, CFG,
                                 with_counts=True).to_pandas()
        sa = suffix_membership(load_suffix_index(str(out / "sa")),
                               queries, with_counts=True).to_pandas()
        lin = linear_scan_membership(seqs, queries,
                                     with_counts=True).to_pandas()
        for name, df in (("sa", sa), ("lin", lin)):
            assert df.reset_index(drop=True).equals(
                bloom.reset_index(drop=True)), name
        assert (bloom["query_id"] == "q_missing").sum() == 0
        assert len(bloom) > 0

    def test_ds_path_matches_collected(self, built, seq_table,
                                       ray_session):
        out, _ = built
        queries = self._queries(seq_table)
        idx = load_suffix_index(str(out / "sa"))
        want = suffix_membership(idx, queries, with_counts=True)
        got = (suffix_membership_ds(idx, queries, with_counts=True)
               .to_pandas().sort_values(["query_id", "doc_id"])
               .reset_index(drop=True))
        assert got.equals(want.to_pandas().reset_index(drop=True))

    def test_source_pruned_load(self, built, seq_table, ray_session):
        out, _ = built
        queries = self._queries(seq_table)
        one = load_suffix_index(str(out / "sa"), sources=["src0"])
        res = suffix_membership(one, queries).to_pandas()
        full = suffix_membership(load_suffix_index(str(out / "sa")),
                                 queries).to_pandas()
        # pruned result == full result restricted to src0's doc ids
        src0_ids = set()
        for row in one.select_columns(["doc_ids"]).take_all():
            src0_ids.update(row["doc_ids"])
        want = full[full["doc_id"].isin(src0_ids)].reset_index(drop=True)
        assert res.reset_index(drop=True).equals(want)
        assert len(res) > 0

    def test_boundary_and_overlap_semantics(self, ray_session,
                                            tmp_path):
        """A pattern spanning two docs must NOT match; overlapping
        occurrences inside one doc each count (HBI.report per-position
        semantics)."""
        import pandas as pd
        import ray.data as rd

        docs = pd.DataFrame({
            "doc_id": ["s#0", "s#1", "s#2"],
            "tokens": [np.array([1, 1, 1, 2], np.int32),
                       np.array([2, 3], np.int32),
                       np.array([3, 4], np.int32)],
            "n_tok": np.array([4, 2, 2], np.int32),
            "source": ["s", "s", "s"],
        })
        ds = rd.from_pandas(docs)
        cfg = HbiConfig(seed=1, docs_per_window=4, fp=0.01, ngram=1,
                        hll_p=12, cms_eps=0.05, cms_delta=0.1)
        build_suffix_index(ds, cfg, str(tmp_path / "sa"))
        idx = load_suffix_index(str(tmp_path / "sa"))
        res = suffix_membership(
            idx, [("ones", [1, 1]), ("cross", [2, 3]), ("tail", [3, 4])],
            with_counts=True).to_pandas()
        got = {(r.query_id, r.doc_id): r.n_matches
               for r in res.itertuples()}
        assert got == {("ones", "s#0"): 2,      # overlapping starts
                       ("cross", "s#1"): 1,      # inside doc 1 only
                       ("tail", "s#2"): 1}

    def test_synth_corpus_differential(self, ray_session, tmp_path):
        """Same triangle on the synthetic Zipf corpus (different doc-id
        shape, multiple windows per source)."""
        cfg = HbiConfig(seed=7, docs_per_window=32, fp=0.01, ngram=1,
                        expected_tokens_per_doc=48,
                        expected_distinct_per_doc=32, hll_p=12,
                        cms_eps=0.02, cms_delta=0.05)
        ds = synth_sequences(512, seed=7, n_sources=3)
        build_index(ds, cfg, str(tmp_path / "bloom"), batch_size=100,
                    concurrency=2)
        build_suffix_index(synth_sequences(512, seed=7, n_sources=3),
                           cfg, str(tmp_path / "sa"))
        seqs = synth_sequences(512, seed=7, n_sources=3)
        first = seqs.take(5)
        queries = [
            ("u", [int(first[0]["tokens"][0])]),
            ("bi", [int(t) for t in first[2]["tokens"][:2]]),
            ("quad", [int(t) for t in first[4]["tokens"][:4]]),
            ("none", [2 ** 29 + 3]),
        ]
        bloom = membership_query(
            load_index(str(tmp_path / "bloom")),
            synth_sequences(512, seed=7, n_sources=3), queries, cfg,
            with_counts=True).to_pandas()
        sa = suffix_membership(load_suffix_index(str(tmp_path / "sa")),
                               queries, with_counts=True).to_pandas()
        lin = linear_scan_membership(
            synth_sequences(512, seed=7, n_sources=3), queries,
            with_counts=True).to_pandas()
        assert sa.reset_index(drop=True).equals(
            bloom.reset_index(drop=True))
        assert lin.reset_index(drop=True).equals(
            bloom.reset_index(drop=True))
        assert len(bloom) > 0
