"""Property-based merge laws (hypothesis): for every bit-deterministic
sketch, ANY partition of ANY stream merged in ANY order yields identical
serialized bytes to the single-pass build (north_rule: "merge order
provably irrelevant")."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hierarchical_bloom_filter_index_ray.state import (
    HOPS, BloomFilter, BottomK, CountMinSketch, HyperLogLog,
    IntCountSketch, NgramModel)

SEED = 99


def _factories():
    return {
        "bloom": lambda: BloomFilter(200, 0.05, SEED),
        "cms": lambda: CountMinSketch(1 << 10, 3, SEED),
        "hll": lambda: HyperLogLog(11, SEED),
        "hops": lambda: HOPS(64, SEED),
        "bottomk": lambda: BottomK(32, SEED),
        # saturating variant: streams here never reach int32 bounds, so
        # the bit-identity law applies unchanged
        "intcs": lambda: IntCountSketch(1 << 9, 3, SEED),
    }


streams = st.lists(st.integers(0, 2**48), min_size=0, max_size=200)
cuts = st.lists(st.integers(0, 200), min_size=0, max_size=4)
perms = st.randoms(use_true_random=False)


@settings(max_examples=25, deadline=None)
@given(stream=streams, cut_points=cuts, rnd=perms)
def test_partition_and_order_invariance(stream, cut_points, rnd):
    keys = np.array(stream, dtype=np.uint64)
    bounds = sorted({min(c, len(keys)) for c in cut_points} | {0, len(keys)})
    chunks = [keys[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    order = list(range(len(chunks)))
    rnd.shuffle(order)
    for name, make in _factories().items():
        ref = make()
        ref.update(keys)
        acc = make()
        for i in order:
            part = make()
            part.update(chunks[i])
            acc.merge(part)
        assert acc.to_bytes() == ref.to_bytes(), name


@settings(max_examples=25, deadline=None)
@given(stream=streams)
def test_update_in_pieces_equals_single_update(stream):
    """Incremental updates == one batched update (actor accumulation)."""
    keys = np.array(stream, dtype=np.uint64)
    for name, make in _factories().items():
        ref = make()
        ref.update(keys)
        inc = make()
        for i in range(0, len(keys), 7):
            inc.update(keys[i:i + 7])
        assert inc.to_bytes() == ref.to_bytes(), name


@settings(max_examples=25, deadline=None)
@given(stream=st.lists(st.integers(0, 15), min_size=0, max_size=300),
       cut_points=cuts, rnd=perms)
def test_ngram_model_partition_invariance(stream, cut_points, rnd):
    """Doc-partitioned NgramModel builds merge to the single-stream model
    when cuts fall on doc boundaries (bigram counts add; the doc list
    structure is what partitions carry)."""
    keys = np.array(stream, dtype=np.uint64)
    bounds = sorted({min(c, len(keys)) for c in cut_points} | {0, len(keys)})
    # treat each chunk as one DOC in both builds (bigrams never cross)
    chunks = [keys[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    syms = np.arange(16, dtype=np.uint64)
    ref = NgramModel(syms)
    flat = np.concatenate(chunks) if chunks else np.empty(0, np.uint64)
    offs = np.array([0] + list(np.cumsum([len(c) for c in chunks])),
                    dtype=np.int64)
    ref.update(flat, offs)
    order = list(range(len(chunks)))
    rnd.shuffle(order)
    acc = NgramModel(syms)
    for i in order:
        part = NgramModel(syms)
        part.update(chunks[i], np.array([0, len(chunks[i])]))
        acc.merge(part)
    assert np.array_equal(acc.uni, ref.uni)
    assert np.array_equal(acc.bi, ref.bi)
    assert acc.total == ref.total
