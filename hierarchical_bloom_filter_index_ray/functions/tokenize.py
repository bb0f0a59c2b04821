"""Vectorized text -> token-id kernels (Arrow-native, zero per-row Python).

The engine's primary input is already tokenized (``BASELINE.json.input_hint``:
``tokens: list<int32>``). These kernels exist to (a) turn the driver's
``documents`` table into that shape deterministically and (b) mirror the
reference's reader/tokenizer modes (``utilities/DatasetReader.java:97-167``
chars, ``utilities/SegmentReader.java:14-64`` segments,
``SamplingSketchExperiment.java:559-643`` words + n-grams) where "symbol ->
long token" hashing is ``utilities/TokenHasher.java:13-22`` /
``utilities/StringKeyMapper.java:116-129``.

Whitespace semantics: identical to Python ``str.split()`` (split on runs of
whitespace, no empty tokens) == DuckDB
``CASE WHEN trim(text)='' THEN [] ELSE regexp_split_to_array(trim(text),'\\s+') END``
for ASCII text — asserted in tests against both.

Hashing strategy: per-batch ``dictionary_encode`` the flat word array (C++,
vectorized), hash only the *unique* dictionary values (small), then gather —
so hashing cost is O(vocab-per-batch), not O(tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.splitmix import U64, hash_str_u64, hash_u64, splitmix64

TOKEN_MASK = (1 << 31) - 1  # non-negative int32 token ids


def split_words(texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Split on whitespace runs, dropping empty tokens (== str.split())."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    raw = pc.utf8_split_whitespace(texts)
    flat = raw.flatten()
    keep = pc.not_equal(flat, "")
    parents = pc.list_parent_indices(raw).to_numpy(zero_copy_only=False)
    kept_parents = parents[keep.to_numpy(zero_copy_only=False)]
    counts = np.bincount(kept_parents, minlength=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), flat.filter(keep))


def hash_words(words_flat: pa.Array, seed: int) -> np.ndarray:
    """Deterministic int32 token ids for a flat word array.

    Dictionary-encodes, hashes each unique word with blake2 (scalar loop over
    the *dictionary* only), gathers via indices.
    """
    if len(words_flat) == 0:
        return np.empty(0, dtype=np.int32)
    de = words_flat.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    vocab = de.dictionary.to_pylist()
    vocab_tokens = np.fromiter(
        ((hash_str_u64(w, seed) & TOKEN_MASK) for w in vocab),
        dtype=np.int32, count=len(vocab))
    indices = de.indices.to_numpy(zero_copy_only=False)
    return vocab_tokens[indices]


def tokenize_documents(batch: pa.Table, *, text_col: str = "text",
                       doc_id_col: str = "doc_id", source_col: str = "source",
                       seed: int = 42) -> pa.Table:
    """documents-shaped batch -> north-rule sequences shape
    ``(doc_id, tokens: list<int32>, n_tok: int32, source)``."""
    words = split_words(batch[text_col])
    flat_tokens = hash_words(words.values, seed)
    offsets = words.offsets
    tokens = pa.ListArray.from_arrays(offsets, pa.array(flat_tokens, pa.int32()))
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    return pa.table({
        "doc_id": batch[doc_id_col],
        "tokens": tokens,
        "n_tok": n_tok,
        "source": batch[source_col],
    })


def flat_tokens_and_offsets(tokens: pa.ListArray | pa.ChunkedArray
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy flatten of a ``list<int32>`` column (SURVEY.md §7.4 item 7:
    use the Arrow child buffer + offsets, never per-row Python lists)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    # .flatten() respects the array's offset/slices; values would not.
    flat = tokens.flatten().to_numpy(zero_copy_only=True)
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    return flat, offsets


def ngram_keys(flat_tokens: np.ndarray, offsets: np.ndarray, n: int,
               seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sliding n-gram keys (stride 1), never crossing doc boundaries.

    Mirrors the reference's ring-buffer n-gram window
    (``Experiment.java:42-51``, ``utilities/RingBuffer.java:40-48``) +
    ``Pattern`` encoding (``search/Pattern.java:22-97``): each position i
    yields a 64-bit key folding tokens[i..i+n-1] through a seeded SplitMix64
    chain. Returns (flat_keys: uint64, new_offsets) where doc j contributes
    ``max(0, len_j - n + 1)`` keys.

    For n == 1 the key is ``hash_u64(token, seed)`` — the same chain with a
    single fold, so unigram membership uses the same key space.
    """
    lengths = np.diff(offsets)
    out_lengths = np.maximum(lengths - (n - 1), 0)
    out_offsets = np.zeros(len(offsets), dtype=np.int64)
    np.cumsum(out_lengths, out=out_offsets[1:])
    total = int(out_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), out_offsets
    h = hash_u64(flat_tokens.astype(np.uint64, copy=False), seed)
    if n == 1:
        return h, out_offsets
    # valid start positions: those whose n-gram stays inside the doc
    pos_in_doc = np.arange(len(flat_tokens)) - np.repeat(offsets[:-1], lengths)
    valid = pos_in_doc <= np.repeat(lengths, lengths) - n
    acc = h.copy()
    for j in range(1, n):
        shifted = np.empty_like(h)
        shifted[:-j] = h[j:]
        shifted[-j:] = 0
        acc = splitmix64(acc ^ shifted)
    return acc[valid], out_offsets
