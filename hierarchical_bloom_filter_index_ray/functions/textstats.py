"""Text-analysis kernels for training-data pipelines (vectorized).

Beyond the reference's scope (required by the build brief): quality
scoring, n-gram-heuristic language ID, token counting, and an
order-sensitive document fingerprint. All Arrow/numpy-vectorized; designed
to run inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.splitmix import hash_u64, splitmix64
from .tokenize import split_words

# tiny seeded stopword profiles for the n-gram/stopword language heuristic
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are".split()),
    "es": frozenset("el la de que y en un ser se no por con para".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf".split()),
    "fr": frozenset("le la de et les des en un du une que est pour".split()),
}
_STOPWORDS = frozenset().union(*_LANG_PROFILES.values())


def quality_stats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-doc quality metrics: n_chars, n_words, avg_word_len, stop_ratio,
    upper_ratio, digit_ratio, punct_ratio. Append-columns transform."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_chars = pc.utf8_length(texts)
    words = split_words(texts)
    n_words = pc.list_value_length(words)
    nw = np.maximum(n_words.to_numpy(zero_copy_only=False), 1)
    word_chars = np.diff(
        np.concatenate([[0], np.cumsum(
            pc.utf8_length(words.values).to_numpy(zero_copy_only=False))])
        [words.offsets.to_numpy(zero_copy_only=False)])
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1)

    def _ratio(pattern: str) -> np.ndarray:
        cnt = pc.count_substring_regex(texts, pattern).to_numpy(
            zero_copy_only=False)
        return cnt / nc

    # stopword ratio via dictionary trick: test only unique words
    flat = words.values.dictionary_encode()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vocab = flat.dictionary.to_pylist()
    is_stop = np.fromiter((w.lower() in _STOPWORDS for w in vocab),
                          dtype=bool, count=len(vocab))
    stop_flat = is_stop[flat.indices.to_numpy(zero_copy_only=False)] \
        if len(vocab) else np.empty(0, dtype=bool)
    stop_counts = np.diff(
        np.concatenate([[0], np.cumsum(stop_flat)])
        [words.offsets.to_numpy(zero_copy_only=False)])

    return batch.append_column(
        "n_words", pc.cast(n_words, pa.int64())
    ).append_column(
        "avg_word_len", pa.array(word_chars / nw, pa.float64())
    ).append_column(
        "stop_ratio", pa.array(stop_counts / nw, pa.float64())
    ).append_column(
        "upper_ratio", pa.array(_ratio(r"[A-Z]"), pa.float64())
    ).append_column(
        "digit_ratio", pa.array(_ratio(r"[0-9]"), pa.float64())
    ).append_column(
        "punct_ratio", pa.array(_ratio(r"[^\w\s]"), pa.float64()))


def lang_id(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Stopword-profile language heuristic -> ``lang_pred``, ``lang_score``.

    Scores each language by the fraction of words in its stopword profile;
    argmax wins, 'und' when no profile scores > 0.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = split_words(pc.utf8_lower(texts))
    flat = words.values.dictionary_encode()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vocab = flat.dictionary.to_pylist()
    offsets = words.offsets.to_numpy(zero_copy_only=False)
    n_docs = len(texts)
    nw = np.maximum(np.diff(offsets), 1)
    scores = np.zeros((len(_LANG_PROFILES), n_docs), dtype=np.float64)
    idx = flat.indices.to_numpy(zero_copy_only=False) if len(vocab) else \
        np.empty(0, dtype=np.int64)
    for li, (lang, prof) in enumerate(sorted(_LANG_PROFILES.items())):
        in_prof = np.fromiter((w in prof for w in vocab), dtype=bool,
                              count=len(vocab))
        hits = in_prof[idx] if len(vocab) else np.empty(0, dtype=bool)
        counts = np.diff(np.concatenate([[0], np.cumsum(hits)])[offsets])
        scores[li] = counts / nw
    langs = sorted(_LANG_PROFILES)
    best = scores.argmax(axis=0)
    best_score = scores.max(axis=0)
    pred = np.array(langs, dtype=object)[best]
    pred[best_score <= 0.0] = "und"
    return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string())
                               ).append_column("lang_score",
                                               pa.array(best_score, pa.float64()))


# GPT-2-style pre-tokenization shape (contractions | space-prefixed letter /
# digit / punctuation runs | whitespace runs), restricted to RE2 syntax (no
# lookahead) so Arrow's count_substring_regex and DuckDB's
# regexp_extract_all segment text identically.
SUBWORD_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                   r"| ?[^ \tA-Za-z0-9]+|[ \t]+")


def subword_counts(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """BPE-ish subword token count per doc: one vectorized RE2 kernel
    (``pc.count_substring_regex``), no per-row Python. A proxy for
    model-tokenizer cost accounting next to the whitespace ``n_tok``."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = pc.count_substring_regex(texts, SUBWORD_PATTERN).cast(pa.int64())
    return batch.append_column("n_subwords", n)


def doc_fingerprint(flat_tokens: np.ndarray, offsets: np.ndarray,
                    seed: int) -> np.ndarray:
    """Order-sensitive 64-bit content fingerprint per doc: sum (mod 2^64) of
    ``splitmix(token_hash ^ splitmix(position))`` over the doc. Rolling-hash
    analogue of the reference's window concatenation key
    (``utilities/StringKeyMapper.java:116-129``), vectorized with reduceat."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_tokens) == 0:
        return out
    lengths = np.diff(offsets)
    pos = np.arange(len(flat_tokens), dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), lengths)
    h = splitmix64(hash_u64(flat_tokens.astype(np.uint64, copy=False), seed)
                   ^ splitmix64(pos))
    nonempty = lengths > 0
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(h, offsets[:-1][nonempty])
    out[nonempty] = sums
    return out
