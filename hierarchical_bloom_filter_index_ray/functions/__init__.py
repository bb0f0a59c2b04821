"""Vectorized per-batch kernels (Arrow in / Arrow out, no Ray dependency)."""

from .textstats import (SUBWORD_PATTERN, doc_fingerprint, lang_id,
                        quality_stats, subword_counts)
from .tokenize import (flat_tokens_and_offsets, hash_words, ngram_keys,
                       split_words, tokenize_documents)

__all__ = [
    "split_words", "hash_words", "tokenize_documents",
    "flat_tokens_and_offsets", "ngram_keys", "quality_stats", "lang_id",
    "doc_fingerprint", "subword_counts", "SUBWORD_PATTERN",
]
