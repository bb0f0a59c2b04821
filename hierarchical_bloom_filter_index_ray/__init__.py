"""hierarchical_bloom_filter_index_ray — a Ray-Data-native distributed sketch
and approximate-aggregation library.

Built from scratch with the query capabilities of the reference repo
DimPap99/Hierarchical-Bloom-filter-Index (single-JVM streaming hierarchical
Bloom pattern index, see SURVEY.md), re-expressed as idiomatic Ray Data:

- input: Parquet tables of pre-tokenized sequences
  ``(doc_id, tokens: list<int32>, n_tok: int32, source: string)``
- sketch kernels (``state/``): pure-numpy mergeable sketches — Bloom,
  count-min / count-sketch, HyperLogLog, KLL, t-digest, HOPS, bottom-k/KMV,
  MinHash, SimHash — all deterministic under a single config seed.
- stages (``stages/``): vectorized ``map_batches`` transforms (window
  assignment, partial-sketch build) and the ``groupby(source, window_id)``
  merge shuffle.
- pipelines (``pipelines/``): hierarchical bloom index build + membership
  query, dedup (exact / MinHash-LSH / SimHash), similarity search, text
  analysis.

Nothing in this package calls ``ray.init``; callers own the Ray session.
"""

from .config import HbiConfig

__all__ = ["HbiConfig"]
__version__ = "0.1.0"
