from .build_index import build_index, load_index, load_manifest
from .query_index import BloomProbe, ExactVerifier, compile_queries, \
    membership_query

__all__ = [
    "build_index", "load_index", "load_manifest", "membership_query",
    "compile_queries", "BloomProbe", "ExactVerifier",
]
