"""Ray Data stages: window assignment, partial-sketch build (actor pool),
and the groupby merge reduce."""

from .merge import INDEX_BLOB_COLS, merge_partials_group, merge_payloads
from .resources import default_concurrency
from .sketch_build import PARTIAL_SCHEMA, PartialSketchBuilder
from .window import add_window_columns, doc_index, interval_ids

__all__ = [
    "add_window_columns", "doc_index", "interval_ids",
    "PartialSketchBuilder", "PARTIAL_SCHEMA", "merge_partials_group",
    "merge_payloads", "INDEX_BLOB_COLS", "default_concurrency",
]
