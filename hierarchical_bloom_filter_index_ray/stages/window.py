"""Window / interval assignment (deterministic, scan-free).

SURVEY.md §7 hard part 3: the reference windows by global token position of
one sequential stream (``PMIndex/HBI.java:229``: ``window_id = pos >> log2 W``,
tree rollover at ``HBI.java:230-266``). A distributed batch engine needs an
assignment every task can compute independently, so windows are
**doc-aligned**: per source,

    window_id = doc_index >> log2(docs_per_window)
    slot      = doc_index & (docs_per_window - 1)      # doc slot in window

and the in-window hierarchy (``tree/ImplicitTree.java:15-48`` one filter per
level, ``TreeLayout.java:4-52``) partitions the window's doc slots: at level
L, ``interval_id = slot >> (window_bits - L)`` — the same bit-trick as the
reference's ``utilities/Utils.java:6-22`` with positions measured in docs.
Leaf level = single doc; leaf verification re-reads that doc's token row
(the Parquet data is the reference's ``StreamBuffer`` ground truth).

``doc_index`` extraction: an integer ``doc_id`` column is used directly; a
string ``doc_id`` uses its trailing decimal digits (the fixture format
``src{k}-doc{n}``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import HbiConfig


def doc_index(batch: pa.Table, col: str = "doc_id") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        return arr.to_numpy(zero_copy_only=False).astype(np.int64)
    ext = pc.extract_regex(arr, r"(?P<idx>\d+)$")
    idx = pc.cast(pc.struct_field(ext, "idx"), pa.int64())
    if idx.null_count:
        # ids without a trailing decimal index (user-supplied keys, file
        # basenames from the raw-file readers): fall back to a stable
        # 40-bit blake2 hash of the id string (40 bits keeps the build's
        # (src_code << 40 | window_id) group packing valid —
        # stages/sketch_build.py:116). Deterministic across runs and
        # processes, so build / probe / verify always agree on the
        # (window, slot) of a doc; a hash collision only co-locates docs
        # in a slot, adding candidates that exact verification discards.
        # Ordinal-suffixed ids pack windows densely and are preferred at
        # scale.
        from ..state.splitmix import hash_str_u64
        null_mask = idx.is_null().to_numpy(zero_copy_only=False)
        out = idx.fill_null(0).to_numpy(zero_copy_only=False) \
                 .astype(np.int64, copy=True)
        missing = arr.filter(pa.array(null_mask)).to_pylist()
        out[null_mask] = np.fromiter(
            ((hash_str_u64(s, 0xD0C1D) & ((1 << 40) - 1)) for s in missing),
            dtype=np.int64, count=len(missing))
        return out
    return idx.to_numpy(zero_copy_only=False)


def add_window_columns(batch: pa.Table, cfg: HbiConfig) -> pa.Table:
    """Append ``window_id: int64`` and ``slot: int32``."""
    di = doc_index(batch)
    window_id = di >> cfg.window_bits
    slot = (di & (cfg.docs_per_window - 1)).astype(np.int32)
    return batch.append_column("window_id", pa.array(window_id, pa.int64())) \
                .append_column("slot", pa.array(slot, pa.int32()))


def interval_ids(slots: np.ndarray, level: int, cfg: HbiConfig) -> np.ndarray:
    """Level-L interval of each doc slot (``ImplicitTree.java:63-66``)."""
    return (slots.astype(np.int64) >> (cfg.window_bits - level))
