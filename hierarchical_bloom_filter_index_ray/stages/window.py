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

``doc_index`` extraction (all values land in ``[0, 2^40)`` so the build's
``(src_code << 40 | window_id)`` group packing — ``stages/sketch_build.py``
— stays valid for ANY id shape; build / probe / verify share this one
function, so every stage agrees on a doc's (window, slot)):

1. integer ``doc_id``: used directly; out-of-range values (< 0 or >= 2^40)
   are splitmix-hashed into the 40-bit space.
2. segment ids ``{base}#s{k}`` (``sources/files.py`` segmenter): the parent
   doc's 28-bit index in the high bits, ``min(k, 4095)`` in the low 12 —
   a doc's segments stay index-contiguous (dense windows per doc) and
   segments of DIFFERENT docs never collapse onto one slot.
3. line ids ``{file}:{lineno}`` (line-mode text reader): a 20-bit hash of
   the file part in the high bits, ``min(lineno, 2^20-1)`` low — a file's
   lines pack densely; distinct files land in distinct window ranges.
4. plain trailing decimal ordinal (the fixture format ``src{k}-doc{n}``):
   used directly when <= 12 digits and < 2^40.
5. anything else (user keys, content-hash ids, huge digit runs inside hex
   hashes): stable 40-bit blake2 hash of the full id. A hash collision only
   co-locates docs in a slot, adding candidates that exact verification
   discards. Ordinal-suffixed ids pack windows densely and are preferred
   at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import HbiConfig

_MASK40 = (1 << 40) - 1
_SEG_RE = r"^(?P<base>.*)#s(?P<k>\d{1,12})$"
_LINE_RE = r"^(?P<stem>.+):(?P<line>\d{1,12})$"


def _hash_codes(strings: pa.Array, bits: int, salt: int) -> np.ndarray:
    """Stable ``bits``-bit blake2 hash per string; hashed once per UNIQUE
    value (dictionary-encoded), so repeated ids/stems cost O(vocab)."""
    from ..state.splitmix import hash_str_u64
    de = strings.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    vocab = de.dictionary.to_pylist()
    mask = (1 << bits) - 1
    hv = np.fromiter((hash_str_u64(s, salt) & mask for s in vocab),
                     dtype=np.int64, count=len(vocab))
    return hv[de.indices.to_numpy(zero_copy_only=False)]


def _trailing_ordinal(strings: pa.Array, cap: int) -> tuple[np.ndarray,
                                                            np.ndarray]:
    """``(values, valid)``: trailing decimal ordinal per id; valid only when
    present, <= 12 digits (content-hash hex tails routinely end in longer
    decimal runs) and ``< cap``."""
    ext = pc.extract_regex(strings, r"(?P<idx>\d+)$")
    digits = pc.struct_field(ext, "idx")
    valid = pc.fill_null(
        pc.and_(digits.is_valid(), pc.less_equal(pc.utf8_length(digits), 12)),
        False).to_numpy(zero_copy_only=False)
    safe = pc.if_else(pa.array(valid), digits, "0")
    vals = pc.cast(safe, pa.int64()).to_numpy(zero_copy_only=False)
    valid = valid & (vals < cap)
    return vals, valid


def _string_index(strings: pa.Array, bits: int) -> np.ndarray:
    """Line-form / plain-ordinal / hash-fallback index in ``[0, 2^bits)``."""
    n = len(strings)
    out = np.empty(n, dtype=np.int64)
    done = np.zeros(n, dtype=bool)
    lm = np.zeros(n, dtype=bool)
    if pc.any(pc.match_substring(strings, ":")).as_py():
        ext = pc.extract_regex(strings, _LINE_RE)
        stem = pc.struct_field(ext, "stem")
        lm = stem.is_valid().to_numpy(zero_copy_only=False)
    if lm.any():
        low = bits // 2
        sel = pa.array(lm)
        h = _hash_codes(stem.filter(sel), bits - low, 0xF11E)
        ln = pc.cast(pc.struct_field(ext, "line").filter(sel),
                     pa.int64()).to_numpy(zero_copy_only=False)
        out[lm] = (h << low) | np.minimum(ln, (1 << low) - 1)
        done |= lm
    rem = ~done
    if rem.any():
        sub = strings.filter(pa.array(rem))
        vals, valid = _trailing_ordinal(sub, 1 << bits)
        idxs = np.flatnonzero(rem)
        out[idxs[valid]] = vals[valid]
        done[idxs[valid]] = True
        still = idxs[~valid]
        if len(still):
            out[still] = _hash_codes(sub.filter(pa.array(~valid)),
                                     bits, 0xD0C1D)
    return out


def doc_index(batch: pa.Table, col: str = "doc_id") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        out = arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=True)
        oob = (out < 0) | (out > _MASK40)
        if oob.any():
            from ..state.splitmix import splitmix64
            out[oob] = (splitmix64(out[oob].astype(np.uint64))
                        .astype(np.int64) & _MASK40)
        return out
    n = len(arr)
    out = np.empty(n, dtype=np.int64)
    # fast path: the segment ('#s') and line (':') forms are gated behind
    # two cheap substring scans, so corpora with plain ordinal ids (the
    # common shape in the hot verify path) pay ONE regex pass, not three
    has_seg = pc.any(pc.match_substring(arr, "#s")).as_py()
    sm = np.zeros(n, dtype=bool)
    if has_seg:
        seg = pc.extract_regex(arr, _SEG_RE)
        base = pc.struct_field(seg, "base")
        sm = base.is_valid().to_numpy(zero_copy_only=False)
        if sm.any():
            sel = pa.array(sm)
            bi = _string_index(base.filter(sel), 28)
            k = pc.cast(pc.struct_field(seg, "k").filter(sel),
                        pa.int64()).to_numpy(zero_copy_only=False)
            out[sm] = (bi << 12) | np.minimum(k, 4095)
    rem = ~sm
    if rem.any():
        out[rem] = _string_index(arr if not sm.any()
                                 else arr.filter(pa.array(rem)), 40)
    return out


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
