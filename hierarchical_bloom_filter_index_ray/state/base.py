"""Sketch protocol + binary serialization helpers.

Mirrors the reference's plugin seams (``PMIndex/HbiConfiguration.java:98-207``:
``estimatorSupplier`` / ``membershipSupplier`` suppliers) as a registry of
mergeable sketch classes. Every sketch:

- is constructed from explicit params + a deterministic seed,
- updates from numpy arrays (vectorized — no per-row Python in hot paths),
- merges associatively/commutatively with an identically-parameterized peer
  (shape/seed checked, like ``CountSketch.requireSameShape``
  ``estimators/CountSketch.java:232-241``),
- round-trips through ``to_bytes`` / ``from_bytes``.
"""

from __future__ import annotations

import io
import json
import zlib

import numpy as np

_REGISTRY: dict[str, type] = {}


def register_sketch(cls):
    """Class decorator: register a sketch under ``cls.KIND``."""
    _REGISTRY[cls.KIND] = cls
    return cls


def sketch_class(kind: str) -> type:
    return _REGISTRY[kind]


def sketch_from_bytes(data: bytes):
    """Deserialize any registered sketch (kind is embedded in the header)."""
    kind, meta, arrays = read_blob(data)
    return _REGISTRY[kind]._from_parts(meta, arrays)


def write_blob(kind: str, meta: dict, arrays: dict[str, np.ndarray]) -> bytes:
    """Compact self-describing binary: json header + little-endian arrays.

    Array payloads > 4 KiB are zlib-compressed (level 1, deterministic) when
    that wins — partial sketches are mostly zeros, so this shrinks the
    groupby shuffle of serialized partials by 1-2 orders of magnitude.
    """
    header = {
        "kind": kind,
        "meta": meta,
        "arrays": {
            name: {"dtype": str(a.dtype), "shape": list(a.shape)}
            for name, a in arrays.items()
        },
    }
    raw = b"".join(np.ascontiguousarray(a).tobytes() for a in arrays.values())
    if len(raw) > 4096:
        z = zlib.compress(raw, 1)
        if len(z) < len(raw):
            header["z"] = 1
            raw = z
    hb = json.dumps(header, separators=(",", ":")).encode()
    buf = io.BytesIO()
    buf.write(len(hb).to_bytes(4, "little"))
    buf.write(hb)
    buf.write(raw)
    return buf.getvalue()


def read_blob(data: bytes):
    n = int.from_bytes(data[:4], "little")
    header = json.loads(data[4 : 4 + n])
    payload = data[4 + n:]
    if header.get("z"):
        payload = zlib.decompress(payload)
    off = 0
    arrays = {}
    for name, spec in header["arrays"].items():
        dt = np.dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        size = dt.itemsize * int(np.prod(shape)) if shape else dt.itemsize
        count = int(np.prod(shape)) if shape else 1
        arrays[name] = np.frombuffer(payload, dtype=dt, count=count,
                                     offset=off).reshape(shape)
        off += size
    return header["kind"], header["meta"], arrays


def check_mergeable(a, b, fields: tuple[str, ...]):
    """Raise if two sketches differ in any identity param (cf.
    ``CountSketch.java:232-241``, ``HOPS.java:172-179`` seed checks)."""
    if type(a) is not type(b):
        raise ValueError(f"cannot merge {type(a).__name__} with {type(b).__name__}")
    for f in fields:
        if getattr(a, f) != getattr(b, f):
            raise ValueError(
                f"merge param mismatch on {f}: {getattr(a, f)!r} != {getattr(b, f)!r}"
            )
