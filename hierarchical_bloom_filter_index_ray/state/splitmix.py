"""Deterministic 64-bit hashing / seed derivation (vectorized).

The reference derives all sketch randomness from SplitMix64 chains
(``estimators/CountSketch.java:211-216``, ``estimators/HOPS.java:226-231``)
but seeds them from ``SecureRandom`` (``membership/BloomFilter.java:74-80``).
Here every hash parameter is derived deterministically from one config seed,
because mergeability and Ray task-retry determinism require identical hash
functions in every worker (the reference enforces this only at merge time:
``CountSketch.requireSameShape`` ``CountSketch.java:232-241``).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_C1 = U64(0x9E3779B97F4A7C15)
_C2 = U64(0xBF58476D1CE4E5B9)
_C3 = U64(0x94D049BB133111EB)
MASK64 = U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer. Accepts uint64 scalar or ndarray; wraps mod 2^64."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        z = (np.asarray(x, dtype=np.uint64) + _C1).astype(np.uint64)
        z = (z ^ (z >> U64(30))) * _C2
        z = (z ^ (z >> U64(27))) * _C3
        z = z ^ (z >> U64(31))
    if np.ndim(x) == 0:
        return U64(z)
    return z


def derive_seed(master: int, *tags: object) -> int:
    """Derive a child seed from a master seed and a tag path.

    Uses blake2b over the textual tag path folded with SplitMix64 so that
    ``derive_seed(s, "bloom", level)`` is stable across processes and runs
    (unlike Python's salted ``hash``).
    """
    h = hashlib.blake2b(digest_size=8)
    h.update(str(int(master)).encode())
    for t in tags:
        h.update(b"\x00")
        h.update(str(t).encode())
    folded = int.from_bytes(h.digest(), "little")
    return int(splitmix64(U64(folded)))


def hash_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    """Hash an array of integer keys to uint64 with a seed (vectorized)."""
    k = np.asarray(keys).astype(np.uint64, copy=False)
    return splitmix64(k ^ U64(seed & 0xFFFFFFFFFFFFFFFF))


def hash_str_u64(s: str | bytes, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a single string/bytes value.

    Scalar path for vocabulary hashing (applied per *unique* dictionary
    value, not per row — see ``functions/tokenize.py``). Mirrors the role of
    the reference's ``utilities/TokenHasher.java:13-22`` (Murmur3-128 fold)
    without depending on a specific Murmur implementation.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = hashlib.blake2b(s, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")
