"""Sources: the north-rule sequences table, tokenized documents, and the
deterministic synthetic corpus generator.

Reference analogues: ``utilities/DatasetReader.java`` / ``SegmentReader.java``
(readers — here ``ray.data.read_parquet`` of the pre-tokenized table) and
``datagenerators/Generator.java:27-73`` (seeded Zipf/uniform synthetic
streams — here a per-row-id counter-based generator, deterministic under any
batching/parallelism, mirroring FIXTURES.md F1).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.tokenize import tokenize_documents
from ..state.splitmix import U64, derive_seed, splitmix64

SEQ_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def read_sequences(path: str, **kwargs) -> "rd.Dataset":
    """Read an F1-shaped Parquet table (pruned to the 4 north-rule cols)."""
    return rd.read_parquet(path, columns=["doc_id", "tokens", "n_tok",
                                          "source"], **kwargs)


def documents_as_sequences(sf_dir: str, *, seed: int = 42, **kwargs) -> "rd.Dataset":
    """Driver ``documents`` table -> sequences shape via whitespace
    tokenization + vocab hashing (FIXTURES.md F5)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"], **kwargs)
    return ds.map_batches(tokenize_documents, batch_format="pyarrow",
                          fn_kwargs={"seed": seed})


# --------------------------------------------------------------------------
# synthetic corpus (counter-based; identical output for any block layout)
# --------------------------------------------------------------------------

_SOURCE_EXPONENTS = (1.0, 1.3, 1.5, 0.0)  # 0.0 = uniform; cf. reference
# data families wzipf_21_e{1,13,15} + uniform w19..w21 (FIXTURES.md F1)


@lru_cache(maxsize=8)
def _zipf_cdfs(n_sources: int, vocab: int) -> tuple[np.ndarray, ...]:
    """Per-source inverse-CDF tables (cached per worker process)."""
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    out = []
    for si in range(n_sources):
        s = _SOURCE_EXPONENTS[si % len(_SOURCE_EXPONENTS)]
        w = np.ones(vocab) if s == 0.0 else ranks ** -s
        cdf = np.cumsum(w / w.sum())
        cdf[-1] = 1.0
        out.append(cdf)
    return tuple(out)


def _uniform(keys: np.ndarray) -> np.ndarray:
    return (splitmix64(keys) >> U64(11)).astype(np.float64) / float(1 << 53)


def _gen_sequences(batch: dict, *, seed: int, n_sources: int, vocab: int,
                   len_mu: float, len_sigma: float, len_min: int,
                   len_max: int) -> pa.Table:
    """Counter-based generator over ``ray.data.range`` ids: every value is a
    pure function of (seed, row id), so output is identical under any block
    layout or retry (plain function -> elastic task pool)."""
    cdfs = _zipf_cdfs(n_sources, vocab)
    row_seed = derive_seed(seed, "synth_row")
    tok_seed = derive_seed(seed, "synth_tok")
    ids = np.asarray(batch["id"], dtype=np.int64)
    src_idx = (ids % n_sources).astype(np.int64)
    doc_idx = ids // n_sources
    # doc length: lognormal via Box-Muller on two counter-derived uniforms
    u1 = _uniform(ids.astype(np.uint64) ^ U64(row_seed))
    u2 = _uniform(splitmix64(ids.astype(np.uint64)) ^ U64(row_seed))
    z = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-300))) * np.cos(2 * np.pi * u2)
    n_tok = np.clip(np.exp(len_mu + len_sigma * z), len_min,
                    len_max).astype(np.int64)
    total = int(n_tok.sum())
    # per-position counter key: id * 2^16 + pos (pos < len_max <= 2^16)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_tok)[:-1]]).astype(np.uint64), n_tok)
    rep_ids = np.repeat(ids.astype(np.uint64), n_tok)
    with np.errstate(over="ignore"):
        u = _uniform((rep_ids << U64(16)) + pos ^ U64(tok_seed))
    flat = np.empty(total, dtype=np.int32)
    rep_src = np.repeat(src_idx, n_tok)
    for si in range(n_sources):
        mask = rep_src == si
        if mask.any():
            flat[mask] = np.searchsorted(cdfs[si], u[mask],
                                         side="left").astype(np.int32)
    offsets = np.zeros(len(ids) + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    doc_ids = [f"src{s:02d}-doc{d:08d}" for s, d in
               zip(src_idx.tolist(), doc_idx.tolist())]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "tokens": pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(flat, pa.int32())),
        "n_tok": pa.array(n_tok.astype(np.int32), pa.int32()),
        "source": pa.array([f"src{s:02d}" for s in src_idx.tolist()],
                           pa.string()),
    })


@lru_cache(maxsize=8)
def _de_bruijn(k: int, sigma: int) -> np.ndarray:
    """De Bruijn sequence B(sigma, k): every k-gram over sigma symbols
    appears exactly once (standard Lyndon-word construction). Mirrors the
    reference's worst-case corpus for bloom-tree pruning
    (``datagenerators/AdversarialGenerators.java:14-124``,
    ``data/adversarial/debruijn/``)."""
    seq: list[int] = []
    a = [0] * sigma * k

    def db(t: int, p: int) -> None:
        if t > k:
            if k % p == 0:
                seq.extend(a[1: p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, sigma):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    return np.array(seq, dtype=np.int32)


def synth_adversarial(n_rows: int, *, seed: int = 42, kind: str = "debruijn",
                      k: int = 6, sigma: int = 4, doc_len: int = 128,
                      run_len: int = 64) -> "rd.Dataset":
    """Adversarial F2 corpus as a Dataset (FIXTURES.md F2).

    - ``debruijn``: docs are consecutive slices of B(sigma, k) (wrapping)
      — every k-gram occurs exactly once per cycle; worst case for
      bloom-tree pruning.
    - ``blocks``: alternating mono-token runs of ``run_len`` — worst case
      for per-level distinct estimates
      (``data/adversarial/blocks/``).
    Deterministic per row id; source name ``adv_{kind}``.
    """
    if kind == "debruijn":
        base = _de_bruijn(k, sigma)
    elif kind == "blocks":
        base = np.repeat(np.arange(2, dtype=np.int32), run_len)
    else:
        raise ValueError(f"unknown adversarial kind {kind!r}")

    def gen(batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        n = len(ids)
        starts = (ids * doc_len) % len(base)
        flat = np.empty(n * doc_len, dtype=np.int32)
        idx = (starts[:, None] + np.arange(doc_len)[None, :]) % len(base)
        flat = base[idx].reshape(-1)
        offsets = np.arange(0, (n + 1) * doc_len, doc_len, dtype=np.int32)
        return pa.table({
            "doc_id": pa.array([f"adv-doc{int(i):08d}" for i in ids],
                               pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets),
                                               pa.array(flat, pa.int32())),
            "n_tok": pa.array(np.full(n, doc_len, dtype=np.int32),
                              pa.int32()),
            "source": pa.array([f"adv_{kind}"] * n, pa.string()),
        })

    return rd.range(n_rows).map_batches(gen, batch_format="numpy")


def markov_model(seed: int, sigma: int, order: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic variable-order Markov model: (initial_ctx_dist,
    transitions[ctx_card, sigma]) with rows drawn as normalized uniforms —
    the reference's ``randomDistribution`` construction
    (``datagenerators/MarkovChainGenerator.java:60-66``)."""
    ctx_card = max(1, sigma ** order)
    rng = np.random.default_rng(derive_seed(seed, "markov_model") & (2**63 - 1))
    init = rng.random(ctx_card)
    init /= init.sum()
    trans = rng.random((ctx_card, sigma))
    trans /= trans.sum(axis=1, keepdims=True)
    return init, trans


def _gen_markov(batch: dict, *, seed: int, sigma: int, order: int,
                doc_len: int) -> pa.Table:
    """Counter-based Markov docs: each doc runs its own chain from a
    row-id-derived start; transitions are shared and deterministic. The
    vectorization is over DOCS (one step advances every doc in the batch),
    mirroring the reference's sequential emission per stream
    (``MarkovChainGenerator.java:80-95``) without per-row Python."""
    init, trans = markov_model(seed, sigma, order)
    ctx_card = trans.shape[0]
    init_cdf = np.cumsum(init)
    init_cdf[-1] = 1.0
    trans_cdf = np.cumsum(trans, axis=1)
    trans_cdf[:, -1] = 1.0
    step_seed = derive_seed(seed, "markov_step")
    ids = np.asarray(batch["id"], dtype=np.int64)
    n = len(ids)
    out = np.empty((n, doc_len), dtype=np.int32)
    # initial context (order symbols emitted first, like the reference)
    u0 = _uniform(ids.astype(np.uint64) ^ U64(step_seed))
    ctx = np.searchsorted(init_cdf, u0, side="left").astype(np.int64)
    ctx_stride = max(1, sigma ** max(0, order - 1))
    pos = 0
    if order > 0:
        # decode context digits most-significant first
        c = ctx.copy()
        for i in range(order):
            digit = c // (sigma ** (order - 1 - i))
            c = c % (sigma ** (order - 1 - i))
            if pos < doc_len:
                out[:, pos] = digit.astype(np.int32)
                pos += 1
    with np.errstate(over="ignore"):
        for t in range(pos, doc_len):
            u = _uniform((ids.astype(np.uint64) << U64(16))
                         + U64(t) ^ U64(step_seed))
            rows = trans_cdf[ctx % ctx_card]
            nxt = (rows < u[:, None]).sum(axis=1).astype(np.int64)
            out[:, t] = nxt.astype(np.int32)
            if order <= 1:
                ctx = nxt
            else:
                ctx = (ctx % ctx_stride) * sigma + nxt
    offsets = np.arange(0, (n + 1) * doc_len, doc_len, dtype=np.int32)
    return pa.table({
        "doc_id": pa.array([f"mkv-doc{int(i):08d}" for i in ids],
                           pa.string()),
        "tokens": pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(out.reshape(-1),
                                                    pa.int32())),
        "n_tok": pa.array(np.full(n, doc_len, dtype=np.int32), pa.int32()),
        "source": pa.array([f"markov_o{order}"] * n, pa.string()),
    })


def markov_sequences(n_rows: int, *, seed: int = 42, sigma: int = 32,
                     order: int = 1, doc_len: int = 128) -> "rd.Dataset":
    """Natural-text-like conformance corpus from a variable-order Markov
    chain (reference ``datagenerators/MarkovChainGenerator.java``, the
    pg2701-style family). Deterministic per row id."""
    if order < 0 or sigma < 2:
        raise ValueError("order >= 0 and sigma >= 2 required")
    if sigma ** order > 1 << 20:
        raise ValueError("context cardinality sigma^order too large")
    return rd.range(n_rows).map_batches(
        _gen_markov, batch_format="numpy",
        fn_kwargs=dict(seed=seed, sigma=sigma, order=order,
                       doc_len=doc_len),
        batch_size=8192)


def synth_sequences(n_rows: int, *, seed: int = 42, n_sources: int = 4,
                    vocab: int = 32768, len_mu: float = 4.5,
                    len_sigma: float = 0.6, len_min: int = 8,
                    len_max: int = 512, override_num_blocks: int | None = None
                    ) -> "rd.Dataset":
    """Deterministic F1-shaped synthetic corpus as a streaming Dataset."""
    gen = rd.range(n_rows, override_num_blocks=override_num_blocks)
    return gen.map_batches(
        _gen_sequences, batch_format="numpy",
        fn_kwargs=dict(seed=seed, n_sources=n_sources, vocab=vocab,
                       len_mu=len_mu, len_sigma=len_sigma,
                       len_min=len_min, len_max=len_max),
        batch_size=8192)
