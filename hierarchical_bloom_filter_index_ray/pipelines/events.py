"""Windowed aggregates over the ``events`` stream table.

The reference's streaming semantics (SURVEY.md §2.11) are count-based
tumbling trees inside a sliding window; on a batch engine "streaming"
becomes deterministic windowing by time bucket: window assignment is a
vectorized
``map_batches`` and the aggregate is a pre-combined groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def tumbling_window_agg(sf_dir: str, *, window_minutes: int = 60
                        ) -> "rd.Dataset":
    """(event_type, window_start, n_events, sum_value): tumbling event-time
    windows per event type."""
    span_us = window_minutes * 60 * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        win = pc.multiply(pc.floor(pc.divide(ts, span_us)).cast(pa.int64()),
                          span_us)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": win.cast(pa.timestamp("us")),
            "value": batch["value"],
        })

    from ray.data.aggregate import Count, Sum
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="sum_value")))


def hopping_window_agg(sf_dir: str, *, window_minutes: int = 60,
                       hop_minutes: int = 15) -> "rd.Dataset":
    """Sliding/hopping event-time windows: length ``window_minutes``,
    advancing every ``hop_minutes`` (must divide it). Each event lands in
    ``window/hop`` overlapping windows — the map side REPLICATES the row
    per covering window (vectorized repeat; fan-out factor is the small
    constant window/hop, not data-dependent), then the usual pre-combined
    groupby. Output: (event_type, window_start, n_events, sum_value)."""
    if window_minutes % hop_minutes:
        raise ValueError("hop_minutes must divide window_minutes")
    hop_us = hop_minutes * 60 * 1_000_000
    fanout = window_minutes // hop_minutes

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        last = (ts // hop_us) * hop_us        # newest window containing t
        k = np.tile(np.arange(fanout, dtype=np.int64), len(ts))
        win = np.repeat(last, fanout) - k * hop_us
        rep = pa.array(np.repeat(np.arange(len(ts)), fanout))
        return pa.table({
            "event_type": batch["event_type"].take(rep),
            "window_start": pa.array(win).cast(pa.timestamp("us")),
            "value": batch["value"].take(rep),
        })

    from ray.data.aggregate import Count, Sum
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="sum_value")))


def sessionize(sf_dir: str, *, gap_minutes: int = 30,
               num_buckets: int = 64) -> "rd.Dataset":
    """Per-user session windows (session = events gapped < gap_minutes).
    Users hash into ``num_buckets`` bounded groups (one key's events stay
    together; a per-user ``map_groups`` would make millions of tiny
    pandas groups); inside a bucket the session split is one vectorized
    sort + diff/cumsum across ALL its users. Output one row per session:
    (user_id, session_start, session_end, n_events, sum_value)."""
    import pandas as pd

    from ..state.splitmix import hash_u64

    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        b = (hash_u64(keys, 0x5EED) % np.uint64(num_buckets)).astype(
            np.int64)
        return batch.append_column("__bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        sess = (new_user | (g["ts"].diff() > gap)).cumsum()
        out = g.groupby(sess).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"), sum_value=("value", "sum"))
        return out.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events",
             "sum_value"]]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pandas"))


def asof_join(left: "rd.Dataset", right: "rd.Dataset", *, by: str, on: str,
              right_select: dict[str, str], num_buckets: int = 64,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None) -> "rd.Dataset":
    """Backward as-of join: each left row pairs with the NEWEST right row
    whose ``on`` <= the left row's ``on`` within the same ``by`` key
    (inner — unmatched left rows drop). Ray Data has no native as-of
    join; this is the documented composition: tag sides -> union ->
    ``groupby`` on a HASH BUCKET of the key (ONE shuffle co-locating both
    sides; ``num_buckets`` bounded groups, not one per key — a million
    tiny per-key pandas groups is the slow shape) -> one vectorized
    ``pd.merge_asof(by=...)`` per bucket.

    ``right_select`` maps right columns to their output names (e.g.
    ``{"event_id": "purchase_event_id"}``); all left columns pass
    through. Partitioning assumption: a bucket's rows fit in one group's
    memory — raise ``num_buckets`` with corpus size (buckets stay
    balanced because keys hash uniformly; no per-key skew since one key's
    history still lands in one bucket).
    """
    import pandas as pd

    from ..state.splitmix import hash_u64

    # pass schemas when statically known: Dataset.schema() on a lazy
    # pipeline executes a sample block just to infer them
    if left_schema is None:
        left_schema = pa.schema(list(zip(left.schema().names,
                                         left.schema().types)))
    if right_schema is None:
        right_schema = pa.schema(list(zip(right.schema().names,
                                          right.schema().types)))
    left_names = list(left_schema.names)
    out_names = list(right_select.values())
    r_types = {f"__r_{dst}": right_schema.types[
        right_schema.names.index(src)]
        for src, dst in right_select.items()}

    def _bucket(batch: pa.Table) -> pa.Array:
        keys = batch[by].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((hash_u64(keys, 0x5EED)
                         % np.uint64(num_buckets)).astype(np.int64))

    # both sides normalize to ONE schema (left cols + null-padded right
    # cols and vice versa) so the union is exact, not best-effort
    def norm_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_names}
        for name, typ in r_types.items():
            cols[name] = pa.nulls(batch.num_rows, typ)
        cols["__side"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), pa.int8())
        cols["__bucket"] = _bucket(batch)
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for i, c in enumerate(left_names):
            cols[c] = batch[c] if c in (by, on) else pa.nulls(
                batch.num_rows, left_schema.types[i])
        for src, dst in right_select.items():
            cols[f"__r_{dst}"] = batch[src]
        cols["__side"] = pa.array(
            np.ones(batch.num_rows, dtype=np.int8), pa.int8())
        cols["__bucket"] = _bucket(batch)
        return pa.table(cols)

    lt = left.map_batches(norm_left, batch_format="pyarrow")
    rt = right.map_batches(norm_right, batch_format="pyarrow")

    # null padding makes int columns float in the pandas group frame;
    # restore the declared dtypes on the (null-free) joined output
    want = {c: pd.api.types.pandas_dtype(
        left_schema.types[i].to_pandas_dtype())
        for i, c in enumerate(left_schema.names)}
    for name, typ in r_types.items():
        want[name.removeprefix("__r_")] = pd.api.types.pandas_dtype(
            typ.to_pandas_dtype())

    r_cols = [f"__r_{d}" for d in out_names]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["__side"] == 0].sort_values(on, kind="stable")
        # tiebreak on the selected right columns: equal-`on` right rows
        # otherwise arrive in nondeterministic shuffle order, and
        # merge_asof picks the LAST of them — sort so "last" is the
        # greatest (on, *right_select) tuple, a stable documented rule
        rrows = g[g["__side"] == 1].sort_values([on] + r_cols,
                                                kind="stable")
        if not len(lrows) or not len(rrows):
            return pd.DataFrame({c: pd.Series([], dtype=want[c])
                                 for c in left_names + out_names})
        merged = pd.merge_asof(
            lrows[left_names], rrows[[by, on] + r_cols]
            .rename(columns={on: "__r_on"}),
            left_on=on, right_on="__r_on", by=by,
            direction="backward", allow_exact_matches=True)
        hit = merged["__r_on"].notna()     # unmatched -> right cols all NaN
        out = merged[hit].reset_index(drop=True)
        out = out[left_names + r_cols].rename(
            columns={f"__r_{d}": d for d in out_names})
        for c in out.columns:
            out[c] = out[c].astype(want[c])
        return out

    return lt.union(rt).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")


def props_field_sum(sf_dir: str, *, key: str = "k") -> "rd.Dataset":
    """Semi-structured extraction: pull the integer ``key`` field out of
    the JSON-string ``props`` column with ONE vectorized RE2 kernel
    (``pc.extract_regex`` — no per-row json.loads) and aggregate per
    event type. Output: (event_type, n_events, sum_k)."""
    pattern = f'"{key}":\\s*(?P<v>-?\\d+)'

    def extract(batch: pa.Table) -> pa.Table:
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ext = pc.extract_regex(props, pattern)
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        return pa.table({
            "event_type": batch["event_type"],
            "k": pc.coalesce(v, pa.scalar(0, pa.int64())),
        })

    from ray.data.aggregate import Count, Sum
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    return (ds.map_batches(extract, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n_events"),
                       Sum("k", alias_name="sum_k")))


def band_join_count(sf_dir: str, *, left_type: str = "error",
                    right_type: str = "purchase",
                    lookback_minutes: int = 5) -> "rd.Dataset":
    """Non-equi band join: for every ``left_type`` event at time t, count
    ``right_type`` events (any user) in the look-back band (t-Δ, t].

    The range-join scale pattern: both sides bucket by Δ-wide time
    buckets; each RIGHT row replicates to its bucket and the next one
    (constant 2x fan-out — a right in (t-Δ, t] can only live in the
    left's bucket or the previous one), then ONE groupby co-locates each
    left with every right it can match and a per-group ``searchsorted``
    difference counts the band. No all-pairs, no driver loop.
    Output: (event_id, n_right) — exact, LEFT-join semantics (zero
    counts kept)."""
    import pandas as pd

    band_us = lookback_minutes * 60 * 1_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        typ = batch["event_type"].to_numpy(zero_copy_only=False)
        bucket = ts // band_us
        out_id, out_ts, out_bucket, out_side = [], [], [], []
        lm = typ == left_type
        out_id.append(batch["event_id"].to_numpy(
            zero_copy_only=False)[lm])
        out_ts.append(ts[lm])
        out_bucket.append(bucket[lm])
        out_side.append(np.zeros(lm.sum(), dtype=np.int8))
        rm = typ == right_type
        for shift in (0, 1):                 # right rows: bucket, bucket+1
            out_id.append(np.full(rm.sum(), -1, dtype=np.int64))
            out_ts.append(ts[rm])
            out_bucket.append(bucket[rm] + shift)
            out_side.append(np.ones(rm.sum(), dtype=np.int8))
        return pa.table({
            "event_id": pa.array(np.concatenate(out_id), pa.int64()),
            "ts_us": pa.array(np.concatenate(out_ts), pa.int64()),
            "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
            "side": pa.array(np.concatenate(out_side), pa.int8()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["side"] == 0]
        if not len(lrows):
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "n_right": pd.Series([], dtype=np.int64)})
        rts = np.sort(g.loc[g["side"] == 1, "ts_us"].to_numpy())
        lt = lrows["ts_us"].to_numpy()
        n = (np.searchsorted(rts, lt, side="right")
             - np.searchsorted(rts, lt - band_us, side="right"))
        return pd.DataFrame({"event_id": lrows["event_id"].to_numpy(),
                             "n_right": n.astype(np.int64)})

    return (ev.map_batches(assign, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def clicks_last_purchase(sf_dir: str) -> "rd.Dataset":
    """As-of join demo over the events stream: every click matched to the
    user's most recent purchase at-or-before the click ->
    (event_id, user_id, purchase_event_id, lag_us). Exact DuckDB
    equivalent: ``ASOF JOIN ... ON l.user_id = r.user_id AND
    l.ts >= r.ts``."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def pick(kind):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["event_type"], kind)
            return batch.filter(m).select(["event_id", "ts", "user_id"])
        return f

    clicks = ev.map_batches(pick("click"), batch_format="pyarrow")
    purchases = ev.map_batches(pick("purchase"), batch_format="pyarrow")
    side_schema = pa.schema([("event_id", pa.int64()),
                             ("ts", pa.timestamp("us")),
                             ("user_id", pa.int64())])
    joined = asof_join(clicks, purchases, by="user_id", on="ts",
                       right_select={"event_id": "purchase_event_id",
                                     "ts": "purchase_ts"},
                       left_schema=side_schema, right_schema=side_schema)

    def finish(batch: pa.Table) -> pa.Table:
        lag = pc.subtract(batch["ts"].cast(pa.int64()),
                          batch["purchase_ts"].cast(pa.int64()))
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "purchase_event_id": batch["purchase_event_id"],
            "lag_us": lag,
        })

    return joined.map_batches(finish, batch_format="pyarrow")
