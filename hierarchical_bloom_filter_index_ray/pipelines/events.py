"""Windowed aggregates over the ``events`` stream table.

The reference's streaming semantics (SURVEY.md §2.11) are count-based
tumbling trees inside a sliding window; on a batch engine "streaming"
becomes deterministic windowing by time bucket: window assignment is a
vectorized
``map_batches`` and the aggregate is a pre-combined groupby.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _auto_num_buckets(*paths_or_dss, target_bytes: int = 64 << 20,
                      lo: int = 64, hi: int = 1 << 16,
                      expansion: float = 4.0) -> int:
    """Bucket count sized so an average hash-bucket group holds roughly
    ``target_bytes`` of in-memory rows (parquet bytes x ``expansion``
    decode blow-up), clamped to [lo, hi]. Sizes come from read metadata
    only — nothing executes."""
    total = 0
    for x in paths_or_dss:
        try:
            files = x.input_files() if hasattr(x, "input_files") else [x]
            for f in files:
                f = str(f)
                if os.path.exists(f):
                    total += os.path.getsize(f)
        except Exception:
            continue
    if not total:
        return lo
    return int(min(max(math.ceil(total * expansion / target_bytes), lo), hi))


def _parquet_col_range(path: str, col: str) -> tuple[int, int] | None:
    """(min, max) of a timestamp/int column in int64 microseconds, from
    parquet row-group footer statistics only (no data read)."""
    import pyarrow.parquet as pq
    try:
        md = pq.ParquetFile(path).metadata
        ci = md.schema.to_arrow_schema().get_field_index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            los.append(st.min)
            his.append(st.max)
        to_us = (lambda v: int(np.datetime64(v, "us").astype(np.int64))
                 if not isinstance(v, (int, np.integer)) else int(v))
        return min(map(to_us, los)), max(map(to_us, his))
    except Exception:
        return None


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


SESSION_COLS = ["user_id", "session_start", "session_end", "n_events",
                "sum_value"]


def sessionize(sf_dir: str, *, gap_minutes: int = 30,
               num_buckets: int | None = None,
               slab_minutes: int | None = 1440) -> "rd.Dataset":
    """Per-user session windows (session = events gapped < gap_minutes).

    Bounded groups at ANY skew: the group key is (user-hash bucket, time
    slab), so even a single user's whole history splits into slab-sized
    pandas groups — a hash bucket alone cannot bound the maximally-skewed
    key. Sessions are computed exactly per slab with one vectorized
    sort + diff/cumsum across all the group's users; only sessions that
    touch a slab edge within one gap (<= 2 per user per slab) enter a
    second, much smaller grouped merge pass. Split-at-boundary +
    adjacent-merge is associative, so results are identical to a
    single-slab run. ``num_buckets=None`` auto-sizes from the input
    bytes. Output one row per session: (user_id, session_start,
    session_end, n_events, sum_value)."""
    import pandas as pd

    from ..state.splitmix import hash_u64

    gap = np.timedelta64(gap_minutes * 60, "s")
    gap_us = gap_minutes * 60 * 1_000_000
    slab_us = (None if slab_minutes is None
               else slab_minutes * 60 * 1_000_000)
    path = f"{sf_dir}/events.parquet"
    B = num_buckets or _auto_num_buckets(path)

    def add_keys(batch: pa.Table) -> pa.Table:
        keys = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        b = (hash_u64(keys, 0x5EED) % np.uint64(B)).astype(np.int64)
        if slab_us is None:
            slab = np.zeros(batch.num_rows, dtype=np.int64)
        else:
            ts = batch["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            slab = ts // slab_us
        return (batch.append_column("__bucket", pa.array(b))
                .append_column("__slab", pa.array(slab)))

    def sessions_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        sess = (new_user | (g["ts"].diff() > gap)).cumsum()
        return g.groupby(sess).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum")).reset_index(drop=True)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out = sessions_of(g)
        if slab_us is None:
            out["__open"] = False
            return out[SESSION_COLS + ["__open"]]
        lo = int(g["__slab"].iloc[0]) * slab_us
        hi = lo + slab_us
        start_us = out["session_start"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        end_us = out["session_end"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        first_of_user = out["user_id"].ne(out["user_id"].shift())
        last_of_user = out["user_id"].ne(out["user_id"].shift(-1))
        # a first-session-in-slab can merge left only if a previous-slab
        # event (ts < lo) is within gap: start < lo + gap; symmetric on
        # the right with end >= hi - gap (next event at ts >= hi)
        open_l = first_of_user.to_numpy() & (start_us < lo + gap_us)
        open_r = last_of_user.to_numpy() & (end_us >= hi - gap_us)
        out["__open"] = open_l | open_r
        return out[SESSION_COLS + ["__open"]]

    ds = rd.read_parquet(path,
                         columns=["event_id", "ts", "user_id", "value"])
    sess = (ds.map_batches(add_keys, batch_format="pyarrow")
            .groupby(["__bucket", "__slab"])
            .map_groups(per_group, batch_format="pandas")).materialize()

    def take_closed(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["__open"]][SESSION_COLS]

    def take_open(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["__open"]][SESSION_COLS].copy()
        keys = out["user_id"].to_numpy().astype(np.uint64)
        out["__mb"] = (hash_u64(keys, 0x5EED) % np.uint64(B)).astype(
            np.int64)
        return out

    closed = sess.map_batches(take_closed, batch_format="pandas")
    if slab_us is None:
        return closed
    open_ds = sess.map_batches(take_open, batch_format="pandas")
    if open_ds.count() == 0:
        return closed

    def merge_open(g: pd.DataFrame) -> pd.DataFrame:
        # per-user sessions are disjoint intervals, so sorted by start
        # they are sorted by end too; adjacent-pair gap test + cumsum
        # reconstructs exactly the unsplit sessions
        g = g.sort_values(["user_id", "session_start", "session_end"],
                          kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = new_user | ((g["session_start"] - g["session_end"].shift())
                          > gap)
        out = g.groupby(brk.cumsum()).agg(
            user_id=("user_id", "first"),
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum")).reset_index(drop=True)
        return out[SESSION_COLS]

    merged = open_ds.groupby("__mb").map_groups(merge_open,
                                                batch_format="pandas")
    return closed.union(merged)


def asof_join(left: "rd.Dataset", right: "rd.Dataset", *, by: str, on: str,
              right_select: dict[str, str],
              num_buckets: int | None = None,
              slab_us: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None) -> "rd.Dataset":
    """Backward as-of join: each left row pairs with the NEWEST right row
    whose ``on`` <= the left row's ``on`` within the same ``by`` key
    (inner — unmatched left rows drop). Ray Data has no native as-of
    join; this is the documented composition: tag sides -> union ->
    ``groupby`` on (key-hash bucket, time slab) (ONE shuffle co-locating
    both sides in bounded groups, not one per key — a million tiny
    per-key pandas groups is the slow shape) -> one vectorized
    ``pd.merge_asof(by=...)`` per group.

    ``right_select`` maps right columns to their output names (e.g.
    ``{"event_id": "purchase_event_id"}``); all left columns pass
    through. ``num_buckets=None`` auto-sizes from the input bytes.

    ``slab_us`` bounds groups under KEY SKEW: with it set, the group key
    gains a ``on // slab_us`` time-slab component, so even a single
    key's whole history splits into slab-sized groups. Correctness
    across slabs is restored by CARRY-IN rows: per (key, left-slab s)
    the newest right row from slabs < s is replicated into s's group
    (slab ``on`` ranges are disjoint, so that is the newest earlier
    right overall); a left row then sees every right it could match —
    in-slab rights plus the carry — and ``merge_asof`` stays exact.
    With ``slab_us=None`` a key's history stays in one group (bounded
    only under uniform keys).
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
    num_buckets = num_buckets or _auto_num_buckets(left, right)
    left_names = list(left_schema.names)
    out_names = list(right_select.values())
    r_types = {f"__r_{dst}": right_schema.types[
        right_schema.names.index(src)]
        for src, dst in right_select.items()}
    by_type = left_schema.types[left_schema.names.index(by)]
    on_type = left_schema.types[left_schema.names.index(on)]

    def _bucket(batch: pa.Table) -> pa.Array:
        keys = batch[by].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((hash_u64(keys, 0x5EED)
                         % np.uint64(num_buckets)).astype(np.int64))

    def _slab(batch: pa.Table) -> pa.Array:
        if slab_us is None:
            return pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        ts = batch[on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.array(ts // slab_us)

    # both sides normalize to ONE schema (left cols + null-padded right
    # cols and vice versa) so the union is exact, not best-effort
    def norm_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_names}
        for name, typ in r_types.items():
            cols[name] = pa.nulls(batch.num_rows, typ)
        cols["__side"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), pa.int8())
        cols["__bucket"] = _bucket(batch)
        cols["__slab"] = _slab(batch)
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
        cols["__slab"] = _slab(batch)
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

    union = lt.union(rt)
    if slab_us is not None:
        union = union.union(_asof_carry_rows(
            lt, rt, by=by, on=on, r_cols=r_cols, r_types=r_types,
            left_schema=left_schema, num_buckets=num_buckets,
            hash_u64=hash_u64))
    return union.groupby(["__bucket", "__slab"]).map_groups(
        per_bucket, batch_format="pandas")


def _asof_carry_rows(lt: "rd.Dataset", rt: "rd.Dataset", *, by: str,
                     on: str, r_cols: list[str], r_types: dict,
                     left_schema: pa.Schema, num_buckets: int,
                     hash_u64) -> "rd.Dataset":
    """Carry-in rows for the slabbed as-of join: one right row per
    (key, left-slab s) — the newest right from slabs < s — emitted in
    the full normalized union schema so it rides the same groupby.
    Every stage is bounded: per-(bucket, slab) maxima groups, per-batch
    distinct left key-slabs, and a per-key-hash carry pass whose groups
    hold only (key, slab)-granular rows."""
    import pandas as pd

    left_names = list(left_schema.names)
    by_type = left_schema.types[left_schema.names.index(by)]
    on_type = left_schema.types[left_schema.names.index(on)]

    def _cb(keys: np.ndarray) -> pa.Array:
        return pa.array((hash_u64(keys.astype(np.uint64), 0x5EED)
                         % np.uint64(num_buckets)).astype(np.int64))

    # both carry-pass sides emit ONE explicit slim arrow schema; r_cols
    # on the left side are typed ZEROS (never read — __cside separates
    # sides) so the pandas group frame keeps integer dtypes instead of
    # null-poisoned floats
    def _slim(n: int, by_vals, on_vals, rc_vals: dict,
              slab_vals, cside: int) -> pa.Table:
        cols: dict[str, pa.Array] = {
            by: pa.array(by_vals).cast(by_type),
            on: (pa.array(on_vals).cast(on_type) if on_vals is not None
                 else pa.nulls(n, on_type)),
        }
        for rc in r_cols:
            cols[rc] = (pa.array(rc_vals[rc]).cast(r_types[rc])
                        if rc_vals else
                        pa.array(np.zeros(n, dtype=np.int64)).cast(
                            r_types[rc]))
        cols["__slab"] = pa.array(np.asarray(slab_vals, dtype=np.int64))
        cols["__cside"] = pa.array(np.full(n, cside, dtype=np.int8))
        cols["__cb"] = _cb(np.asarray(by_vals))
        return pa.table(cols)

    # newest right row per (key, slab), deterministic (on, *r_cols) order
    def rt_maxima(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([on] + r_cols, kind="stable")
        top = g.groupby(by, sort=False).tail(1)
        return _slim(len(top), top[by].to_numpy(), top[on].to_numpy(),
                     {rc: top[rc].to_numpy() for rc in r_cols},
                     top["__slab"].to_numpy(), 1)

    maxima = (rt.groupby(["__bucket", "__slab"])
              .map_groups(rt_maxima, batch_format="pandas"))

    # distinct (key, slab) pairs on the left (per-batch distinct is
    # enough — the carry pass dedups per key)
    def lt_keyslabs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[by].to_numpy(zero_copy_only=False),
            "s": t["__slab"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return _slim(len(df), df["k"].to_numpy(), None, None,
                     df["s"].to_numpy(), 0)

    lks = lt.map_batches(lt_keyslabs, batch_format="pyarrow")

    def make_carry(g: pd.DataFrame) -> pa.Table:
        # pack (key-code, slab) so ONE searchsorted finds, per left
        # (key, s), the greatest right (key, slab') with slab' < s —
        # slab `on` ranges are disjoint, so that row is the newest
        # earlier right overall
        _, codes = np.unique(g[by].to_numpy(), return_inverse=True)
        slab = g["__slab"].to_numpy().astype(np.int64)
        # normalize to non-negative before packing: pre-1970 timestamps
        # floor-divide to NEGATIVE slabs, and codes*S+slab with a
        # negative remainder would overlap adjacent key codes' ranges
        # (ADVICE r3 — the searchsorted carry could pick another key's
        # right row)
        off = int(slab.min())
        slab = slab - off
        S = int(slab.max()) + 2
        packed = codes.astype(np.int64) * S + slab
        rmask = g["__cside"].to_numpy() == 1
        r_order = np.argsort(packed[rmask], kind="stable")
        rp = packed[rmask][r_order]
        ridx = np.nonzero(rmask)[0][r_order]
        lp = np.unique(packed[~rmask])
        pos = np.searchsorted(rp, lp, side="left") - 1
        ok = pos >= 0
        if len(rp):
            ok &= (rp[np.maximum(pos, 0)] // S) == (lp // S)
        n = int(ok.sum())
        sel = g.iloc[ridx[pos[ok]]] if n else g.iloc[:0]
        tgt_slab = lp[ok] % S + off if n else np.empty(0, np.int64)
        cols: dict[str, pa.Array] = {}
        for i, c in enumerate(left_names):
            if c == by or c == on:
                cols[c] = pa.array(sel[c].to_numpy()).cast(
                    left_schema.types[i])
            else:
                cols[c] = pa.nulls(n, left_schema.types[i])
        for rc in r_cols:
            cols[rc] = pa.array(sel[rc].to_numpy()).cast(r_types[rc])
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        cols["__bucket"] = _cb(sel[by].to_numpy() if n
                               else np.empty(0, np.int64))
        cols["__slab"] = pa.array(tgt_slab.astype(np.int64))
        return pa.table(cols)

    return maxima.union(lks).groupby("__cb").map_groups(
        make_carry, batch_format="pandas")


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
                    lookback_minutes: int = 5,
                    num_subs: int | None = None) -> "rd.Dataset":
    """Non-equi band join: for every ``left_type`` event at time t, count
    ``right_type`` events (any user) in the look-back band (t-Δ, t].

    The range-join scale pattern, skew-bounded (VERDICT r3 #3): both
    sides bucket by Δ-wide time buckets, and within each bucket the LEFT
    rows hash into ``num_subs`` sub-buckets (auto-sized from parquet
    bytes like asof/sessionize) so a hot Δ window — e.g. every event in
    one 5-minute band — still splits into bounded groups. Each RIGHT row
    is pre-aggregated per batch to (ts, weight) — counting needs no
    identity, only the timestamp multiset — then replicated to its
    bucket and the next one (a right in (t-Δ, t] can only live in the
    left's bucket or the previous one) x every sub-bucket. ONE groupby
    on the packed (bucket, sub) key co-locates each left with every
    right it can match; a per-group weighted ``searchsorted`` difference
    counts the band. No all-pairs, no driver loop. Output:
    (event_id, n_right) — exact, LEFT-join semantics (zero counts kept).

    Group-size bound: lefts per group ~ bucket_lefts / num_subs (hash
    split); rights per group <= distinct right timestamps in 2 adjacent
    buckets (already weight-compressed). Reference range-scan semantics:
    PMIndex/HBI.java interval containment over windowed counts."""
    import pandas as pd

    band_us = lookback_minutes * 60 * 1_000_000
    path = f"{sf_dir}/events.parquet"
    if num_subs is not None:
        S = int(num_subs)
    else:
        # size sub-buckets from the DENSITY (rows per Δ-bucket, footer
        # stats only), not total bytes: a longer corpus at the same event
        # rate keeps S — and the 2S-fold right replication — constant,
        # while a rate spike (everything in one band) grows S to keep
        # per-group lefts ~target
        S = 1
        rng = _parquet_col_range(path, "ts")
        try:
            import pyarrow.parquet as pq
            n_rows = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            n_rows = 0
        if rng is not None and n_rows:
            n_buckets = max(1, (rng[1] - rng[0]) // band_us + 1)
            per_bucket_rows = n_rows / n_buckets
            S = int(min(max(math.ceil(per_bucket_rows / 65_536), 1), 4096))

    ev = rd.read_parquet(path, columns=["event_id", "ts", "event_type"])

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        typ = batch["event_type"].to_numpy(zero_copy_only=False)
        bucket = ts // band_us
        out_id, out_ts, out_key, out_w = [], [], [], []
        lm = typ == left_type
        lid = batch["event_id"].to_numpy(zero_copy_only=False)[lm]
        # splitmix-ish mix so sequential ids spread across sub-buckets
        sub = (((lid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(S)).astype(np.int64)
        out_id.append(lid)
        out_ts.append(ts[lm])
        out_key.append(bucket[lm] * S + sub)
        out_w.append(np.zeros(lm.sum(), dtype=np.int64))  # w=0 -> left
        rm = typ == right_type
        # pre-aggregate rights: the band count needs only the timestamp
        # multiset, so collapse to (ts, weight) BEFORE the S-fold
        # sub-bucket replication
        rts, w = np.unique(ts[rm], return_counts=True)
        rbucket = rts // band_us
        for shift in (0, 1):             # right rows: bucket, bucket+1
            for s in range(S):
                out_id.append(np.full(len(rts), -1, dtype=np.int64))
                out_ts.append(rts)
                out_key.append((rbucket + shift) * S + s)
                out_w.append(w.astype(np.int64))
        return pa.table({
            "event_id": pa.array(np.concatenate(out_id), pa.int64()),
            "ts_us": pa.array(np.concatenate(out_ts), pa.int64()),
            "gkey": pa.array(np.concatenate(out_key), pa.int64()),
            "w": pa.array(np.concatenate(out_w), pa.int64()),
        })

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        w = g["w"].to_numpy()
        lrows = g[w == 0]
        if not len(lrows):
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "n_right": pd.Series([], dtype=np.int64)})
        rts = g.loc[w > 0, "ts_us"].to_numpy()
        rw = w[w > 0]
        order = np.argsort(rts, kind="stable")
        rts = rts[order]
        cum = np.concatenate([[0], np.cumsum(rw[order])])
        lt = lrows["ts_us"].to_numpy()
        n = (cum[np.searchsorted(rts, lt, side="right")]
             - cum[np.searchsorted(rts, lt - band_us, side="right")])
        return pd.DataFrame({"event_id": lrows["event_id"].to_numpy(),
                             "n_right": n.astype(np.int64)})

    return (ev.map_batches(assign, batch_format="pyarrow")
            .groupby("gkey").map_groups(per_group,
                                        batch_format="pandas"))


def clicks_last_purchase(sf_dir: str) -> "rd.Dataset":
    """As-of join demo over the events stream: every click matched to the
    user's most recent purchase at-or-before the click ->
    (event_id, user_id, purchase_event_id, lag_us). Exact DuckDB
    equivalent: ``ASOF JOIN ... ON l.user_id = r.user_id AND
    l.ts >= r.ts``."""
    path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(path, columns=["event_id", "ts", "user_id",
                                        "event_type"])
    # slab width from footer stats: enough slabs that even ONE key's
    # full history splits into ~target-sized groups (skew bound)
    slab_us = None
    rng = _parquet_col_range(path, "ts")
    if rng is not None and rng[1] > rng[0]:
        n_slabs = _auto_num_buckets(path, lo=1, hi=4096)
        if n_slabs > 1:
            slab_us = math.ceil((rng[1] - rng[0] + 1) / n_slabs)

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
                       slab_us=slab_us,
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
