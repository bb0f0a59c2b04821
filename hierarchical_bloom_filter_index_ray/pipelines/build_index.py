"""Index build pipeline: sequences Dataset -> persisted hierarchical sketch
index + manifest (resumable).

Ray shape (SURVEY.md §3.1 "Ray shape"):

    read_parquet -> map_batches(add_window_columns)                 [stateless]
                 -> map_batches(PartialSketchBuilder, actor pool)   [stateful]
                 -> groupby(source, window_id).map_groups(Merge)    [shuffle of
                                                                     sketches]
                 -> write_parquet(out/partitions, partition_cols=[source])

The shuffle moves only serialized partial sketches (the map stage is the
combiner), mirroring the reference's per-tree locality where tokens never
leave the tree that indexed them (``PMIndex/HBI.java:230-261``).

Checkpoint/resume (north_rule "resumable from checkpoint with per-partition
lineage + metrics"): completed sources are recorded in ``manifest.json``
with per-source row/token/byte metrics; a resumed build prunes completed
sources from the read and appends only the missing partitions. Incomplete
partition dirs from a crashed run are deleted before rebuilding.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..config import HbiConfig
from ..stages.merge import finalize_unique_partials, merge_partials_group
from ..stages.resources import default_concurrency
from ..stages.sketch_build import PartialSketchBuilder
from ..stages.window import add_window_columns

MANIFEST = "manifest.json"
PARTITIONS = "partitions"

# On-disk index format version. Bump whenever the (window, slot) <-
# doc_id derivation or the partition schema changes in a way that makes
# indexes persisted by older code silently incompatible (ADVICE r3: the
# doc_index derivation gained 12-digit/2^40 ordinal caps, '#s'/':n' id
# forms and OOB-int hashing while format_version stayed 1 — a resumed or
# loaded v1 index would mix old/new slot assignments and return false
# negatives). params_hash covers CONFIG drift; FORMAT_VERSION covers
# CODE drift at identical config.
FORMAT_VERSION = 2


def load_manifest(out_dir: str) -> dict | None:
    """Read + validate the index manifest; None if absent.

    Raises on a format_version mismatch: every consumer (resume, query,
    expiry, stats) would silently mis-derive doc slots against an index
    persisted by an older code generation, so loading one is an error,
    not a degraded mode."""
    p = Path(out_dir) / MANIFEST
    if not p.exists():
        return None
    man = json.loads(p.read_text())
    ver = man.get("format_version")
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"index at {out_dir} has format_version={ver}, this code "
            f"writes {FORMAT_VERSION}; rebuild it (build_index with "
            "resume=False) — resuming or querying across format "
            "versions can silently mix (window, slot) assignments")
    return man


def build_index(ds: "rd.Dataset", cfg: HbiConfig, out_dir: str, *,
                batch_size: int = 1024, concurrency=None,
                num_cpus: float = 1.0, resume: bool = True,
                super_levels: bool = True,
                shard_windows: int | None = None) -> dict:
    """Build (or resume) the index; returns the manifest dict.

    ``super_levels``: also (re)build the cross-window super-level store
    (``pipelines/super_index.py``) — a tiny iterative aggregate over the
    per-window root blooms that bounds query probe work at O(log windows).

    ``shard_windows``: partition the output additionally by
    ``shard = window_id // shard_windows`` and record per-(source, shard)
    completion in the manifest — resume granularity becomes a window
    RANGE instead of a whole source, so restarting a crashed 100-TB
    build skips finished shards of every source (a source at that scale
    is far too big a unit to redo). ``None`` keeps the source-level
    layout.
    """
    import numpy as np

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()

    if concurrency is None:
        concurrency = default_concurrency()
    manifest = load_manifest(out_dir) if resume else None
    if manifest is not None and manifest["params_hash"] != cfg.params_hash():
        raise ValueError(
            f"existing index at {out_dir} was built with different params "
            f"({manifest['params_hash']} != {cfg.params_hash()}); "
            "pass resume=False to rebuild")
    if manifest is not None and manifest.get("shard_windows") != shard_windows:
        raise ValueError(
            f"existing index at {out_dir} uses shard_windows="
            f"{manifest.get('shard_windows')}, not {shard_windows}")
    completed = set(manifest["completed_sources"]) if manifest else set()
    completed_shards = (manifest or {}).get("completed_shards") or {}
    done_keys = {f"{s}\x00{k}" for s, ks in completed_shards.items()
                 for k in ks}

    if shard_windows is not None:
        # shard-level cleanup: any (source, shard) dir not recorded
        # complete is a crashed-run leftover
        for sdir in (out / PARTITIONS).glob("source=*"):
            src = sdir.name.split("=", 1)[1]
            for shdir in sdir.glob("shard=*"):
                k = int(shdir.name.split("=", 1)[1])
                if f"{src}\x00{k}" not in done_keys:
                    shutil.rmtree(shdir)
        todo = None  # the row filter below prunes completed shards
    elif completed:
        # source discovery only needed to prune a resumed build (projection
        # is pushed into the parquet read; a fresh build skips this job)
        all_sources = sorted(ds.select_columns(["source"]).unique("source"))
        todo = [s for s in all_sources if s not in completed]
    else:
        todo = None  # fresh build: everything, no discovery pass
    if todo is None or todo:
        # clear partial leftovers from a crashed run for the todo sources
        if shard_windows is None:
            for s in (todo or []):
                leftover = out / PARTITIONS / f"source={s}"
                if leftover.exists():
                    shutil.rmtree(leftover)
        work = ds
        if shard_windows is None and completed:
            keep = pa.array(sorted(todo))
            work = work.map_batches(
                lambda t: t.filter(pc.is_in(t["source"], value_set=keep)),
                batch_format="pyarrow")
        chain = work.map_batches(add_window_columns, batch_format="pyarrow",
                                 zero_copy_batch=True, fn_kwargs={"cfg": cfg})
        if shard_windows is not None and done_keys:
            done_arr = np.array(sorted(done_keys), dtype=object)

            def drop_done(t: pa.Table) -> pa.Table:
                keys = np.array(
                    [f"{s}\x00{w // shard_windows}" for s, w in
                     zip(t["source"].to_pylist(),
                         t["window_id"].to_numpy(zero_copy_only=False))],
                    dtype=object)
                return t.filter(pa.array(~np.isin(keys, done_arr)))

            chain = chain.map_batches(drop_done, batch_format="pyarrow")
        partials = (
            chain
            .map_batches(PartialSketchBuilder, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=batch_size,
                         fn_constructor_kwargs={"cfg": cfg},
                         concurrency=concurrency, num_cpus=num_cpus)
        ).materialize()  # pin partials: consumed by the key check + finalize
        policy = None
        if cfg.policy_quantile is not None:
            policy = {"quantile": cfg.policy_quantile,
                      "conf": cfg.policy_conf, "fp": cfg.fp,
                      "max_depth": cfg.window_bits}
        # duplicate-key check without a shuffle: each block's partial keys
        # are unique BY CONSTRUCTION (the builder groups per batch), so a
        # window can only be duplicated ACROSS blocks — detectable from
        # per-block (min, max) key ranges, O(#blocks) driver rows. With
        # window-aligned batches the ranges are disjoint and the payload
        # shuffle is skipped entirely.
        def block_key_range(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return pa.table({"min_key": pa.array([], pa.string()),
                                 "max_key": pa.array([], pa.string()),
                                 "dup_free": pa.array([], pa.bool_())})
            keys = sorted(f"{s}\x00{w:020d}" for s, w in
                          zip(t["source"].to_pylist(),
                              t["window_id"].to_pylist()))
            dup_free = all(a < b for a, b in zip(keys, keys[1:]))
            return pa.table({"min_key": pa.array([keys[0]]),
                             "max_key": pa.array([keys[-1]]),
                             "dup_free": pa.array([dup_free])})

        ranges = (partials.select_columns(["source", "window_id"])
                  .map_batches(block_key_range, batch_format="pyarrow")
                  .to_pandas())
        if not len(ranges):
            disjoint = None          # fully-complete resume: nothing new
        else:
            ranges = ranges.sort_values("min_key")
            disjoint = bool(ranges["dup_free"].all()) and all(
                a < b for a, b in zip(ranges["max_key"].iloc[:-1],
                                      ranges["min_key"].iloc[1:]))
        if disjoint is None:
            merged = None
        elif disjoint:
            merged = partials.map_batches(
                finalize_unique_partials, batch_format="pandas",
                fn_kwargs={"params_hash": cfg.params_hash(),
                           "policy": policy})
        else:
            merged = partials.groupby(["source", "window_id"]).map_groups(
                merge_partials_group, batch_format="pandas",
                fn_kwargs={"params_hash": cfg.params_hash(),
                           "policy": policy})
        if merged is not None:
            part_cols = (["source"] if shard_windows is None
                         else ["source", "shard"])
            if shard_windows is not None:
                merged = merged.map_batches(
                    lambda df: df.assign(
                        shard=(df["window_id"] // shard_windows).astype(
                            "int64")),
                    batch_format="pandas")
            merged.write_parquet(str(out / PARTITIONS),
                                 partition_cols=part_cols, mode="append")

    manifest = _write_manifest(out, cfg, completed, shard_windows,
                               round(time.perf_counter() - t0, 3))
    if super_levels:
        from .super_index import build_super_index
        manifest["super"] = build_super_index(out_dir, cfg)
    return manifest


def _write_manifest(out: Path, cfg: HbiConfig, completed: set,
                    shard_windows: int | None, build_seconds: float,
                    keep_shards: dict[str, list[int]] | None = None) -> dict:
    """Lineage + per-source metrics read back from the partitions.

    ``keep_shards``: pre-expiry shard-completion state to preserve —
    expiry deletes data but must NOT un-complete the expired ranges, or a
    later ``build_index(resume=True)`` over the same input would silently
    re-ingest (resurrect) them.
    """
    import pandas as pd

    pdir = out / PARTITIONS
    if pdir.exists() and any(pdir.rglob("*.parquet")):
        stats = pq.read_table(
            str(pdir),
            columns=["source", "window_id", "n_docs", "n_tokens",
                     "index_bytes"])
        df = stats.to_pandas()
    else:
        # every window expired (or nothing built yet): an empty, correctly
        # typed frame keeps the manifest write total-zero instead of
        # crashing after the data is already gone
        df = pd.DataFrame({"source": pd.Series([], dtype=object),
                           "window_id": pd.Series([], dtype="int64"),
                           "n_docs": pd.Series([], dtype="int64"),
                           "n_tokens": pd.Series([], dtype="int64"),
                           "index_bytes": pd.Series([], dtype="int64")})
    per_source: dict[str, dict] = {}
    df["source"] = df["source"].astype(str)
    for s, g in df.groupby("source"):
        per_source[s] = {
            "windows": int(g["window_id"].nunique()),
            "n_docs": int(g["n_docs"].sum()),
            "n_tokens": int(g["n_tokens"].sum()),
            "index_bytes": int(g["index_bytes"].sum()),
        }
    manifest = {
        "format_version": FORMAT_VERSION,
        "params_hash": cfg.params_hash(),
        "config": cfg.to_json(),
        "completed_sources": sorted(set(per_source) | completed),
        "shard_windows": shard_windows,
        "sources": per_source,
        "built_unix": time.time(),
        "build_seconds": build_seconds,
        "total_windows": int(df["window_id"].count()),
        "total_docs": int(df["n_docs"].sum()),
        "total_tokens": int(df["n_tokens"].sum()),
        "total_index_bytes": int(df["index_bytes"].sum()),
    }
    if shard_windows is not None:
        shards = {
            s: set((g["window_id"] // shard_windows).unique().tolist())
            for s, g in df.groupby("source")}
        for s, ks in (keep_shards or {}).items():
            shards.setdefault(s, set()).update(int(k) for k in ks)
        manifest["completed_shards"] = {
            s: sorted(ks) for s, ks in sorted(shards.items())}
    (out / MANIFEST).write_text(json.dumps(manifest, indent=2))
    return manifest


def expire_windows(out_dir: str, cfg: HbiConfig, *, before_window: int,
                   super_levels: bool = True) -> dict:
    """Retention at rest — the reference's sliding-window expiry
    (``PMIndex/HBI.java`` tree rollover) applied to the persisted index:
    drop every index row whose ``window_id < before_window``; returns the
    refreshed manifest.

    Sharded layout (``build_index(shard_windows=K)``): shard dirs wholly
    below the cutoff just UNLINK (O(expired shards), no data rewrite);
    only the single boundary shard per source rewrites. Unsharded layout:
    per-source filter-rewrite. The super store rebuilds from the
    remaining window roots; queries never see expired windows (the same
    result as ``window_range=(before_window, inf)`` on the full index).
    """
    import time as _t

    t0 = _t.perf_counter()
    out = Path(out_dir)
    manifest = load_manifest(out_dir)
    if manifest is None:
        raise ValueError(f"no index at {out_dir}")
    if manifest["params_hash"] != cfg.params_hash():
        raise ValueError("config mismatch with the existing index")
    shard_windows = manifest.get("shard_windows")

    def rewrite_filtered(target: Path) -> None:
        """Keep only rows with window_id >= cutoff in one partition dir."""
        files = sorted(target.rglob("*.parquet"))
        for f in files:
            t = pq.read_table(str(f))
            keep = pc.greater_equal(t["window_id"], before_window)
            kept = t.filter(keep)
            if kept.num_rows == t.num_rows:
                continue
            if kept.num_rows == 0:
                f.unlink()
            else:
                pq.write_table(kept, str(f))
        if not any(target.rglob("*.parquet")):
            shutil.rmtree(target)

    for sdir in sorted((out / PARTITIONS).glob("source=*")):
        if shard_windows is not None:
            for shdir in sorted(sdir.glob("shard=*")):
                k = int(shdir.name.split("=", 1)[1])
                hi = (k + 1) * shard_windows
                lo = k * shard_windows
                if hi <= before_window:
                    shutil.rmtree(shdir)        # wholly expired: unlink
                elif lo < before_window:
                    rewrite_filtered(shdir)     # boundary shard only
            if not any(sdir.rglob("*.parquet")):
                shutil.rmtree(sdir)
        else:
            rewrite_filtered(sdir)

    # completion state survives expiry: the expired ranges were BUILT —
    # deleting their data must not invite a resumed build to re-ingest them
    manifest = _write_manifest(
        out, cfg, set(manifest.get("completed_sources") or []),
        shard_windows, round(_t.perf_counter() - t0, 3),
        keep_shards=manifest.get("completed_shards"))
    manifest["expired_before_window"] = before_window
    (out / MANIFEST).write_text(json.dumps(manifest, indent=2))
    if super_levels and (out / "super").exists():
        if manifest["total_windows"] == 0:
            shutil.rmtree(out / "super")    # nothing left to summarize
            manifest["super"] = None
        else:
            from .super_index import build_super_index
            manifest["super"] = build_super_index(out_dir, cfg)
    return manifest


def _snapshot_paths(out_dir: str, manifest: dict) -> list[str] | None:
    """Parquet files belonging to the manifest's COMPLETED state, listed
    NOW: completed (source, shard) dirs for sharded indexes, completed
    source dirs otherwise. Files inside those dirs are immutable once the
    manifest records them (appends create new shard dirs; unsharded
    resume only writes into dirs of sources absent from
    ``completed_sources``), so the returned list is a consistent
    snapshot. None when nothing is completed yet."""
    from urllib.parse import unquote

    root = Path(out_dir) / PARTITIONS
    shards = manifest.get("completed_shards")
    paths: list[str] = []
    if shards:
        for s, ks in shards.items():
            for k in ks:
                d = root / f"source={s}" / f"shard={k}"
                if d.is_dir():
                    paths.extend(sorted(str(p)
                                        for p in d.glob("*.parquet")))
        return paths or None
    done = set(manifest.get("completed_sources") or [])
    if not done:
        return None
    for d in sorted(root.glob("source=*")):
        if unquote(d.name.split("=", 1)[1]) in done:
            paths.extend(sorted(str(p) for p in d.rglob("*.parquet")))
    return paths or None


def load_index(out_dir: str, columns: list[str] | None = None, *,
               snapshot: bool = True) -> "rd.Dataset":
    """The persisted index as a Dataset (hive partition col `source`
    restored as a string column).

    ``snapshot=True`` (default) pins the read to the manifest's completed
    partition list resolved at CALL time — the reference's
    query-during-ingest contract (``ProcessStream.java:70-75``) for the
    batch world: a query planned against this Dataset sees exactly the
    windows the manifest recorded, even if a concurrent ``build_index``
    append lands new shards (new files) before the lazy read executes,
    and it can never observe a half-written in-flight file (those live
    only in dirs the manifest does not list yet). Concurrent
    ``expire_windows`` is NOT isolated: it unlinks shard dirs, so a
    pinned query started before the expiry fails loudly (missing file)
    rather than returning partial data. ``snapshot=False`` reads
    whatever is on disk at execution time."""
    if snapshot:
        man = load_manifest(out_dir)
        if man is not None:
            paths = _snapshot_paths(out_dir, man)
            if paths:
                from ray.data.datasource.partitioning import Partitioning
                return rd.read_parquet(
                    paths, columns=columns,
                    partitioning=Partitioning(
                        "hive", base_dir=str(Path(out_dir) / PARTITIONS)))
    return rd.read_parquet(str(Path(out_dir) / PARTITIONS), columns=columns)


def index_fpr_stats(out_dir: str) -> "rd.Dataset":
    """Bloom health of a persisted index, per (source, level): window
    count, mean set-bit fill and mean fill-based point-FPR estimate
    rho^k (the reference's empirical check,
    ``membership/BloomFilter.java:52-59``). Map-side partial sums per
    batch -> tiny groupby over #sources x #levels rows; the realized
    FPR must sit at or below the configured ``fp`` (pinned in pytest)."""
    import pickle

    import pandas as pd

    from ..state import sketch_from_bytes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        src_l, lv_l, n_l, fill_l, fpr_l = [], [], [], [], []
        for src, blob in zip(batch["source"], batch["bloom_tree"]):
            if blob is None:
                continue
            tree = pickle.loads(blob)
            if not isinstance(tree, dict):
                continue
            for lv, b in tree.items():
                if b is None:
                    continue
                bf = sketch_from_bytes(b)
                src_l.append(str(src))
                lv_l.append(int(lv))
                n_l.append(1)
                fill_l.append(bf.fill_ratio)
                fpr_l.append(bf.fp_rate())
        df = pd.DataFrame({"source": src_l, "level": lv_l,
                           "n_windows": n_l, "fill_sum": fill_l,
                           "fpr_sum": fpr_l})
        return df.groupby(["source", "level"], as_index=False).sum()

    from ray.data.aggregate import Sum

    def finish(t) -> "pd.DataFrame":
        t = t.copy()
        t["mean_fill"] = t["fill_sum"] / t["n_windows"]
        t["mean_fpr"] = t["fpr_sum"] / t["n_windows"]
        return t[["source", "level", "n_windows", "mean_fill",
                  "mean_fpr"]]

    return (load_index(out_dir, columns=["source", "bloom_tree"])
            .map_batches(partial, batch_format="pandas")
            .groupby(["source", "level"])
            .aggregate(Sum("n_windows", alias_name="n_windows"),
                       Sum("fill_sum", alias_name="fill_sum"),
                       Sum("fpr_sum", alias_name="fpr_sum"))
            .map_batches(finish, batch_format="pandas"))
