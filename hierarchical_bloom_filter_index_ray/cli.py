"""Job entrypoints for running the library under ``ray job submit``.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m hierarchical_bloom_filter_index_ray build \
        --input s3://corpus/sequences --out s3://indexes/run1 \
        --docs-per-window 4096 --fp 0.01 --shard-windows 64

    ray job submit --working-dir . -- \
        python -m hierarchical_bloom_filter_index_ray query \
        --index s3://indexes/run1 --sequences s3://corpus/sequences \
        --queries queries.json --out hits.parquet

The CLI owns the Ray session (``ray.init`` guarded on
``ray.is_initialized`` — under ``ray job submit`` the runtime
pre-initializes and the guard makes this a no-op); the library itself
never calls ``ray.init`` (driver contract).
"""

from __future__ import annotations

import argparse
import json


def _ensure_ray(address: str | None = None) -> None:
    """Own the Ray session. ``address`` comes from the real ``--address``
    CLI option (``auto`` to join an existing cluster, e.g. under
    ``ray job submit``; default ``local``) — it is threaded through the
    parsed namespace, so programmatic ``main(argv=...)`` calls work too."""
    import ray
    if not ray.is_initialized():
        ray.init(address=address or "local", include_dashboard=False,
                 ignore_reinit_error=True)


def _cfg_from_args(a: argparse.Namespace):
    from .config import HbiConfig
    return HbiConfig(seed=a.seed, docs_per_window=a.docs_per_window,
                     fp=a.fp, ngram=a.ngram, hll_p=a.hll_p,
                     cms_eps=a.cms_eps, cms_delta=a.cms_delta)


def _read_input(a: argparse.Namespace):
    """--format selects the ingest path; everything lands on the
    north-rule sequences shape before the build."""
    import ray.data as rd

    from .functions.tokenize import tokenize_documents
    from .sources import (read_documents_csv, read_documents_jsonl,
                          read_documents_text, segment_sequences)
    if a.format == "sequences":
        ds = rd.read_parquet(a.input)
    else:
        if a.format == "text":
            docs = read_documents_text(a.input, mode=a.text_mode)
        elif a.format == "jsonl":
            docs = read_documents_jsonl(a.input, text_col=a.text_col,
                                        id_col=a.id_col,
                                        source_col=a.source_col)
        elif a.format == "csv":
            docs = read_documents_csv(a.input, text_col=a.text_col,
                                      id_col=a.id_col,
                                      source_col=a.source_col)
        else:
            raise ValueError(f"unknown --format {a.format!r}")
        ds = docs.map_batches(tokenize_documents, batch_format="pyarrow",
                              fn_kwargs={"seed": a.seed})
    if a.seg_len:
        ds = segment_sequences(ds, seg_len=a.seg_len)
    return ds


def cmd_build(a: argparse.Namespace) -> int:
    from .pipelines import build_index
    _ensure_ray(a.address)
    ds = _read_input(a)
    man = build_index(ds, _cfg_from_args(a), a.out,
                      batch_size=a.batch_size,
                      shard_windows=a.shard_windows,
                      super_levels=not a.no_super)
    print(json.dumps({"out": a.out,
                      "total_tokens": man["total_tokens"],
                      "total_windows": man["total_windows"],
                      "build_seconds": man["build_seconds"]}))
    return 0


def _cfg_for_index(a: argparse.Namespace):
    """Query must probe with the EXACT config the index was built with;
    prefer the manifest's stored config over re-typed CLI args."""
    from pathlib import Path
    man = Path(a.index) / "manifest.json"
    if man.exists():
        stored = json.loads(man.read_text()).get("config")
        if stored is not None:
            from .config import HbiConfig
            return HbiConfig.from_json(stored)
    return _cfg_from_args(a)


def cmd_query(a: argparse.Namespace) -> int:
    import ray.data as rd

    from .pipelines import load_index, membership_query
    _ensure_ray(a.address)
    cfg = _cfg_for_index(a)
    queries = [(q["id"], [int(t) for t in q["tokens"]])
               for q in json.loads(open(a.queries).read())]
    hits = membership_query(load_index(a.index),
                            rd.read_parquet(a.sequences), queries, cfg,
                            super_dir=a.index, with_counts=a.counts,
                            probe_distinct=a.probe_distinct)
    import pyarrow.parquet as pq
    pq.write_table(hits, a.out)
    print(json.dumps({"out": a.out, "hits": hits.num_rows,
                      "queries": len(queries)}))
    return 0


def _add_cfg_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--address", default=None,
                   help="Ray address ('auto' joins an existing cluster; "
                        "default: local single-node session)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--docs-per-window", type=int, default=256)
    p.add_argument("--fp", type=float, default=0.01)
    p.add_argument("--ngram", type=int, default=1)
    p.add_argument("--hll-p", type=int, default=12)
    p.add_argument("--cms-eps", type=float, default=0.02)
    p.add_argument("--cms-delta", type=float, default=0.05)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hierarchical_bloom_filter_index_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the hierarchical sketch index")
    b.add_argument("--input", required=True,
                   help="parquet dir of (doc_id, tokens, n_tok, source), "
                        "or raw files per --format")
    b.add_argument("--out", required=True)
    b.add_argument("--format", default="sequences",
                   choices=["sequences", "text", "jsonl", "csv"],
                   help="input format (non-sequences inputs are tokenized "
                        "with --seed)")
    b.add_argument("--text-mode", default="line", choices=["line", "file"],
                   help="text format: one doc per line or per file")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default=None)
    b.add_argument("--source-col", default=None)
    b.add_argument("--seg-len", type=int, default=None,
                   help="split each doc into fixed-length token segments")
    b.add_argument("--batch-size", type=int, default=2048)
    b.add_argument("--shard-windows", type=int, default=None,
                   help="window-range resume shard size (windows/shard)")
    b.add_argument("--no-super", action="store_true",
                   help="skip the cross-window super-level store")
    _add_cfg_args(b)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="batch membership queries")
    q.add_argument("--index", required=True)
    q.add_argument("--sequences", required=True)
    q.add_argument("--queries", required=True,
                   help='JSON list of {"id": ..., "tokens": [...]}')
    q.add_argument("--out", required=True)
    q.add_argument("--counts", action="store_true",
                   help="include per-(query, doc) occurrence counts")
    q.add_argument("--probe-distinct", action="store_true",
                   help="probe nodes with distinct pattern keys only "
                        "(fewer probes for repeated-token patterns, "
                        "identical results)")
    _add_cfg_args(q)
    q.set_defaults(fn=cmd_query)

    a = ap.parse_args(argv)
    return a.fn(a)


if __name__ == "__main__":
    raise SystemExit(main())
