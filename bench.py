"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

``--scaling`` runs the same bench in two fresh subprocesses
(RAY_GRAFT_CPUS=8 and =32) and reports both throughputs + scaling
efficiency (the sandbox substitute for the N vs 4N cluster criterion —
BASELINE.md "Scaling-evidence protocol").
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42


def _sf() -> float:
    name = Path(SF_DIR).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


def synth_rows() -> int:
    env = os.environ.get("GRAFT_SYNTH_ROWS")
    if env:
        return int(env)
    return max(2_000, int(2_000_000 * _sf()))


def bench_config():
    from hierarchical_bloom_filter_index_ray import HbiConfig

    return HbiConfig(seed=SEED, docs_per_window=256, fp=0.01, ngram=1,
                     hll_p=12, cms_eps=0.02, cms_delta=0.05,
                     expected_tokens_per_doc=128,
                     expected_distinct_per_doc=96)


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from hierarchical_bloom_filter_index_ray.functions import hash_words
    from hierarchical_bloom_filter_index_ray.pipelines import (
        build_index, distinct_tokens, heavy_hitters, load_index,
        membership_query, minhash_lsh_pairs, ntok_quantiles)
    from hierarchical_bloom_filter_index_ray.pipelines.text import \
        sequences_table
    from hierarchical_bloom_filter_index_ray.sources import synth_sequences

    cfg = bench_config()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- synth corpus: generate once to parquet (untimed; also warms cache)
    n_rows = synth_rows()
    synth_path = f"/tmp/hbi_bench_synth_{SEED}_{n_rows}"
    if not Path(synth_path).exists():
        tmp = synth_path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        synth_sequences(n_rows, seed=SEED, n_sources=8, vocab=131072,
                        ).write_parquet(tmp)
        os.rename(tmp, synth_path)
    warm = rd.read_parquet(synth_path).count()  # warm page cache (untimed)

    # -- headline: sketch-index build over the pre-tokenized synth corpus
    idx_dir = "/tmp/hbi_bench_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    man = build_index(rd.read_parquet(synth_path), cfg, idx_dir,
                      batch_size=2048)
    timings["build_synth"] = time.perf_counter() - t0
    extras["synth_rows"] = warm
    extras["synth_tokens"] = man["total_tokens"]
    extras["build_tokens_per_sec"] = man["total_tokens"] / \
        timings["build_synth"]

    # -- build over the tokenized driver documents table
    docs_dir = "/tmp/hbi_bench_docs_index"
    shutil.rmtree(docs_dir, ignore_errors=True)
    t0 = time.perf_counter()
    man_docs = build_index(sequences_table(SF_DIR, seed=SEED), cfg, docs_dir,
                           batch_size=1024)
    timings["build_docs"] = time.perf_counter() - t0
    extras["docs_tokens"] = man_docs["total_tokens"]

    # -- membership query QPS over the synth index (present + missing)
    rng = np.random.default_rng(7)
    head = rd.read_parquet(synth_path).take(32)
    queries = []
    for i, row in enumerate(head):
        toks = row["tokens"]
        start = int(rng.integers(0, max(1, len(toks) - 3)))
        queries.append((f"present{i}", [int(t) for t in
                                        toks[start:start + 3]]))
    for i in range(32):
        queries.append((f"missing{i}", [int(2**30 + i), int(2**30 + i + 1)]))
    idx = load_index(idx_dir)
    seqs = rd.read_parquet(synth_path)
    t0 = time.perf_counter()
    hits = membership_query(idx, seqs, queries, cfg)
    timings["query_membership"] = time.perf_counter() - t0
    extras["membership_qps"] = len(queries) / timings["query_membership"]
    extras["membership_hits"] = hits.num_rows

    # -- sketch-estimate queries over the synth corpus
    ds = rd.read_parquet(synth_path)
    t0 = time.perf_counter()
    distinct_tokens(ds, cfg, by_source=True)
    timings["hll_distinct"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    heavy_hitters(rd.read_parquet(synth_path), cfg, k=20)
    timings["cms_heavy_hitters"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    ntok_quantiles(rd.read_parquet(synth_path), cfg)
    timings["ntok_quantiles"] = time.perf_counter() - t0

    # -- near-dup pass over the documents-derived sequences
    t0 = time.perf_counter()
    minhash_lsh_pairs(sequences_table(SF_DIR, seed=SEED), cfg,
                      threshold=0.6)
    timings["minhash_lsh"] = time.perf_counter() - t0

    total = sum(timings.values())
    print(json.dumps({
        "metric": "hbi_ray_build_query_bench",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": _sf(),
        "num_cpus": NUM_CPUS,
        **{k: round(v, 3) if isinstance(v, float) else v
           for k, v in extras.items()},
    }))
    ray.shutdown()


def scaling() -> None:
    """Same job at 8 and 32 CPUs in fresh processes; efficiency =
    (T8/T32)/4 on the headline build."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results[8]["queries"]["build_synth"]
    t32 = results[32]["queries"]["build_synth"]
    tot8, tot32 = results[8]["value"], results[32]["value"]
    print(json.dumps({
        "metric": "hbi_ray_scaling",
        "sec_8": tot8, "sec_32": tot32,
        "build_sec_8": t8, "build_sec_32": t32,
        "build_tps_8": results[8]["build_tokens_per_sec"],
        "build_tps_32": results[32]["build_tokens_per_sec"],
        "scaling_efficiency_build": round((t8 / t32) / 4, 3),
        "scaling_efficiency_total": round((tot8 / tot32) / 4, 3),
        "sf": results[32]["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
