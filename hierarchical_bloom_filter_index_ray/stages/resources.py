"""Per-stage resource sizing helpers (single place for pool defaults)."""

from __future__ import annotations

import ray


def default_concurrency(reserve: int = 2, cap: int | None = None) -> int:
    """Actor-pool size: cluster CPUs minus a reserve for the read/write
    stages (a pool that takes every CPU starves the pipeline; see the Ray
    Data docs on actor-pool sizing).

    Never returns >= the CPU count: on a 2-cpu session ``max(2, cpus -
    reserve)`` handed BOTH cpus to the pool and the upstream read never
    got a slot — the build wedged at 0 blocks for 40+ minutes (found by
    the round-4 2-vs-8 scaling run)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = max(1, min(cpus - 1, max(2, cpus - reserve)))
    if cap is not None:
        n = min(n, cap)
    return n
