"""Per-stage resource sizing helpers (single place for pool defaults)."""

from __future__ import annotations

import ray


def default_concurrency(reserve: int = 2, cap: int | None = None) -> int:
    """Actor-pool size: cluster CPUs minus a reserve for the read/write
    stages (a pool that takes every CPU starves the pipeline; see the Ray
    Data docs on actor-pool sizing)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = max(2, cpus - reserve)
    if cap is not None:
        n = min(n, cap)
    return n
