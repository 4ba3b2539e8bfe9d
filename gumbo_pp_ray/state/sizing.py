"""Actor-pool sizing from live cluster resources.

A pool that reserves every CPU starves the read/write/shuffle stages
and serializes the pipeline (ray_guide: size concurrency x num_cpus to
the node ALONGSIDE the other stages) — default leaves 2 CPUs free.
"""

from __future__ import annotations

import ray


def default_pool_size(reserve: int = 2, floor: int = 2) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:       # not initialised (pure-local unit tests)
        cpus = 4
    return max(floor, cpus - reserve)
