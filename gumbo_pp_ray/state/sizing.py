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


def default_concurrency(reserve: int = 2, floor: int = 2) -> tuple:
    """Autoscaling pool bounds ``(1, cpus - reserve)``.

    A FIXED pool reserves its CPUs for the pipeline's lifetime; two
    fixed pools in one pipeline can reserve every core and starve the
    read/shuffle tasks — observed as a hard livelock (idle-worker
    SIGTERM → lost blocks → unsatisfiable re-execution). Autoscaling
    from 1 lets the scheduler grow pools only when capacity exists.
    Keep at most ONE actor pool per pipeline where possible; stateless
    stages should be plain functions.
    """
    return (1, default_pool_size(reserve, floor))
