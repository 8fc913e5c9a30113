"""Cluster-sized actor-pool bounds, shared by every stateful stage.

The round-1 lesson (CLAUDE.md): a FIXED pool of k actors on a node with ~k
CPUs starves Ray Data's upstream read tasks of CPU and the stream deadlocks
silently.  The round-2 lesson (VERDICT): fixed (1, 4) pools cap the
ANN/dedup/encode stages at 4 actors no matter how big the cluster is.  The
answer to both: autoscaling (min, max) bounds derived from
``ray.cluster_resources()`` at pipeline-build time — max = frac × cluster
CPUs, min pre-warms half the pool (ramp-up timing otherwise swings wall
time ~25% on the scaling leg) while the sum of minimums stays well under
the CPU count so read tasks never starve.
"""

from __future__ import annotations

__all__ = ["auto_pool"]


def auto_pool(
    configured: int | tuple[int, int] | None = None, frac: float = 0.5,
) -> int | tuple[int, int]:
    """Resolve an actor-pool ``concurrency`` argument.

    ``configured`` is returned untouched when given (explicit caller
    choice); ``None`` sizes the pool to the cluster: max = ``frac`` ×
    cluster CPUs (≥2), min = half of max."""
    if configured is not None:
        return configured
    try:
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:
        cpus = 8
    hi = max(2, int(cpus * frac))
    return (max(1, hi // 2), hi)
