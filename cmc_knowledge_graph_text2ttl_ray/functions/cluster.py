"""Small cluster-sizing helpers shared across pipelines."""

from __future__ import annotations

__all__ = ["default_join_partitions"]


def default_join_partitions(divisor: int = 4, floor: int = 2) -> int:
    """Join/aggregator partition count derived from the cluster: each
    ``ds.join`` spawns one HashShuffleAggregator actor per partition, so
    the pool must stay well under the CPU count or it starves the rest of
    the pipeline (observed deadlocks on small clusters)."""
    import ray

    return max(floor, int(ray.cluster_resources().get("CPU", 8)) // divisor)
