"""Small cluster-sizing helpers shared across pipelines."""

from __future__ import annotations

__all__ = ["default_join_partitions", "default_coarse_partitions"]


def default_join_partitions(divisor: int = 4, floor: int = 2) -> int:
    """Join/aggregator partition count derived from the cluster: each
    ``ds.join`` spawns one HashShuffleAggregator actor per partition, so
    the pool must stay well under the CPU count or it starves the rest of
    the pipeline (observed deadlocks on small clusters)."""
    import ray

    return max(floor, int(ray.cluster_resources().get("CPU", 8)) // divisor)


def default_coarse_partitions(n_rows: int, rows_per_part: int = 200_000,
                              floor: int | None = None) -> int:
    """Coarse-partition count for groupby().map_groups self-merge stages
    (MinHash/SimHash candidate generation): each partition is processed by
    ONE task, so the count must grow with the data — a constant means a
    task holding n_rows/constant rows, linear in corpus size (round-2
    verdict). Floor = cluster CPUs so small inputs still use every core."""
    import ray

    if floor is None:
        floor = max(2, int(ray.cluster_resources().get("CPU", 8)))
    return max(floor, -(-int(n_rows) // rows_per_part))
