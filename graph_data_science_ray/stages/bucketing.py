"""Adaptive hash-bucket sizing for the bucketed-combine pattern.

The repo's answer to Ray Data's slow multi-key sort-aggregate is
``groupby(bucket).map_groups(vectorized_combine)`` with a small hash-bucket
key (measured 10-40x wins, NOTES_r02).  A FIXED bucket count is a scale
hazard: each group task holds |rows|/B, so B must grow with the input
(round-2 VERDICT "What's wrong" #5).  Every site now derives B here:
``max(min_buckets, ceil(est_rows / target_rows_per_bucket))``, clamped.

``rows_if_cheap`` reads the Dataset's metadata row count (parquet
statistics, materialized block metadata) WITHOUT executing the pipeline and
returns None when the count would require execution — callers fall back to
``min_buckets`` (the round-2 behavior) or a caller-side estimate.
"""

from __future__ import annotations

from typing import Optional


def rows_if_cheap(ds) -> Optional[int]:
    """Row count from plan metadata only; None if it would need execution."""
    try:
        c = ds._meta_count()
        return int(c) if c is not None else None
    except Exception:
        return None


def adaptive_bucket_count(est_rows: Optional[int], *,
                          target_rows_per_bucket: int = 2_000_000,
                          min_buckets: int = 64,
                          max_buckets: int = 1 << 16) -> int:
    """Bucket count so one group task holds ~target_rows_per_bucket rows."""
    if est_rows is None or est_rows <= 0:
        return min_buckets
    need = -(-int(est_rows) // int(target_rows_per_bucket))  # ceil
    return max(min_buckets, min(max_buckets, need))


def sized_actor_pool(ncpu: int, est_rows: Optional[int], batch_size: int, *,
                     per_actor_batches: int = 6, cap: int = 16) -> int:
    """Actor-pool size for a stateful map_batches stage, capped by DATA, not
    just CPUs.  Each Python actor costs a fresh interpreter + imports
    (~100-500ms) per dataset execution; on a small input, a pool sized to
    the machine spends more wall time starting actors than computing
    (measured: 100k-row corpus extract 1.85s with 4 actors vs 3.29s with 16
    — round-5 scaling profile).  An actor only pays for itself when it owns
    several batches, so the pool is ``min(cpu_budget, ceil(batches /
    per_actor_batches))``.  At 100 TB `est_rows/batch_size` dwarfs any cpu
    budget and this reduces to the machine-sized pool."""
    budget = max(1, min(cap, ncpu // 2))
    if est_rows is None or est_rows <= 0:
        return budget
    batches = -(-int(est_rows) // int(batch_size))  # ceil
    return max(1, min(budget, -(-batches // per_actor_batches)))
