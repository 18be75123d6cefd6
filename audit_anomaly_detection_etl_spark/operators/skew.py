"""Hot-key skew audit: find the join/group keys that would dominate a
shuffle task, and size the salting fan-out that fixes them.

The north rule requires skew from long-duration clips to be "handled via
salting and AQE skew-join splitting". AQE only fixes skew it can SEE —
oversized shuffle *partitions* at runtime (spark.sql.adaptive.skewJoin.
skewedPartitionFactor, default 5x the median partition). A single hot KEY
inside a partition is invisible to AQE's splitter for aggregations: all rows
of one key must meet in one task. This audit is the planning-side
counterpart: one pass over the detail table to (key, count), then flag keys
whose row count exceeds ``skew_factor`` x the mean rows-per-key, and report
``salt_buckets = ceil(count / mean)`` — the number of salt shards that
restores that key's groups to ~mean size (the same two-phase trick
uniqueness.duplicate_keys already applies unconditionally).

Scale shape: the detail table reduces to one row per distinct key (two-phase
hash agg, map-side combine); the (tot, nkeys) stats row is a broadcast
crossJoin back onto the counts — no second detail scan (the counts subtree
feeds both and is pinned with a lazy localCheckpoint), no window, no sort.
Output is bounded: only keys beyond the threshold are emitted.

Reference analogue: the duplicate-concentration report
(data_processing/nodes.py duplicated-id counts) — generalized from "key
appears more than once" to "key is heavy enough to break a task".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    key_cols: list[str],
    skew_factor: float = 1.25,
) -> DataFrame:
    """Keys whose row count exceeds ``skew_factor * mean_rows_per_key``.

    Returns (key_cols..., n_rows, share, skew_ratio, salt_buckets), where
    ``share`` is the key's fraction of all rows, ``skew_ratio`` its count
    over the mean count, and ``salt_buckets`` the ceil of that ratio — the
    fan-out a salted repartition needs to even this key out.
    """
    counts = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    stats = counts.agg(
        F.sum("n").cast("double").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__nkeys"),
    )
    mean = F.col("__tot") / F.col("__nkeys")
    ratio = F.col("n").cast("double") / mean
    return (
        counts.crossJoin(F.broadcast(stats))
        .where(F.col("n").cast("double") > F.lit(skew_factor) * mean)
        .select(
            *key_cols,
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("share"),
            F.round(ratio, 6).alias("skew_ratio"),
            F.ceil(ratio).cast("int").alias("salt_buckets"),
        )
    )
