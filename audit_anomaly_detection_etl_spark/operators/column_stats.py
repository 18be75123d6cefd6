"""Per-column statistics in a single aggregation pass.

North-rule check #1: min/max/mean/stddev/null-rate per column via DataFrame
aggregates. Reference analogues: the grouped mean/std/median transforms
(SURVEY.md A2-A5, data_processing/nodes.py:104-148) and the NaN-count logging
(features_engineering/nodes.py:556-557).

Scale notes:
- ONE ``groupBy`` pass computes every stat for every column — at 10^12 rows
  the input scan dominates, so never run one job per column.
- All aggregates are algebraic (partial + final hash agg; map-side combine),
  so the shuffle carries one row per (group, column-stat) regardless of input
  size.
- ``stddev`` is the *sample* stddev, matching pandas ``std()`` in the
  reference (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    numeric_cols: list[str],
    all_cols: list[str] | None = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Tall stats table: one row per (group..., column) with
    min/max/mean/stddev/null_rate/n_rows.

    ``numeric_cols`` get the full stat set; remaining ``all_cols`` get null
    rates only (strings/binary have no mean). Output is tall so downstream
    constraint predicates (e.g. ``null_rate <= 0.01``) are data, not code.
    """
    all_cols = all_cols or numeric_cols
    gb = group_by or []

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in all_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
    for c in numeric_cols:
        aggs.extend(
            [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__stddev"),
            ]
        )
    wide = df.groupBy(*gb).agg(*aggs) if gb else df.groupBy().agg(*aggs)

    # unpivot to tall without a second shuffle: one struct per column, explode
    structs = []
    for c in all_cols:
        is_num = c in numeric_cols
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                (F.col(f"{c}__min") if is_num else F.lit(None).cast("double")).alias("min"),
                (F.col(f"{c}__max") if is_num else F.lit(None).cast("double")).alias("max"),
                (F.col(f"{c}__mean") if is_num else F.lit(None).cast("double")).alias("mean"),
                (F.col(f"{c}__stddev") if is_num else F.lit(None).cast("double")).alias("stddev"),
                (F.col(f"{c}__nulls") / F.col("n_rows")).alias("null_rate"),
            )
        )
    exploded = wide.select(
        *gb, F.col("n_rows"), F.explode(F.array(*structs)).alias("s")
    ).select(*gb, "s.column", "s.min", "s.max", "s.mean", "s.stddev", "s.null_rate", "n_rows")
    return exploded
