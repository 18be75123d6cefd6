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


def stat_aggs(numeric_cols: list[str], all_cols: list[str]) -> list:
    """The wide aggregate-expression list — exposed so callers (the suite
    runner) can FUSE other algebraic aggregates (histogram bin counts) into
    the same single-pass job instead of scanning the table again."""
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
    return aggs


def tall_stats_from_wide(
    wide_row: dict, numeric_cols: list[str], all_cols: list[str]
) -> list[dict]:
    """Driver-side reshape of one wide aggregate row into per-column tall
    dicts (mirrors the struct-explode in ``column_stats``) — used on
    already-collected wide rows so the fused runner job reshapes without a
    second Spark job."""
    n_rows = wide_row["n_rows"]
    out = []
    for c in all_cols:
        is_num = c in numeric_cols
        out.append(
            {
                "column": c,
                "min": wide_row.get(f"{c}__min") if is_num else None,
                "max": wide_row.get(f"{c}__max") if is_num else None,
                "mean": wide_row.get(f"{c}__mean") if is_num else None,
                "stddev": wide_row.get(f"{c}__stddev") if is_num else None,
                "null_rate": (wide_row[f"{c}__nulls"] / n_rows) if n_rows else None,
                "n_rows": n_rows,
            }
        )
    return out


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

    aggs = stat_aggs(numeric_cols, all_cols)
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
