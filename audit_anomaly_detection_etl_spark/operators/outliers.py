"""Outlier-bound flags reproducing the reference's anomaly-flag semantics.

- ``sigma_bounds_flags``  : per-group mean +- k*stddev flag
  (SURVEY.md A3, data_processing/nodes.py:119-134, delta=2)
- ``iqr_bounds_flags``    : per-group median +- 1.5*IQR flag
  (SURVEY.md A4, data_processing/nodes.py:137-148)
- ``global_low_quantile_flag`` : dataset-wide Q1 - 1.5*IQR low-outlier flag
  (SURVEY.md A13, features_engineering/nodes.py:519-527)

Implementation choice: aggregate-then-broadcast-join rather than window
functions. A window ``partitionBy(group)`` shuffles the FULL detail table and
materializes per-partition state; the agg side here is one row per group, so
joining it back broadcast keeps the detail table un-shuffled (narrow) — the
same reasoning SURVEY.md J1 gives for replacing the reference's merge-backs.
Group semantics match pandas ``dropna=False``: null group keys form a group
(Spark's default).

Quantiles: exact ``percentile`` below (matches pandas linear interpolation);
at 10^12 rows swap ``exact=False`` to use ``approx_percentile`` with bounded
error — flags near the bound may differ, which tests must tolerate only in
approximate mode.

The join back is *null-safe* (``eqNullSafe``): a plain equi-join drops rows
whose group key is null, silently un-flagging the null group that pandas
``dropna=False`` keeps.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_bounds(df: DataFrame, bounds: DataFrame, group_cols: list[str]) -> DataFrame:
    renamed = bounds.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols],
        *[c for c in bounds.columns if c not in group_cols],
    )
    cond = reduce(
        lambda a, b: a & b, [df[c].eqNullSafe(renamed[f"__g_{c}"]) for c in group_cols]
    )
    return df.join(F.broadcast(renamed), cond, "left").drop(*[f"__g_{c}" for c in group_cols])


def sigma_bounds_flags(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 2.0,
    flag_col: str = "outside_sigma",
) -> DataFrame:
    v = F.col(value_col)
    bounds = df.groupBy(*group_cols).agg(
        (F.avg(v) - k * F.stddev_samp(v)).alias("__lo"),
        (F.avg(v) + k * F.stddev_samp(v)).alias("__hi"),
    )
    joined = _join_bounds(df, bounds, group_cols)
    flag = F.when(
        F.col("__lo").isNotNull() & v.isNotNull(), ~v.between(F.col("__lo"), F.col("__hi"))
    ).otherwise(F.lit(False))
    return joined.withColumn(flag_col, flag).drop("__lo", "__hi")


def iqr_bounds_flags(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 1.5,
    flag_col: str = "outside_iqr",
    exact: bool = True,
) -> DataFrame:
    v = F.col(value_col)
    q = (lambda p: F.percentile(v, F.lit(p))) if exact else (lambda p: F.approx_percentile(v, F.lit(p), F.lit(10000)))
    bounds = df.groupBy(*group_cols).agg(
        q(0.5).alias("__med"),
        (q(0.75) - q(0.25)).alias("__iqr"),
    )
    joined = _join_bounds(df, bounds, group_cols)
    lo = F.col("__med") - k * F.col("__iqr")
    hi = F.col("__med") + k * F.col("__iqr")
    flag = F.when(F.col("__med").isNotNull() & v.isNotNull(), ~v.between(lo, hi)).otherwise(
        F.lit(False)
    )
    return joined.withColumn(flag_col, flag).drop("__med", "__iqr")


def global_low_quantile_flag(
    df: DataFrame,
    value_col: str,
    k: float = 1.5,
    flag_col: str = "low_outlier",
    exact: bool = True,
) -> DataFrame:
    """Two-pass global flag: tiny 1-row agg cross-joined back (no collect on
    the hot path; Catalyst broadcasts the single row). Reference computes the
    same bound eagerly then flags (features_engineering/nodes.py:519-527).
    """
    v = F.col(value_col)
    q = (lambda p: F.percentile(v, F.lit(p))) if exact else (lambda p: F.approx_percentile(v, F.lit(p), F.lit(10000)))
    g = df.groupBy().agg(q(0.25).alias("__q1"), q(0.75).alias("__q3"))
    joined = df.crossJoin(F.broadcast(g))
    bound = F.col("__q1") - k * (F.col("__q3") - F.col("__q1"))
    return joined.withColumn(flag_col, F.coalesce(v < bound, F.lit(False))).drop("__q1", "__q3")
