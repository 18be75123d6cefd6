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


def rate_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket: str = "hour",
    z_thresh: float = 3.5,
    exact: bool = True,
) -> DataFrame:
    """Ingestion-rate anomaly detection: per (group, time-bucket) event
    counts scored with a robust z (0.6745 * (n - median) / MAD) against the
    group's own rate history — the monitor that catches a stuck producer
    (rate collapse) or a replay/dup storm (rate spike) before row-level
    checks ever see the data. MAD-based scoring shrugs off the heavy-tail
    buckets that would wreck a mean/stddev z.

    Plan: detail rows hash-agg down to (groups x buckets) counts first —
    every later step (two medians, two broadcast join-backs) runs on that
    tiny aggregate, so 10^12 events cost one map-side-combined count pass.
    ``exact=False`` switches the medians to ``approx_percentile`` for
    billion-bucket histories, mirroring the other quantile tiers. MAD = 0
    (a majority-constant rate — a single spike cannot move MAD) yields
    NULL z, and the flag degrades to "any bucket off the median": without
    that fallback the one scenario this monitor exists for, a lone storm
    in an otherwise steady stream, would be invisible.
    """
    med_of = (
        (lambda c: F.median(c))
        if exact
        else (lambda c: F.approx_percentile(c, F.lit(0.5), F.lit(10000)))
    )
    counts = df.groupBy(
        group_col, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    med = counts.groupBy(group_col).agg(
        med_of(F.col("n_events").cast("double")).alias("__med")
    )
    # null-safe join-backs (module docstring rule): a NULL group key — e.g.
    # events with an unparsed/unknown type, the classic stuck-producer
    # symptom — forms a group in the aggregates, and a plain equi-join
    # would silently drop its buckets from the report
    d = _join_bounds(counts, med, [group_col])
    mad = d.groupBy(group_col).agg(
        med_of(F.abs(F.col("n_events") - F.col("__med"))).alias("__mad")
    )
    out = _join_bounds(d, mad, [group_col])
    z = F.try_divide(
        F.lit(0.6745) * (F.col("n_events") - F.col("__med")),
        F.nullif(F.col("__mad"), F.lit(0.0)),
    )
    return out.select(
        group_col,
        "bucket_ts",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("__med", 6).alias("med_rate"),
        F.round("__mad", 6).alias("mad_rate"),
        F.round(z, 6).alias("robust_z"),
        F.when(
            F.col("__mad") == 0.0,
            F.when(F.col("n_events") != F.col("__med"), 1).otherwise(0),
        )
        .otherwise(F.when(F.abs(z) > z_thresh, 1).otherwise(0))
        .cast("int")
        .alias("anomalous"),
    )
