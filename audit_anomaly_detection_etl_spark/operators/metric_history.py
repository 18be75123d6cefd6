"""Run-over-run metric anomaly detection (the Deequ anomaly-detection idea).

Reference analogue: the reference pipeline recomputes its ~20 per-survey
features every run and a human eyeballs the Streamlit dashboard for "today
looks wrong" (SURVEY.md §6); nothing compares a run's aggregate metrics
against the runs before it. This operator closes that loop for the
validation engine: every suite run already emits per-partition metrics rows
(plans/checkpoint.py lineage); append them to a metrics log and each new
run can be screened against the HISTORY — a row-count collapse, a null-rate
spike, or a violation-count jump is flagged even when every row-level check
still passes (the upstream-silently-dropped-a-shard failure mode).

Detection rule: robust center/scale per series — median and MAD of the
prior runs' values; the latest value is anomalous when
``|v - median| > k * MAD + eps``. Median/MAD (not mean/stddev) so that one
bad historical run cannot widen the envelope enough to mask the next one;
``eps`` makes a constant history (MAD = 0) flag ANY change while absorbing
float dust.

Scale: the history is metric-grain — O(runs x partitions x metrics) rows,
not data-grain — so every join here is on a table orders of magnitude
smaller than the validated data. Two grouped medians (center, then
absolute-deviation) and one equi-join back to the latest run; medians are
exact (``F.median``), matching the DuckDB oracle's ``median`` 0.5-quantile
interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metric_anomalies(
    history: DataFrame,
    *,
    run_col: str = "run",
    key_cols: tuple = ("part",),
    metric_col: str = "metric",
    value_col: str = "value",
    k: float = 4.0,
    eps: float = 1e-9,
    min_history: int = 3,
) -> DataFrame:
    """Screen the LATEST run's metrics against all prior runs' history.

    ``history`` is long-format: one row per (run, *key_cols, metric, value);
    ``run_col`` must order runs (timestamp, date string, or sequence
    number). Series with fewer than ``min_history`` prior observations are
    withheld (a 2-run history flags everything or nothing — neither is
    evidence). Output: one row per screened series present in the latest
    run: ``*key_cols, metric, latest_value, n_prior, med_prior, mad_prior,
    abs_dev, anomalous``.

    The latest-run marker is a 1-row aggregate broadcast back over the
    history (no driver round-trip, no collect); both median passes group on
    the series key, so the whole screen is three shuffles of metric-grain
    data regardless of validated-data size.
    """
    series = [*key_cols, metric_col]
    run = F.col(run_col)
    val = F.col(value_col).cast("double")

    h = history.select(run.alias("__run"), *series, val.alias("__v"))
    mx = h.agg(F.max("__run").alias("__latest"))
    tagged = h.crossJoin(F.broadcast(mx))
    prior = tagged.where(F.col("__run") < F.col("__latest"))
    latest = tagged.where(F.col("__run") == F.col("__latest"))

    med = prior.groupBy(*series).agg(
        F.count(F.lit(1)).cast("long").alias("n_prior"),
        F.median("__v").alias("__med"),
    )
    mad = (
        prior.join(med.select(*series, "__med"), on=series)
        .groupBy(*series)
        .agg(F.median(F.abs(F.col("__v") - F.col("__med"))).alias("__mad"))
    )
    dev = F.abs(F.col("__v") - F.col("__med"))
    return (
        latest.join(med, on=series)
        .join(mad, on=series)
        .where(F.col("n_prior") >= F.lit(min_history))
        .select(
            *series,
            F.round(F.col("__v"), 6).alias("latest_value"),
            F.col("n_prior"),
            F.round(F.col("__med"), 6).alias("med_prior"),
            F.round(F.col("__mad"), 6).alias("mad_prior"),
            F.round(dev, 6).alias("abs_dev"),
            (dev > F.lit(k) * F.col("__mad") + F.lit(eps)).alias("anomalous"),
        )
    )
