"""Benford first-digit conformance audit.

The classic model-free screen for fabricated or mechanically-generated
numeric data: naturally-occurring amounts (prices, durations, payment
sums) follow Benford's law — P(first significant digit = d) =
log10(1 + 1/d) — while invented numbers, copy-pasted defaults, and
capped/clamped pipelines do not. Auditors summarize the deviation as
Nigrini's MAD (mean absolute deviation of the nine observed digit shares
from the Benford shares) with published conformance bands for the
first-digit test: < 0.006 close, < 0.012 acceptable, < 0.015 marginal,
else nonconforming.

Reference analogue: the reference's audit pipeline flags anomalous
numeric survey answers with per-group statistical screens
(src/audit_anomaly_detection/pipelines/data_quality; SURVEY.md §2.4);
digit-distribution conformance is the standard audit-domain companion to
those magnitude screens — it catches fabrication that leaves means and
ranges untouched.

Digit extraction is exact, not float: the value is CAST to string and
every character outside [1-9] stripped, so the first remaining character
IS the first significant digit (decimal types render losslessly; no
log10/pow round-trip that could mis-bin 999.999... at a power-of-ten
boundary). Rows with a NULL value or no nonzero digit (zero) are
excluded.

Scale shape (10^12 rows): ONE two-phase hash agg over the detail table
down to (group, digit) grain — the only pass over the data. The dense
group x 9-digit grid (absent digits count 0 — missing digits ARE
evidence) is built by exploding a 9-element literal per group-total row
and left-joining the observed counts: every post-scan step runs at
aggregate grain. No windows, no UDFs, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Nigrini's first-digit MAD conformance bands.
MAD_CLOSE = 0.006
MAD_ACCEPTABLE = 0.012
MAD_MARGINAL = 0.015


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Benford first-digit conformance of ``value_col``.

    Returns one row per group: ``n_values`` (rows with a first significant
    digit), ``mad`` (mean |observed share - Benford share| over digits
    1-9), ``chi2`` (vs Benford expected counts), and ``conformity``
    (close / acceptable / marginal / nonconforming per Nigrini bands).
    """
    sig = F.substring(
        F.regexp_replace(F.col(value_col).cast("string"), "[^1-9]", ""), 1, 1
    )
    # nullif-guard: zero-valued rows strip to '' and must become NULL, not
    # an ANSI cast error
    digit = F.nullif(sig, F.lit("")).cast("int")
    # counts feeds two unshared subtrees (group totals + the dense
    # join-back); the lazy localCheckpoint pins the tiny (group, digit)
    # table so the detail scan runs once, not twice (same trade-offs as
    # dedup.minhash_lsh_pairs / drift.categorical_drift)
    counts = (
        df.where(F.col(value_col).isNotNull() & digit.isNotNull())
        .groupBy(*group_cols, digit.alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy(*group_cols).agg(F.sum("n").alias("nt"))
    grid = totals.select(
        *group_cols, "nt", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d")
    )
    dense = grid.join(counts, [*group_cols, "d"], "left").select(
        *group_cols,
        "nt",
        "d",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("obs"),
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d")).alias("exp_share"),
    )
    per = dense.groupBy(*group_cols).agg(
        F.first("nt").cast("long").alias("n_values"),
        (
            F.sum(F.abs(F.col("obs") / F.col("nt") - F.col("exp_share"))) / F.lit(9.0)
        ).alias("__mad"),
        F.sum(
            (F.col("obs") - F.col("exp_share") * F.col("nt"))
            * (F.col("obs") - F.col("exp_share") * F.col("nt"))
            / (F.col("exp_share") * F.col("nt"))
        ).alias("__chi2"),
    )
    conformity = (
        F.when(F.col("__mad") < MAD_CLOSE, F.lit("close"))
        .when(F.col("__mad") < MAD_ACCEPTABLE, F.lit("acceptable"))
        .when(F.col("__mad") < MAD_MARGINAL, F.lit("marginal"))
        .otherwise(F.lit("nonconforming"))
    )
    return per.select(
        *group_cols,
        "n_values",
        F.round(F.col("__mad"), round_dp).alias("mad"),
        F.round(F.col("__chi2"), round_dp).alias("chi2"),
        conformity.alias("conformity"),
    )
