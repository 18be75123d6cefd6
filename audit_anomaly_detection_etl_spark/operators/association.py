"""Categorical-association audit: chi-square independence + Cramér's V
between two discrete columns.

Validation use: a training corpus is supposed to be balanced — event mix
independent of hour-of-day, label independent of source shard, codec
independent of ingest batch. A strong association between a payload
property and a pipeline property (V above ~0.2-0.3) usually means one
producer is biased, which per-column stats (q31) and per-column drift
(q84/q87/q89) cannot see because each marginal looks fine.

Math: with contingency counts obs(a,b), row totals rt(a), column totals
ct(b) and grand total n, the chi-square statistic reduces to

    chi2 = n * (sum_observed obs^2 / (rt * ct) - 1)

(expanding (obs-exp)^2/exp with exp = rt*ct/n; absent cells contribute
exactly their exp, which the -1 term absorbs) — so ONLY OBSERVED cells are
ever materialized: no dense r x c grid, no zero-fill join. Cramér's V =
sqrt(chi2 / (n * min(r-1, c-1))), dof = (r-1)(c-1), and the associated flag
tests chi2 against the same closed-form Wilson-Hilferty critical value the
categorical-drift check uses (both engines compute it identically).

Scale shape: one detail scan to (a, b) counts (two-phase hash agg; the
shuffle carries at most r*c rows per task); the counts subtree feeds row
totals, column totals, the grand total, and the cell sum, so it is pinned
once with a lazy localCheckpoint. Everything downstream is aggregate-grain
with broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def cramers_v(
    df: DataFrame,
    col_a: str | Column,
    col_b: str | Column,
    label_a: str | None = None,
    label_b: str | None = None,
    z_alpha: float = 1.6449,
) -> DataFrame:
    """One-row association report between two categorical expressions.

    Returns (col_a, col_b, n, n_a, n_b, dof, chi2, chi2_crit, cramers_v,
    associated). ``col_a``/``col_b`` may be expressions (e.g.
    ``F.hour("ts")``); pass ``label_a``/``label_b`` to name them in the
    output.
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    la = label_a or (col_a if isinstance(col_a, str) else "a")
    lb = label_b or (col_b if isinstance(col_b, str) else "b")

    cells = (
        df.select(a.alias("__a"), b.alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    rt = cells.groupBy("__a").agg(F.sum("n").alias("rt"))
    ct = cells.groupBy("__b").agg(F.sum("n").alias("ct"))
    tot = cells.agg(
        F.sum("n").cast("double").alias("tot"),
        # distinct grain: over AGGREGATE-grain contingency cells (category
        # cardinality, never detail rows) — exact by design
        F.countDistinct("__a").cast("int").alias("n_a"),
        F.countDistinct("__b").cast("int").alias("n_b"),
    )
    cell_sum = (
        cells.join(F.broadcast(rt), "__a")
        .join(F.broadcast(ct), "__b")
        .agg(
            F.sum(
                (F.col("n").cast("double") * F.col("n").cast("double"))
                / (F.col("rt").cast("double") * F.col("ct").cast("double"))
            ).alias("s")
        )
    )
    out = cell_sum.crossJoin(F.broadcast(tot))
    chi2 = F.col("tot") * (F.col("s") - F.lit(1.0))
    dof = ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("int")
    # A constant column gives dof = 0 (chi2 is then exactly 0 — a constant
    # is independent of everything); the Wilson-Hilferty h and the V
    # denominator both divide by dof-derived terms, which ANSI mode turns
    # into a DIVIDE_BY_ZERO abort. Report: crit NULL (no test possible),
    # V = 0.0, associated = false.
    h = F.when(dof > 0, F.lit(2.0) / (F.lit(9.0) * dof.cast("double")))
    crit = dof.cast("double") * F.pow(
        F.lit(1.0) - h + F.lit(z_alpha) * F.sqrt(h), F.lit(3.0)
    )
    vmin = F.least(F.col("n_a") - 1, F.col("n_b") - 1).cast("double")
    v = F.when(
        vmin > 0, F.sqrt(F.greatest(chi2, F.lit(0.0)) / (F.col("tot") * vmin))
    ).otherwise(F.lit(0.0))
    return out.select(
        F.lit(la).alias("col_a"),
        F.lit(lb).alias("col_b"),
        F.col("tot").cast("long").alias("n"),
        "n_a",
        "n_b",
        dof.alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(crit, 6).alias("chi2_crit"),
        F.round(v, 6).alias("cramers_v"),
        F.coalesce(chi2 > crit, F.lit(False)).alias("associated"),
    )
