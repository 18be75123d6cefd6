"""Conditional functional-dependency audit.

Schema constraints (operators/schema_check.py) validate per-column domains;
many real invariants are CROSS-column: "codec determines sample rate",
"country code determines phone prefix". This operator audits a candidate
dependency lhs -> rhs data-driven: per lhs group it reports the dominant
rhs value, how many rows deviate from it, and the conformance ratio — a
perfect FD shows conformance 1.0, a broken one surfaces exactly the
violating mass (the rows an upstream join/backfill corrupted).

Reference analogue: the constraint-matrix check
(src/audit_anomaly_detection/pipelines/data_quality, SURVEY.md §2.3 J7)
validates against a STATIC rule table; this discovers the rule from the
data itself, which is what you need when the contract is implicit.

Scale shape (10^12 rows): one two-phase hash agg to (lhs, rhs) grain —
the only pass over the data — then two lhs-grain aggregates and one
hash-equi join between them (both sides already reduced to group counts,
orders of magnitude smaller than the input; AQE broadcasts the smaller).
No windows, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_audit(
    df: DataFrame,
    lhs: Sequence[str],
    rhs: str,
) -> DataFrame:
    """Per lhs group: ``(lhs..., dominant_rhs, n_rhs_values, n_rows,
    n_violations, conformance, fd_holds)``. ``dominant_rhs`` is the most
    frequent rhs value (ties broken by MIN rhs — deterministic across
    engines and runs); ``n_violations`` counts rows carrying any other
    value; ``fd_holds`` iff the group is single-valued. NULL rhs values
    are counted as a (distinct) value — a null-polluted group must not
    audit as conforming."""
    lhs = list(lhs)
    rkey = F.coalesce(F.col(rhs).cast("string"), F.lit(" null"))
    # counts feeds two unshared subtrees (per-lhs rollup + the dominant-value
    # join) and per_lhs feeds two more (dominant filter + final join) —
    # without pinning, Catalyst plans a fresh detail scan under each branch
    # (no exchange reuse across the differing downstream shapes; verified on
    # the executed plan). Lazy localCheckpoints pin both at their tiny
    # aggregate grains so the detail table is scanned exactly once, as the
    # scale contract above promises (same pattern as benford.benford_audit).
    counts = (
        df.select(*lhs, rkey.alias("__rv"))
        .groupBy(*lhs, "__rv")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    per_lhs = counts.groupBy(*lhs).agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.max("__c").cast("long").alias("__maxc"),
        # distinct grain: per LHS group over AGGREGATE-grain (lhs, rhs) cells
        # (the detail table was already reduced above) — exact by design
        F.countDistinct("__rv").cast("int").alias("n_rhs_values"),
    ).localCheckpoint(eager=False)
    dominant = (
        counts.join(per_lhs, lhs)
        .where(F.col("__c") == F.col("__maxc"))
        .groupBy(*lhs)
        .agg(F.min("__rv").alias("dominant_rhs"))
    )
    out = per_lhs.join(dominant, lhs)
    n_viol = F.col("n_rows") - F.col("__maxc")
    return out.select(
        *lhs,
        F.when(F.col("dominant_rhs") == " null", F.lit(None))
        .otherwise(F.col("dominant_rhs"))
        .alias("dominant_rhs"),
        "n_rhs_values",
        "n_rows",
        n_viol.alias("n_violations"),
        F.round(F.lit(1.0) - n_viol.cast("double") / F.col("n_rows"), 6).alias(
            "conformance"
        ),
        (F.col("n_rhs_values") == 1).alias("fd_holds"),
    )
