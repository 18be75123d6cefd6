"""As-of (backward temporal) join — an operator the reference (and native
Spark) lacks, composed from built-in DataFrame ops per the union/last-value
pattern: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key.

Plan shape (the reason this scales where a range-condition join does not):
both sides are tagged and unioned, then ONE window pass per key carries the
last-seen right payload forward in time order. Cost = one shuffle on the
key + one sort per partition — identical to any windowed aggregate; a
naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max-filter is a
per-key cartesian (O(|l|x|r|) per key) that AQE cannot save. Skewed keys
behave exactly like any window: bound them upstream or salt + re-asof per
salt with boundary rows replicated.

Semantics match the common backward as-of (pandas merge_asof defaults /
DuckDB ``ASOF JOIN ON l.ts >= r.ts``): inclusive on equal timestamps; left
rows with no prior right row keep nulls; optional ``tolerance`` voids
matches older than ``left.ts - tolerance`` — expressed in the ordering
column's own units for numeric columns, in SECONDS for timestamp columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    tolerance: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join. ``on`` = ordering column (present both sides);
    ``by`` = equality key(s). Right payload columns come back prefixed with
    ``right_prefix`` (plus ``<prefix><on>`` = the matched right timestamp).
    Right side must be unique per (by, on) — pre-aggregate if not (an
    ambiguous 'latest' is a data bug, not a tie to break silently)."""
    by = [by] if isinstance(by, str) else list(by)
    r_payload = [c for c in right.columns if c not in by and c != on]

    # tag and union: right rows sort BEFORE left rows at equal ts so the
    # equal-timestamp right row is visible to the left row (inclusive match)
    r_struct = F.struct(F.col(on).alias(on), *[F.col(c) for c in r_payload])
    l_side = left.select(
        *by, F.col(on), F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType.simpleString()
        ).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_side = right.select(
        *by, F.col(on), F.lit(0).alias("_is_left"),
        r_struct.alias("_r"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
            .schema["_l"].dataType.simpleString()
        ).alias("_l"),
    )
    u = l_side.unionByName(r_side)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_is_left") == 1
    )
    if tolerance is not None:
        # subtraction on a timestamp 'on' column yields an interval, which
        # cannot compare against a double — measure the gap in epoch seconds
        # instead (for numeric columns the cast is a no-op in value terms)
        if isinstance(left.schema[on].dataType, (TimestampType, TimestampNTZType)):
            gap = F.col(on).cast("double") - F.col("_m")[on].cast("double")
        else:
            gap = F.col(on) - F.col("_m")[on]
        filled = filled.withColumn(
            "_m",
            F.when(F.col("_m").isNotNull() & (gap <= F.lit(tolerance)), F.col("_m")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m")[on].alias(f"{right_prefix}{on}"))
    out_cols += [F.col("_m")[c].alias(f"{right_prefix}{c}") for c in r_payload]
    return filled.select(*out_cols)
