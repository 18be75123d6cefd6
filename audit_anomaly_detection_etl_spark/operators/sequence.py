"""Ingest-integrity audits over ordered event streams: chronology
(timestamps must not run backwards within an entity's arrival order) and
sequence completeness (dense surrogate ids must not have holes).

Reference analogue: the reference's survey-procedure checks walk each
interview's event log in arrival order and count backward jumps
(SURVEY.md W3, data_processing/nodes.py backtrack scan); these two operators
are the ingestion-side versions — an out-of-order timestamp means the
upstream log was re-ordered or a producer clock skewed, a hole in a dense id
range means events were dropped between the producer and the lake.

Scale shapes:
- ``chronology_audit``: one lag window PARTITIONED by the entity key (never
  a global sort) + one hash agg to entity grain. Entities are numerous and
  individually small — exactly the shape Spark's window exec likes; a
  hot entity is bounded by the entity's own event count, not the table.
- ``sequence_gaps``: ids bucket by ``id DIV bucket_size`` so expected counts
  are known per bucket without a global min/max pass; each bucket reduces
  to (present, distinct, missing, dups) via two-phase hash agg. Bucket
  count = id_span / bucket_size, independent of row count — at 10^12 rows
  with 10^6-wide buckets the report is 10^6 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chronology_audit(
    df: DataFrame,
    group_col: str,
    seq_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-entity count of timestamp inversions in ``seq_col`` arrival order.

    Returns (group_col, n_events, n_inversions, max_backstep_sec, monotonic):
    an inversion is a row whose ``ts_col`` is strictly earlier than the
    previous row's (by ``seq_col`` order within the entity);
    ``max_backstep_sec`` is the largest backward jump in seconds (0.0 when
    monotonic).
    """
    w = Window.partitionBy(group_col).orderBy(seq_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer microseconds end-to-end: the float division happens ONCE on the
    # per-group max, so the oracle (epoch_us) matches bit-for-bit. NTZ casts
    # to TIMESTAMP for unix_micros; the shift is uniform so diffs are exact.
    back_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    step = df.select(
        group_col,
        F.when(back_us < 0, F.lit(1)).otherwise(F.lit(0)).alias("__inv"),
        F.when(back_us < 0, -back_us).otherwise(F.lit(0)).alias("__bs"),
    )
    return step.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__inv").cast("long").alias("n_inversions"),
        F.round(F.max("__bs").cast("double") / 1e6, 6).alias("max_backstep_sec"),
        (F.sum("__inv") == 0).alias("monotonic"),
    )


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    bucket_size: int = 1000,
) -> DataFrame:
    """Per-id-range completeness of a dense surrogate id column.

    Buckets ids by ``id DIV bucket_size``; within each bucket the expected
    population is every id in [bucket*size, (bucket+1)*size) clipped to the
    observed global id range — but computing the global range needs a second
    pass, so instead the bucket's own [min, max] span is used: holes INSIDE
    a bucket are exact (``span - distinct``), truncation at the table's true
    edges shows up as a short first/last bucket, not a false gap. Duplicated
    ids are reported separately (``present - distinct``).

    Returns (id_bucket, first_id, last_id, n_present, n_distinct, n_missing,
    n_dup, complete).
    """
    b = (F.col(id_col) / F.lit(bucket_size)).cast("long").alias("id_bucket")
    agg = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(b)
        .agg(
            F.min(id_col).cast("long").alias("first_id"),
            F.max(id_col).cast("long").alias("last_id"),
            F.count(F.lit(1)).alias("n_present"),
            # distinct grain: per id_bucket, cardinality <= bucket_size by
            # construction — exact stays cheap at any table size
            F.countDistinct(id_col).alias("n_distinct"),
        )
    )
    span = F.col("last_id") - F.col("first_id") + 1
    missing = (span - F.col("n_distinct")).cast("long")
    return agg.select(
        "id_bucket",
        "first_id",
        "last_id",
        F.col("n_present").cast("long").alias("n_present"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        missing.alias("n_missing"),
        (F.col("n_present") - F.col("n_distinct")).cast("long").alias("n_dup"),
        ((missing == 0) & (F.col("n_present") == F.col("n_distinct"))).alias("complete"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    exact: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Cohort-retention triangle: users grouped by first-seen day, distinct
    actives per (cohort, day-offset), retention vs the cohort's day-0 size.

    Exact tier (default): the event stream reduces to DISTINCT (user, day)
    first — one map-side-combinable hash agg that collapses per-user event
    multiplicity before anything else touches the data. After that
    reduction, (cohort, day_offset, user_col) tuples are unique BY
    CONSTRUCTION (one row per user-day, one cohort per user), so the
    per-cell "distinct users" is a plain ``count`` — no second
    distinct-aggregate wall.

    Approx tier (``exact=False``): skips the (user, day) pre-distinct and
    aggregates ``approx_count_distinct(user, rsd)`` per cell directly, with
    HLL sketches combined map-side. At 10^12 events the trade is one fewer
    full-table shuffle (the pre-distinct) against rsd-bounded cell error;
    day-0 sizes and the retention ratio inherit the same tolerance. The
    first-seen-day pass is a plain min-agg either way.

    Returns (cohort_day, day_offset, n_users, retention).
    """
    day = F.date_trunc("day", F.col(ts_col))
    if exact:
        ud = events.select(user_col, day.alias("d")).distinct()
        n_users_agg = F.count(F.lit(1))
    else:
        ud = events.select(user_col, day.alias("d"))
        n_users_agg = F.approx_count_distinct(user_col, rsd)
    first = ud.groupBy(user_col).agg(F.min("d").alias("cohort"))
    act = ud.join(first, user_col).select(
        "cohort", F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"), user_col
    )
    cell = act.groupBy("cohort", "day_offset").agg(
        n_users_agg.cast("long").alias("n_users")
    )
    cell = cell.localCheckpoint(eager=False)  # feeds base + the join-back
    base = cell.where(F.col("day_offset") == 0).select(
        "cohort", F.col("n_users").alias("n0")
    )
    return cell.join(F.broadcast(base), "cohort").select(
        F.col("cohort").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("n0"), 6).alias("retention"),
    )
