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
                # try_divide: an empty input still yields the 1-row global
                # aggregate (n_rows = 0) and plain long division would abort
                # under ANSI; NULL rate matches tall_stats_from_wide's guard
                F.try_divide(F.col(f"{c}__nulls"), F.col("n_rows")).alias("null_rate"),
            )
        )
    exploded = wide.select(
        *gb, F.col("n_rows"), F.explode(F.array(*structs)).alias("s")
    ).select(*gb, "s.column", "s.min", "s.max", "s.mean", "s.stddev", "s.null_rate", "n_rows")
    return exploded


def profile_diff(
    ref_stats: DataFrame,
    cur_stats: DataFrame,
    z_threshold: float = 3.0,
    null_rate_eps: float = 0.001,
) -> DataFrame:
    """Profile-regression report between two ``column_stats`` outputs (old
    snapshot vs new snapshot, train split vs eval split, yesterday vs
    today): per column the paired stats, a two-sample z for the mean shift,
    the null-rate delta, and three verdicts —

    - ``mean_drift``:     |mean_c - mean_r| / sqrt(sd_r^2/n_r + sd_c^2/n_c)
                          exceeds ``z_threshold``
    - ``null_regressed``: null rate rose by more than ``null_rate_eps``
    - ``range_breach``:   the new data exceeds the reference min/max
                          envelope (new extremes the old constraints never
                          saw)

    This is the check that catches "the pipeline still runs but the new
    snapshot is subtly different" — the reference re-derives bounds from
    scratch each run (data_processing/nodes.py sigma bounds) and so cannot
    see slow regressions; diffing profiles across runs can.

    Scale shape: both inputs are already column-grain (one row per column —
    dozens of rows), so the join is a broadcast hash join of two aggregate
    results; cost is the two single-pass profile scans that produced them.
    """
    r = ref_stats.select(
        "column",
        F.col("n_rows").alias("n_ref"),
        F.col("mean").alias("mean_ref"),
        F.col("stddev").alias("sd_ref"),
        F.col("null_rate").alias("nr_ref"),
        F.col("min").alias("min_ref"),
        F.col("max").alias("max_ref"),
    )
    c = cur_stats.select(
        "column",
        F.col("n_rows").alias("n_cur"),
        F.col("mean").alias("mean_cur"),
        F.col("stddev").alias("sd_cur"),
        F.col("null_rate").alias("nr_cur"),
        F.col("min").alias("min_cur"),
        F.col("max").alias("max_cur"),
    )
    j = r.join(F.broadcast(c), "column")
    # try_divide end-to-end: a CONSTANT column (stddev 0 in both snapshots)
    # makes se = 0, and plain division would kill the whole diff with an
    # ANSI DIVIDE_BY_ZERO; NULL z -> the coalesced verdicts below stay a
    # defined false, and DuckDB's native x/0 -> NULL keeps the oracle
    # matched. (An empty snapshot, n = 0, rides the same guard.)
    se = F.sqrt(
        F.try_divide(F.col("sd_ref") * F.col("sd_ref"), F.col("n_ref"))
        + F.try_divide(F.col("sd_cur") * F.col("sd_cur"), F.col("n_cur"))
    )
    z = F.try_divide(F.abs(F.col("mean_cur") - F.col("mean_ref")), se)
    null_delta = F.col("nr_cur") - F.col("nr_ref")
    breach = (F.col("min_cur") < F.col("min_ref")) | (F.col("max_cur") > F.col("max_ref"))
    return j.select(
        "column",
        "n_ref",
        "n_cur",
        F.round("mean_ref", 6).alias("mean_ref"),
        F.round("mean_cur", 6).alias("mean_cur"),
        F.round(z, 6).alias("mean_shift_z"),
        F.round("nr_ref", 6).alias("null_rate_ref"),
        F.round("nr_cur", 6).alias("null_rate_cur"),
        F.coalesce(z > F.lit(z_threshold), F.lit(False)).alias("mean_drift"),
        F.coalesce(null_delta > F.lit(null_rate_eps), F.lit(False)).alias(
            "null_regressed"
        ),
        F.coalesce(breach, F.lit(False)).alias("range_breach"),
    )


def null_pattern_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Missingness-pattern profile: one row per OBSERVED null/present
    combination across ``cols``, with its frequency — the audit that
    separates "columns are independently 2% null" from "2% of rows lost the
    whole right side of a join". Per-column null rates (column_stats) cannot
    tell those apart; the pattern profile can, because correlated
    missingness collapses onto few patterns while independent missingness
    spreads over many.

    Scale shape: ONE detail scan projecting each row to a fixed-width
    '0'/'1' pattern string (pure codegen — no UDF, no explode), then a
    two-phase hash agg at pattern grain. Observed patterns are bounded by
    min(n_rows, 2^k) but real tables concentrate on a handful; the share
    denominator joins back broadcast from the same aggregate (no second
    scan, no window).

    Returns (pattern, null_cols, n_rows, share) ordered nowhere — callers
    sort. ``pattern`` is positional over ``cols``; ``null_cols`` is the
    human-readable comma list of the null columns in that pattern.
    """
    cols = cols or df.columns
    bits = [
        F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")) for c in cols
    ]
    names = [F.when(F.col(c).isNull(), F.lit(c)) for c in cols]
    pat = F.concat(*bits).alias("pattern")
    null_cols = F.concat_ws(",", F.array_compact(F.array(*names))).alias("null_cols")
    counts = (
        df.select(pat, null_cols)
        .groupBy("pattern", "null_cols")  # null_cols is FD on pattern: same grain
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .localCheckpoint(eager=False)  # pattern-grain; feeds total + join-back
    )
    return global_share(counts, "n_rows").select(
        "pattern", "null_cols", "n_rows", "share"
    )


def global_share(counts: DataFrame, n_col: str, dp: int = 6) -> DataFrame:
    """Append ``share`` = n_col / global total to an already-aggregated
    grain table. The 1-row total crossJoins back broadcast — no second scan
    of the input, no window over the aggregate. Callers should
    ``localCheckpoint(eager=False)`` the counts first when the same subtree
    feeds both the total and the join-back (as null_pattern_profile and
    json_key_profile do)."""
    total = counts.agg(F.sum(n_col).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share",
            F.round(
                F.col(n_col).cast("double") / F.col("__total").cast("double"), dp
            ),
        )
        .drop("__total")
    )


def mixed_unit_audit(
    df: DataFrame,
    value_col: str,
    group_col: str,
    heavy_share: float = 0.05,
    gap_decades: int = 3,
) -> DataFrame:
    """Mixed-units (magnitude-cluster) audit: flags groups whose positive
    values cluster in decades separated by an empty gap — the signature of
    one producer logging seconds where another logs milliseconds (or Hz vs
    kHz). Both modes individually pass range constraints and drift-vs-self,
    so neither schema min/max (SURVEY.md §1.3 analogue) nor the drift family
    can see this class; Benford (q88) tests leading-DIGIT frequency and is
    blind to it too.

    Decade = digit count of floor(x) for x>=1 (exact integer/string
    arithmetic — deliberately NOT floor(log10(x)), whose float rounding at
    exact powers of ten can disagree across engines); values in (0,1) lump
    into decade -1. A group is flagged when its "heavy" decades (share >=
    ``heavy_share``) contain an adjacent pair more than ``gap_decades``
    apart — i.e. two magnitude clusters with nothing between them.

    Scale shape: one scan -> decade-grain hash agg (map-side combine; the
    shuffle carries <= ~20 rows per group regardless of input size); the
    share/gap windows run over that tiny decade-grain aggregate, partitioned
    by group (never an unpartitioned window). Returns one row per group with
    >=1 heavy decade: (group, n_pos, n_heavy, heavy_decades, max_gap,
    mixed_units).
    """
    from pyspark.sql.window import Window

    x = F.col(value_col)
    pos = df.where(x.isNotNull() & (x > 0))
    # values >= 1e15 land in a terminal overflow decade 15: beyond the
    # exact-integer double range the digit-count trick degrades anyway, and
    # past 2^63 Spark's floor->long SATURATES while DuckDB's bigint cast
    # THROWS — the shared threshold keeps both engines identical and still
    # flags a huge cluster against a sane one (gap >= 15 - small decade)
    decade = (
        F.when(x >= 1e15, F.lit(15))
        .when(x >= 1, F.length(F.floor(x).cast("bigint").cast("string")) - 1)
        .otherwise(F.lit(-1))
        .cast("int")
    )
    per = pos.groupBy(F.col(group_col), decade.alias("decade")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(group_col)
    shares = per.withColumn("n_pos", F.sum("n").over(w)).withColumn(
        "share", F.col("n").cast("double") / F.col("n_pos").cast("double")
    )
    heavy = shares.where(F.col("share") >= F.lit(heavy_share))
    w_lag = Window.partitionBy(group_col).orderBy("decade")
    gaps = heavy.withColumn("gap", F.col("decade") - F.lag("decade").over(w_lag))
    return gaps.groupBy(group_col).agg(
        F.max("n_pos").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_heavy"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("decade")), lambda d: d.cast("string")
            ),
            ",",
        ).alias("heavy_decades"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
        (F.coalesce(F.max("gap"), F.lit(0)) >= F.lit(gap_decades)).alias("mixed_units"),
    )


def granularity_audit(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantized_share_ppm: int = 990_000,
) -> DataFrame:
    """Producer-quantization (granularity) audit over an integer-typed
    column: per group, the share of values that are exact multiples of
    10 / 100 / 1000 plus the count of distinct residues mod 100, with a
    verdict naming the coarsest grain whose multiple-share reaches
    ``quantized_share_ppm`` (parts-per-million). Catches one producer
    rounding ``dur_ms`` to whole deciseconds/seconds while others log at
    millisecond grain — a precision LOSS that stays in range, keeps the
    same magnitude decade (invisible to mixed_unit_audit), and drifts no
    histogram whose bins are coarser than the quantum.

    A uniform-grain column sits near 100_000 ppm at each decade step
    (1-in-10 chance per factor of 10); a quantized producer sits at
    1_000_000. The default threshold 990_000 tolerates a ~1% mix-in of
    fine-grained stragglers. A constant column IS reported as quantized at
    every grain dividing it — a single repeated duration is exactly the
    degenerate precision loss this audit exists to surface.

    Cross-engine parity: multiples/residues are integer arithmetic on
    ``abs(value)`` (both engines keep the dividend's sign on ``%``; abs
    removes the difference from the report), and the ppm shares are
    ``FLOOR(m * 1e6 / n)`` — int64 products are exact in the double domain
    well past any group size, so Spark and DuckDB agree bit-for-bit
    (queries.py header rules; no float rounding anywhere).

    Scale shape: one scan -> one per-group hash aggregate with map-side
    combine; the single distinct aggregate runs over a DOMAIN-BOUNDED
    expression (abs(x) % 100 has <= 100 values), so its expand phase
    carries at most 100 rows per group at any input size. No windows, no
    joins. Reference analogue: the discrete/continuous variable-type
    classification (SURVEY.md A21) applied at value-grain.
    """
    x = F.abs(F.col(value_col))
    ppm = lambda m: F.floor(  # noqa: E731
        F.col(m).cast("double") * F.lit(1000000.0) / F.col("n").cast("double")
    ).cast("bigint")
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((x % 10 == 0).cast("long")).alias("m10"),
            F.sum((x % 100 == 0).cast("long")).alias("m100"),
            F.sum((x % 1000 == 0).cast("long")).alias("m1000"),
            # distinct grain: residue domain <= 100 values — exact is free
            F.countDistinct(x % 100).cast("long").alias("n_res_100"),
        )
    )
    thr = F.lit(int(quantized_share_ppm))
    out = g.select(
        F.col(group_col),
        F.col("n"),
        ppm("m10").alias("ppm_mult_10"),
        ppm("m100").alias("ppm_mult_100"),
        ppm("m1000").alias("ppm_mult_1000"),
        F.col("n_res_100"),
    )
    return out.withColumn(
        "granularity",
        F.when(F.col("ppm_mult_1000") >= thr, F.lit("quantized_1000"))
        .when(F.col("ppm_mult_100") >= thr, F.lit("quantized_100"))
        .when(F.col("ppm_mult_10") >= thr, F.lit("quantized_10"))
        .otherwise(F.lit("unit")),
    )
