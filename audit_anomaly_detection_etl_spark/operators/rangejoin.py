"""Interval (range) join — points matched to containing intervals without
the BroadcastNestedLoopJoin that a raw inequality join plans.

The bucketing trick: pick a bin width ``w``; an interval [s, e] is exploded
to every bin it covers (floor(s/w)..floor(e/w)); a point belongs to exactly
ONE bin (floor(ts/w)). Equi-joining on (key..., bin) then filtering the
exact containment turns an O(|P|x|I|) nested loop into a hash join whose
fan-out is interval_span/w rows per interval — pick ``w`` near the median
interval length so the explode factor stays ~2-3x. A (point, interval)
pair can only meet in the point's single bin, so no dedup pass is needed.

At 10^12 rows this is the standard time-partitioned join: both sides
pre-partitioned by (key, bin) colocate the shuffle; skewed bins (an
interval spanning everything) should be capped upstream or given a
dedicated broadcast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    bin_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (inclusive both ends) and equal ``by`` keys.
    ``ts/start/end`` must be numeric (cast timestamps to epoch first).
    Output = all point columns + all interval columns (names must not
    collide apart from ``by``). ``how='left'`` keeps unmatched points with
    nulls."""
    by = [by] if isinstance(by, str) else list(by or [])
    w = float(bin_width)
    # surrogate row id BEFORE binning: the left path's unmatched-recovery
    # anti-join runs on this single id, not the point column list — a
    # column-list anti-join is null-UNSAFE (a matched row with any NULL
    # column never anti-matches itself and would be emitted twice)
    p0 = points.withColumn("_rid", F.monotonically_increasing_id())
    p = p0.withColumn("_bin", F.floor(F.col(ts_col) / w))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    from functools import reduce

    eq = reduce(
        lambda a, b: a & b,
        [p["_bin"] == i["_bin"]] + [p[c] == i[c] for c in by],
    )
    contain = (p[ts_col] >= i[start_col]) & (p[ts_col] <= i[end_col])
    keep = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c not in by
    ]
    if how == "inner":
        return p.join(i, eq & contain, "inner").select(*keep)
    if how != "left":
        raise ValueError(f"how must be inner or left, got {how!r}")
    # left: inner-match first, then union the never-matched points (anti-join
    # on _rid so NULL-bearing and duplicate point rows resolve per-row)
    matched_full = p.join(i, eq & contain, "inner")
    matched = matched_full.select(*keep)
    unmatched = p0.join(
        matched_full.select(p["_rid"]).distinct(), "_rid", "left_anti"
    ).drop("_rid")
    for c in intervals.columns:
        if c not in by:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
    return matched.unionByName(unmatched)
