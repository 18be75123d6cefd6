"""Distribution-drift detection: distributed equi-width histograms -> KS/PSI.

Reference analogues: the sigma/IQR outlier bounds (SURVEY.md A3/A4,
data_processing/nodes.py:119-148) and the Freedman-Diaconis histogram helper
(A19, app_utils/plot_tools.py:61-66). At 10^12 rows exact global quantiles
are a non-starter, so drift works on *fixed-bin* equi-width histograms:

1. one distributed pass: ``width_bucket`` + ``groupBy(bin).count()`` — the
   shuffle carries n_bins rows per map task (map-side combine), i.e. KBs;
2. the tiny bin-count table is collected and compared to the stored
   reference snapshot with the numpy PSI/KS kernels (functions/stats.py).

``histogram`` below is also the engine's A19-parity operator (bucketing is
pure Catalyst: WholeStageCodegen, no Python).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stats as _stats


@dataclass(frozen=True)
class BinSpec:
    col: str
    lo: float
    hi: float
    n_bins: int

    def __post_init__(self):
        # a degenerate range or bin count would otherwise surface as an
        # ANSI DIVIDE_BY_ZERO deep inside a consumer's plan (e.g. the
        # wasserstein w1 / (hi - lo) normalization) — fail at construction
        if not (self.hi > self.lo):
            raise ValueError(f"BinSpec({self.col}): hi must exceed lo")
        if self.n_bins <= 0:
            raise ValueError(f"BinSpec({self.col}): n_bins must be positive")


def _bucket(spec: BinSpec):
    # width_bucket: 0 = below lo, n_bins+1 = above hi -> clamp into [1, n_bins]
    # (+-inf land on the edge bins via those codes). NULL and NaN both make
    # width_bucket return NULL — and greatest() SKIPS nulls, so without the
    # guard they would silently clamp into bin 0 instead of being excluded
    # (the fused bucket_count_aggs path had exactly that: NULL dur_ms rows
    # counted as lowest-bin values). The when() pins both to NULL so every
    # consumer (histogram's bin-null filter, multi_histogram's, sum(bucket==k)
    # three-valued logic) drops them uniformly.
    x = F.col(spec.col).cast("double")
    bucket = F.width_bucket(x, F.lit(spec.lo), F.lit(spec.hi), F.lit(spec.n_bins))
    clamped = (F.least(F.greatest(bucket, F.lit(1)), F.lit(spec.n_bins)) - 1).cast("int")
    return F.when(x.isNotNull() & ~F.isnan(x), clamped)


def histogram(df: DataFrame, spec: BinSpec, group_by: list[str] | None = None) -> DataFrame:
    """Equi-width histogram: (group..., bin, count). Out-of-range values clamp
    to the edge bins so total counts reconcile with the non-null, non-NaN row
    count. NaN is excluded like NULL (width_bucket(NaN) is NULL; a bin=NULL
    row would corrupt numpy consumers — arr[None] broadcasts across the whole
    array), matching multi_histogram's bin-null filter.
    """
    gb = group_by or []
    return (
        df.where(F.col(spec.col).isNotNull())
        .select(*gb, _bucket(spec).alias("bin"))
        .where(F.col("bin").isNotNull())
        .groupBy(*gb, "bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bucket_count_aggs(specs: list[BinSpec]) -> list:
    """Per-spec per-bin algebraic count aggregates (``sum(bucket==k)``, nulls
    excluded via three-valued logic) — fuseable into any wide groupBy so the
    suite runner computes stats AND histograms in one pass. Column naming:
    ``__hist__<col>__<bin>``; decode with ``counts_from_wide``."""
    aggs = []
    for spec in specs:
        b = _bucket(spec)
        for k in range(spec.n_bins):
            aggs.append(F.sum((b == k).cast("long")).alias(f"__hist__{spec.col}__{k}"))
    return aggs


def counts_from_wide(wide_row: dict, specs: list[BinSpec]) -> dict[str, np.ndarray]:
    out = {}
    for spec in specs:
        arr = np.zeros(spec.n_bins, dtype=np.float64)
        for k in range(spec.n_bins):
            arr[k] = float(wide_row.get(f"__hist__{spec.col}__{k}") or 0)
        out[spec.col] = arr
    return out


def multi_histogram(
    df: DataFrame, specs: list[BinSpec], group_by: list[str] | None = None
) -> DataFrame:
    """Every spec's equi-width histogram in ONE scan: per input row, one
    (col, bin) struct per spec (bin null when the value is null), exploded to
    tall and hash-aggregated — the same stack-then-explode trick as
    column_stats. Catalyst does NOT share scan subtrees across union
    branches, so the per-spec ``histogram(...).union`` formulation scans the
    table once per column; this formulation scans it once total, and the
    shuffle still carries only n_groups x n_specs x n_bins combined rows
    (partial aggregation runs after the explode).

    Output: (group..., col, bin, count).
    """
    gb = group_by or []
    structs = [
        F.struct(
            F.lit(spec.col).alias("col"),
            F.when(F.col(spec.col).isNotNull(), _bucket(spec)).alias("bin"),
        )
        for spec in specs
    ]
    return (
        df.select(*gb, F.explode(F.array(*structs)).alias("s"))
        .select(*gb, F.col("s.col").alias("col"), F.col("s.bin").alias("bin"))
        .where(F.col("bin").isNotNull())
        .groupBy(*gb, "col", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def ref_counts(hist_ref: DataFrame, specs: list[BinSpec]) -> dict[str, np.ndarray]:
    """Reference bin-count arrays per column from a (col, bin, lo, hi, count)
    snapshot table (tiny: n_cols x n_bins rows)."""
    rows = hist_ref.collect()
    out: dict[str, np.ndarray] = {}
    for spec in specs:
        arr = np.zeros(spec.n_bins, dtype=np.float64)
        for r in rows:
            if r["col"] == spec.col:
                arr[int(r["bin"])] = float(r["count"])
        out[spec.col] = arr
    return out


def grouped_histograms(
    df: DataFrame, specs: list[BinSpec], group_by: list[str] | None = None
) -> dict[tuple, dict[str, np.ndarray]]:
    """ONE job: every column's equi-width histogram per group, as numpy
    arrays keyed ``{group_tuple: {col: counts}}``. Shuffle payload is
    n_groups x n_bins rows — KBs at any input scale.

    These raw counts are additive across groups/partitions, which is what
    lets the suite runner derive GLOBAL drift by summing per-partition
    counts (including counts replayed from checkpoint markers on resume)
    instead of re-scanning the table (plans/runner.py).
    """
    gb = group_by or []
    actual = multi_histogram(df, specs, group_by=gb).collect()
    out: dict[tuple, dict[str, np.ndarray]] = {}
    by_spec = {s.col: s for s in specs}
    for r in actual:
        gvals = tuple(r[g] for g in gb)
        cols = out.setdefault(gvals, {})
        spec = by_spec[r["col"]]
        if r["col"] not in cols:
            cols[r["col"]] = np.zeros(spec.n_bins, dtype=np.float64)
        cols[r["col"]][int(r["bin"])] = float(r["count"])
    return out


def metrics_from_counts(
    counts_by_group: dict[tuple, dict[str, np.ndarray]],
    refs: dict[str, np.ndarray],
    specs: list[BinSpec],
    group_by: list[str] | None = None,
) -> list[dict]:
    """PSI + KS per (group, column) from raw bin counts — pure numpy."""
    gb = group_by or []
    out = []
    for gvals in sorted(counts_by_group):
        for spec in specs:
            arr = counts_by_group[gvals].get(spec.col)
            if arr is None:
                arr = np.zeros(spec.n_bins, dtype=np.float64)
            rec = dict(zip(gb, gvals))
            rec.update(
                {
                    "col": spec.col,
                    "n": float(arr.sum()),
                    "psi": _stats.psi(refs[spec.col], arr),
                    "ks": _stats.ks_statistic(refs[spec.col], arr),
                }
            )
            out.append(rec)
    return out


def categorical_drift(
    df: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
    bucket: str = "day",
    z_alpha: float = 1.6449,
) -> DataFrame:
    """Chi-square drift of a CATEGORICAL column per time bucket vs the
    table-wide distribution — the counterpart of the numeric PSI/KS checks
    (a new event type appearing, or one type's share collapsing, moves
    chi-square long before any numeric histogram).

    Per bucket: ``chi2 = sum (obs - exp)^2 / exp`` over the dense
    bucket x category grid (absent categories count as obs=0 — that IS the
    signal), ``dof = n_categories - 1``, and a drifted flag against the
    Wilson-Hilferty critical value ``dof * (1 - 2/(9 dof) + z * sqrt(2/(9
    dof)))^3`` (chi-square upper-alpha quantile approximation — closed form,
    so both engines compute it identically; z_alpha=1.6449 is alpha=0.05).
    The reference distribution here is the table's own global one, so every
    bucket category has exp > 0 by construction; with an external reference
    profile, guard exp=0 categories separately before trusting chi2.

    Scale shape: ONE scan of the detail table down to (bucket, category)
    counts (two-phase hash agg); every later step — bucket totals, global
    category shares, the dense grid (broadcast nested-loop of two
    aggregate-grain sides), the chi2 sum — runs on that reduced table. The
    counts table feeds four otherwise-unshared subtrees (bucket totals,
    category totals, grand total, the dense join-back); Catalyst does not
    share common subplans, so without reuse the DETAIL scan runs 4x — the
    lazy localCheckpoint (same trade-offs as dedup.minhash_lsh_pairs)
    pins the tiny aggregate-grain table once instead.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    counts = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(b, F.col(cat_col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    buckets = counts.groupBy("bucket_ts").agg(F.sum("n").alias("bt"))
    cats = counts.groupBy("cat").agg(F.sum("n").alias("ct"))
    grand = cats.agg(F.sum("ct").alias("gt"))
    cat_share = cats.crossJoin(F.broadcast(grand)).select(
        "cat", (F.col("ct").cast("double") / F.col("gt")).alias("share")
    )
    grid = buckets.crossJoin(F.broadcast(cat_share))
    dense = grid.join(counts, ["bucket_ts", "cat"], "left").select(
        "bucket_ts",
        "bt",
        "cat",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("obs"),
        (F.col("share") * F.col("bt").cast("double")).alias("exp"),
    )
    per = dense.groupBy("bucket_ts").agg(
        F.sum(
            F.when(
                F.col("exp") > 0,
                (F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp"))
                / F.col("exp"),
            )
        ).alias("__chi2"),
        F.sum(F.when(F.col("exp") > 0, 1).otherwise(0)).cast("int").alias("__ncat"),
        F.first("bt").cast("long").alias("n_events"),
    )
    dof = (F.col("__ncat") - 1).cast("int")
    h = 2.0 / (9.0 * dof.cast("double"))
    # dof=0 (a single category): h divides by zero -> NULL crit -> NULL
    # drifted verdict that neither consumer filter matches. A one-category
    # table has chi2 = 0 by construction (obs == exp), so crit=0 keeps
    # drifted a defined false (0 > 0). CASE WHEN evaluates lazily, so the
    # division never runs on the dof=0 branch.
    crit = F.when(
        dof > 0,
        dof.cast("double")
        * F.pow(F.lit(1.0) - h + F.lit(z_alpha) * F.sqrt(h), F.lit(3.0)),
    ).otherwise(F.lit(0.0))
    return per.select(
        F.col("bucket_ts").alias("window_start"),
        "n_events",
        F.col("__ncat").alias("n_categories"),
        F.round(F.col("__chi2"), 6).alias("chi2"),
        dof.alias("dof"),
        F.round(crit, 6).alias("chi2_crit"),
        (F.col("__chi2") > crit).alias("drifted"),
    )


def drift_metrics(
    df: DataFrame,
    hist_ref: DataFrame,
    specs: list[BinSpec],
    group_by: list[str] | None = None,
) -> list[dict]:
    """PSI + KS per column (and per group if ``group_by``) vs the reference
    snapshot. One job computes every column's histogram (union of per-column
    bucketings over a single scan); comparison is driver-side numpy over
    n_bins-row arrays.

    ``hist_ref`` schema: (col, bin, lo, hi, count) — the generator's clean
    snapshot or a previously persisted run.
    """
    counts = grouped_histograms(df, specs, group_by=group_by)
    refs = ref_counts(hist_ref, specs)
    return metrics_from_counts(counts, refs, specs, group_by=group_by)


def drift_verdicts(
    metrics: list[dict],
    psi_threshold: float = 0.25,
    ks_threshold: float | None = None,
    min_n: int = 500,
) -> list[dict]:
    """PSI/KS threshold verdicts, gated on sample size: a group with fewer
    than ``min_n`` rows cannot produce a statistically meaningful PSI against
    a 40-bin reference (sampling noise alone trips 0.25), so it reports
    ``low_n`` instead of drift. At production partition sizes (10^8 rows)
    the gate never engages; it exists for small partitions and test rigs.
    """
    out = []
    for m in metrics:
        low_n = m["n"] < min_n
        ks_bad = m["ks"] > ks_threshold if ks_threshold is not None else False
        out.append(
            {
                **m,
                "low_n": bool(low_n),
                "drifted": bool((not low_n) and (m["psi"] > psi_threshold or ks_bad)),
            }
        )
    return out


def payload_drift(
    clips_ref: DataFrame,
    clips_cur: DataFrame,
    lo: float = -60.0,
    hi: float = 0.0,
    n_bins: int = 30,
    psi_threshold: float = 0.25,
    min_n: int = 200,
) -> DataFrame:
    """Payload-LEVEL drift: PSI + KS over the decoded RMS-dBFS distribution
    of two snapshots — catches content shifts the metadata tier cannot see
    (gain/AGC change, a new noisy recording source, re-mastered audio),
    since dur_ms/sr_hz histograms are identical when only the waveform
    changed.

    Plan shape: one ``mapInPandas`` decode pass per snapshot
    (media.audio_features — Arrow-batched, per-codec vectorized), dBFS
    conversion and equi-width bucketing in Catalyst, hash-agg to
    ``n_bins`` rows per side; the PSI/KS comparison is driver-side numpy
    over two n_bins arrays (same O(bins) collect budget as drift_metrics).
    Undecodable clips are excluded (the codec/payload checks own those).

    Returns one row: (col, n_ref, n_cur, psi, ks, low_n, drifted).
    """
    from . import media

    spec = BinSpec("rms_dbfs", lo, hi, n_bins)

    def counts_of(clips: DataFrame) -> np.ndarray:
        feats = media.audio_features(clips)
        dbfs = feats.where(F.col("decode_ok") & (F.col("rms") > 0)).select(
            (F.lit(20.0) * F.log10(F.col("rms"))).alias("rms_dbfs")
        )
        rows = histogram(dbfs, spec).collect()
        arr = np.zeros(n_bins, dtype=np.float64)
        for r in rows:
            arr[r["bin"]] = float(r["count"])
        return arr

    ref = counts_of(clips_ref)
    cur = counts_of(clips_cur)
    n_ref, n_cur = float(ref.sum()), float(cur.sum())
    psi_v = _stats.psi(ref, cur)
    ks_v = _stats.ks_statistic(ref, cur)
    low_n = min(n_ref, n_cur) < min_n
    spark = clips_ref.sparkSession
    return spark.createDataFrame(
        [
            (
                spec.col,
                int(n_ref),
                int(n_cur),
                round(float(psi_v), 6),
                round(float(ks_v), 6),
                bool(low_n),
                bool((not low_n) and psi_v > psi_threshold),
            )
        ],
        "col string, n_ref long, n_cur long, psi double, ks double, "
        "low_n boolean, drifted boolean",
    )


def wasserstein_drift(
    df: DataFrame,
    spec: BinSpec,
    ts_col: str = "ts",
    bucket: str = "day",
    w1_norm_threshold: float = 0.10,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift of a NUMERIC column per time bucket
    vs the table-wide distribution, on the engine's fixed equi-width
    histograms.

    PSI/KS (drift_metrics) are share-space metrics: PSI explodes on any
    near-empty bin and KS only sees the single worst CDF gap. W1 is the
    *area* between the two CDFs — ``W1 = bin_width * sum_i |CumP_i - CumQ_i|``
    on equi-width bins — so it is expressed in the column's own units
    ("values moved x units of mass-distance"), is insensitive to empty bins,
    and grows smoothly with a mean shift that KS saturates on. The drifted
    flag tests the range-normalized ``w1 / (hi - lo)`` against
    ``w1_norm_threshold`` (default 0.10: a tenth of the range's worth of
    transport).

    Scale shape (same discipline as categorical_drift): ONE detail-table
    scan down to (bucket, bin) counts — the shuffle carries at most
    n_buckets x n_bins rows per map task. The counts table feeds three
    subtrees (bucket totals, global bin shares, the dense join-back), so it
    is pinned once with a lazy localCheckpoint. The cumulative sums run in a
    *partitioned* window over the aggregate-grain grid (n_bins rows per
    bucket — never the detail table), and both engines accumulate doubles in
    identical bin order, so the oracle matches bit-for-bit before the final
    6dp rounding.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    counts = (
        df.where(F.col(spec.col).isNotNull())
        .groupBy(b, _bucket(spec).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    buckets = counts.groupBy("bucket_ts").agg(F.sum("n").alias("bt"))
    gbins = counts.groupBy("bin").agg(F.sum("n").alias("ct"))
    grand = gbins.agg(F.sum("ct").alias("gt"))
    gshare = gbins.crossJoin(F.broadcast(grand)).select(
        "bin", (F.col("ct").cast("double") / F.col("gt")).alias("q")
    )
    grid = buckets.select(
        "bucket_ts",
        "bt",
        F.explode(F.sequence(F.lit(0), F.lit(spec.n_bins - 1))).alias("bin"),
    )
    dense = (
        grid.join(counts, ["bucket_ts", "bin"], "left")
        .join(F.broadcast(gshare), ["bin"], "left")
        .select(
            "bucket_ts",
            "bt",
            "bin",
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("bt").cast("double")
            ).alias("p"),
            F.coalesce(F.col("q"), F.lit(0.0)).alias("q"),
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket_ts")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.select(
        "bucket_ts",
        "bt",
        F.sum("p").over(w).alias("cp"),
        F.sum("q").over(w).alias("cq"),
    )
    width = (spec.hi - spec.lo) / spec.n_bins
    w1 = F.lit(width) * F.sum(F.abs(F.col("cp") - F.col("cq")))
    w1_norm = w1 / F.lit(spec.hi - spec.lo)
    return (
        cum.groupBy("bucket_ts")
        .agg(
            F.max("bt").cast("long").alias("n_values"),
            F.round(w1, 6).alias("w1"),
            F.round(w1_norm, 6).alias("w1_norm"),
            (w1_norm > F.lit(w1_norm_threshold)).alias("drifted"),
        )
        .select(
            F.col("bucket_ts").alias("window_start"),
            "n_values",
            "w1",
            "w1_norm",
            "drifted",
        )
    )


def novel_categories(
    cur: DataFrame,
    ref: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Dictionary diff of a categorical column between a reference snapshot
    and the current one: values that APPEARED (absent from ref) and values
    that VANISHED (absent from cur), with both sides' counts.

    The chi-square/PSI drift checks are share-weighted — a brand-new enum
    value carrying 0.01% of rows barely moves them, but it is usually the
    loudest schema signal there is (a new producer version, a new locale, a
    typo'd label). This check is exact set difference at category grain:
    every novel value surfaces regardless of mass.

    Scale shape: both sides reduce to (category, count) first (two-phase
    hash agg at dictionary grain — tiny), then one full-outer join of the
    two dictionaries; only asymmetric rows are emitted. No detail-grain
    join, no window.

    Returns (category, status in {'novel','vanished'}, n_cur, n_ref).
    """
    c = (
        cur.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    r = (
        ref.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    j = c.join(r, "category", "full_outer")
    return j.where(F.col("n_cur").isNull() | F.col("n_ref").isNull()).select(
        "category",
        F.when(F.col("n_ref").isNull(), F.lit("novel"))
        .otherwise(F.lit("vanished"))
        .alias("status"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
    )
