"""Streaming distribution-drift monitor.

The streaming counterpart of operators/drift.py (reference parity:
src/audit_anomaly_detection/pipelines/data_quality drift checks run batch —
this is the extension surface for catching the same drift while data is
still arriving): equi-width histogram counts per event-time window
(watermarked, sliding or tumbling), finalized into PSI / KS scores against
a frozen reference profile.

Streaming legality: the ONE stateful streaming aggregation is the
(window, bin) count — exactly the shape Structured Streaming supports in
append mode with a watermark. Score finalization needs a second
aggregation (per-window normalization), which is illegal to chain inside
the stream, so it runs per micro-batch in ``foreachBatch`` — where the
input is a bounded batch of closed windows (state already compacted to
#windows x #bins rows).

Scale shape (10^9 events/s ingest): bucket assignment is codegen
(width_bucket), the windowed count is map-side-combined into at most
(#open windows x n_bins) state rows per key-range, and the finalize
touches only that aggregate — the reference profile is a driver-side
literal (n_bins doubles), never a join. No Python executes per event.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import stats as _stats
from ..functions.stats import _EPS
from ..operators.drift import BinSpec, _bucket


def windowed_histogram(
    events: DataFrame,
    spec: BinSpec,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, window_end, bin, count) per event-time window —
    runs identically on a stream (watermark bounds state; late rows beyond
    it drop) and on a batch frame (watermark is a no-op), which is how
    tests cross-check the streamed result against the batch one."""
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    return (
        events.where(F.col(spec.col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), _bucket(spec).alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bin",
            "count",
        )
    )


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def psi_over_windows(
    win_hist: DataFrame,
    spec: BinSpec,
    ref_counts: np.ndarray,
    psi_thresh: float = 0.25,
    ks_alpha: float = 0.05,
) -> DataFrame:
    """Batch finalize: per window, PSI and KS vs the reference profile,
    plus a drifted verdict — same math as functions/stats.psi /
    ks_statistic (eps-floored probs; ECDF sup-distance at bin edges).

    Pure Catalyst: the per-window bin counts collapse to one dense array
    (missing bins = 0), the reference probs/ECDF are literals, and the
    score is an ordered fold — bins are bounded (<=64), so the O(bins^2)
    ECDF build is constant work per window.
    """
    n = spec.n_bins
    e = np.maximum(_stats.counts_to_probs(np.asarray(ref_counts)), _EPS)
    e_lit = F.array(*[F.lit(float(v)) for v in e])
    ecdf_ref = np.cumsum(_stats.counts_to_probs(np.asarray(ref_counts)))
    ecdf_lit = F.array(*[F.lit(float(v)) for v in ecdf_ref])
    ref_n = int(np.asarray(ref_counts).sum())

    per_win = win_hist.groupBy("window_start", "window_end").agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "count"))).alias("__m"),
        F.sum("count").cast("long").alias("n_events"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")).cast("double"), F.lit(0.0)
        ),
    )
    # bind the dense counts array once (Catalyst HOF lambdas have no `let` —
    # see functions/text.winnow_fingerprints)
    bound = per_win.withColumn("__c", counts)
    total = F.col("n_events").cast("double")
    a = F.transform(F.col("__c"), lambda c: F.greatest(c / total, F.lit(_EPS)))
    psi_col = _fold_sum(
        F.zip_with(a, e_lit, lambda ai, ei: (ai - ei) * F.log(ai / ei))
    )
    # actual ECDF via prefix sums of the un-floored probs (matches
    # stats.ks_statistic, which does not eps-floor)
    ecdf_a = F.transform(
        F.sequence(F.lit(1), F.lit(n)),
        lambda i: _fold_sum(F.slice(F.col("__c"), F.lit(1), i)) / total,
    )
    ks_col = F.array_max(
        F.zip_with(ecdf_a, ecdf_lit, lambda x, y: F.abs(x - y))
    )
    crit = F.lit({0.10: 1.22, 0.05: 1.36, 0.01: 1.63}.get(ks_alpha, 1.36)) * F.sqrt(
        (F.lit(float(ref_n)) + total) / (F.lit(float(ref_n)) * total)
    ) if ref_n > 0 else F.lit(float(math.inf))
    out = bound.select(
        "window_start",
        "window_end",
        "n_events",
        F.round(psi_col, 6).alias("psi"),
        F.round(ks_col, 6).alias("ks"),
        F.round(crit, 6).alias("ks_crit"),
        ((psi_col > F.lit(psi_thresh)) | (ks_col > crit)).alias("drifted"),
    )
    return out


def streaming_drift_monitor(
    stream_df: DataFrame,
    spec: BinSpec,
    ref_counts: np.ndarray,
    sink_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    psi_thresh: float = 0.25,
    available_now: bool = True,
):
    """Wire the windowed histogram through a ``foreachBatch`` PSI/KS
    finalize into a batch_id-partitioned parquet sink. ``available_now=True``
    drains the backlog and stops (the batch-replay mode tests use);
    ``False`` runs continuously."""
    hist = windowed_histogram(stream_df, spec, ts_col, window, slide, watermark)

    def _finalize(batch_df: DataFrame, batch_id: int) -> None:
        scored = psi_over_windows(batch_df, spec, ref_counts, psi_thresh)
        # Same exactly-once shape as incremental_clip_validation's sink: a
        # kill between the sink write and the offset commit replays this
        # batch_id; dynamic overwrite of its partition replaces rather than
        # duplicates the replayed windows.
        (
            scored.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_dir)
        )

    writer = (
        hist.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_finalize)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
