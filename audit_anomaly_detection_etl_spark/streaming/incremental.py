"""Incremental validation via Structured Streaming.

The reference has NO streaming operators (SURVEY.md §2.9) and the north rule
targets batch validation with checkpoint/resume — plans/runner.py is that
path. This module is the *ingest-time* complement: newly-landed clip files
are validated as they appear, with exactly-once progress tracked by the
Structured Streaming checkpoint (file-source offsets), which is the
``Trigger.AvailableNow`` batch-equivalent incremental processing SURVEY.md
§2.9 names.

Two operators:

- ``incremental_clip_validation``: file-source stream over the clips table
  root; each micro-batch runs the spec's ROW-LEVEL check set — the same
  composition the batch suite's waves use (``plans.runner.wave_violations``:
  schema domain, byte_length, encoding, payload decode invariants when a
  ref table is present, plus any enabled opt-ins like speaking_rate /
  loudness / dropout / codec_sniff) — via ``foreachBatch``, landing
  violation rows in a batch_id-partitioned parquet sink (dynamic overwrite
  per batch_id — a replayed micro-batch replaces its own rows, never
  duplicates them). Cross-partition checks (uniqueness, referential, drift)
  stay in the batch suite — they need table-wide state
  (``runner.NON_ROW_LEVEL_CHECKS``); their cross-batch streaming analogues
  live in streaming/stateful.py and streaming/drift_stream.py.
- ``windowed_event_stats``: event-time tumbling-window aggregation with a
  watermark over a timestamped event stream (late data dropped past the
  watermark) — the engine's streaming-aggregate surface, exercised by tests
  against the batch equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import VIOLATION_COLS
from ..plans.runner import NON_ROW_LEVEL_CHECKS, wave_violations
from ..plans.spec import SuiteSpec

CLIPS_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def incremental_clip_validation(
    spark: SparkSession,
    clips_root: str,
    sink_dir: str,
    checkpoint_dir: str,
    spec: SuiteSpec | None = None,
    ref_df: DataFrame | None = None,
    max_files_per_trigger: int | None = 64,
):
    """Start an available-now stream validating newly-ingested clip files.

    Returns the started ``StreamingQuery``; callers ``awaitTermination()``.
    Re-running after new files land validates ONLY the new files — the
    file-source offset log in ``checkpoint_dir`` is the streaming analogue
    of the batch runner's per-partition verdict markers.

    ``max_files_per_trigger`` defaults to a BOUNDED micro-batch (64 files):
    available-now with no bound puts the ENTIRE backlog in batch 0, so the
    per-batch persist below would spill a full copy of the binary-heavy
    table to executor disk on a first run against a large landing zone.
    Pass ``None`` to explicitly unbound it (small zones, tests).
    """
    spec = spec or SuiteSpec()
    reader = (
        spark.readStream.schema(CLIPS_DDL + ", part int")
        .option("basePath", clips_root)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(clips_root + "/part=*")

    # the spec's row-level subset: identical composition to a batch wave,
    # minus the table-wide checks the stream cannot decide per micro-batch
    row_checks = tuple(c for c in spec.checks if c not in NON_ROW_LEVEL_CHECKS)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Every enabled check is a union branch consuming the micro-batch;
        # as plain lineage each branch re-scans the source files —
        # multiplying the IO on the binary-heavy clips table. Pin the batch
        # once (memory-and-disk, bounded by the 64-file default micro-batch
        # above) so the scan runs once per batch, and release it after the
        # sink write.
        batch_df = batch_df.persist()
        try:
            viols = wave_violations(batch_df, ref_df, spec, row_checks)
            if viols is None:  # empty check subset: nothing to land
                return
            # Exactly-once sink: foreachBatch can REPLAY a batch whose sink
            # write completed but whose offset commit didn't (kill between
            # the two). A plain append would duplicate that batch's
            # violation rows; dynamic overwrite keyed on batch_id replaces
            # exactly the replayed batch's partition instead (the replay
            # reuses the same batch_id from the offset log).
            (
                viols.select(*VIOLATION_COLS)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(sink_dir)
            )
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window stats with a watermark — works on both a
    streaming and a batch DataFrame (the batch run ignores the watermark,
    which is how tests cross-check streamed results).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(value_col).alias("mean_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "mean_value",
            "max_value",
        )
    )
