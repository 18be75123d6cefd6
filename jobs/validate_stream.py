"""spark-submit entry point for INCREMENTAL (ingest-time) validation.

The batch job (``jobs/validate.py``) validates a table; this one validates
a *landing zone*: a Structured Streaming file source tails the clips root,
and each newly-arrived parquet file is run through the row-level checks
(schema domain + payload decode invariants) exactly once — progress is the
stream's file-source offset log, so a killed job resumes at the first
unprocessed file, the streaming analogue of the batch runner's
per-partition verdict markers. Cross-partition checks (uniqueness,
referential, drift) need table-wide state and stay in the batch suite.

Usage (same deployment shape as the batch job):

    spark-submit --py-files dist/engine.zip jobs/validate_stream.py \
        --data /path/clips --ref /path/clips_ref \
        --checkpoint /path/ck --master local[8]

Or directly: ``python jobs/validate_stream.py --synth 500 --checkpoint
/tmp/ck`` (synthesizes a deterministic landing zone first). Re-running the
same command validates ONLY files that landed since the previous run.

Prints a JSON summary: rows validated this run, cumulative violation
counts by check from the sink, throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audit_anomaly_detection_etl_spark.session import get_spark, ship_package
from audit_anomaly_detection_etl_spark.streaming.incremental import (
    incremental_clip_validation,
)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="clips landing root (hive-partitioned parquet)")
    ap.add_argument("--ref", help="clips_ref table root (enables payload checks)")
    ap.add_argument("--sink", help="violations parquet sink (default <checkpoint>/violations)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--max-files-per-trigger", dest="mfpt", type=int, default=None,
        help="micro-batch size bound (files); default: the engine's bounded "
        "default (64); pass 0 to unbound (one available-now batch)",
    )
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N clips under --checkpoint/data")
    ap.add_argument("--synth-seed", type=int, default=42)
    ap.add_argument(
        "--spec",
        help="YAML/JSON suite-spec file (same format as jobs/validate.py); "
        "the stream runs the spec's ROW-LEVEL check subset per micro-batch "
        "(uniqueness/referential/drift stay in the batch suite)",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="audit-anomaly-validation-stream", master=args.master)
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    data_dir = args.data
    ref_dir = args.ref
    if args.synth:
        from audit_anomaly_detection_etl_spark.sources import synth

        data_dir = data_dir or os.path.join(args.checkpoint, "data", "clips")
        if not os.path.exists(data_dir):
            t = synth.generate_clips(n_clips=args.synth, seed=args.synth_seed)
            paths = synth.write_clip_tables(t, os.path.join(args.checkpoint, "data"))
            data_dir = paths["clips"]
        # OUTSIDE the creation branch: on a RE-run the data dir already
        # exists, and deriving ref only at creation time would silently
        # drop the payload/transcript checks for every newly-landed file
        # (ref_df=None narrows the check set with no indication)
        default_ref = os.path.join(args.checkpoint, "data", "clips_ref")
        if ref_dir is None and os.path.isdir(default_ref):
            ref_dir = default_ref
    if not data_dir:
        ap.error("--data or --synth is required")

    sink_dir = args.sink or os.path.join(args.checkpoint, "violations")
    ref_df = spark.read.parquet(ref_dir) if ref_dir else None

    # exact per-run tally: q.recentProgress is CAPPED at
    # spark.sql.streaming.numRecentProgressUpdates (~100 entries), so
    # summing it undercounts any run with more micro-batches (e.g.
    # --max-files-per-trigger 1 over a few hundred files)
    from pyspark.sql.streaming.listener import StreamingQueryListener

    class _Tally(StreamingQueryListener):
        def __init__(self):
            self.rows = 0
            self.batches = 0
            self.done = False

        def onQueryStarted(self, event):  # noqa: D102
            pass

        def onQueryProgress(self, event):  # noqa: D102
            self.rows += int(event.progress.numInputRows)
            self.batches += 1

        def onQueryIdle(self, event):  # noqa: D102
            pass

        def onQueryTerminated(self, event):  # noqa: D102
            self.done = True

    tally = _Tally()
    spark.streams.addListener(tally)

    kwargs = {}
    if args.mfpt is not None:
        # 0 = explicitly unbounded (engine None); else the given bound
        kwargs["max_files_per_trigger"] = args.mfpt or None
    if args.spec:
        from audit_anomaly_detection_etl_spark.plans.spec import spec_from_file

        kwargs["spec"] = spec_from_file(args.spec)
    t0 = time.time()
    q = incremental_clip_validation(
        spark,
        data_dir,
        sink_dir,
        os.path.join(args.checkpoint, "stream_offsets"),
        ref_df=ref_df,
        **kwargs,
    )
    q.awaitTermination()
    elapsed = time.time() - t0
    # listener events are delivered async on the listener bus; the
    # terminated event arrives after every progress event for the query
    deadline = time.time() + 10
    while not tally.done and time.time() < deadline:
        time.sleep(0.1)
    spark.streams.removeListener(tally)

    rows_this_run = tally.rows
    n_batches = tally.batches
    if n_batches == 0:  # listener missed (shouldn't happen): capped fallback
        rows_this_run = sum(int(p["numInputRows"]) for p in q.recentProgress)
        n_batches = len(q.recentProgress)
    by_check: dict[str, int] = {}
    try:
        for r in (
            spark.read.parquet(sink_dir).groupBy("check").count().collect()
        ):
            by_check[r["check"]] = int(r["count"])
    except Exception:  # noqa: BLE001 — zero violations ever: no sink files yet
        pass

    summary = {
        "rows_validated": rows_this_run,
        # observable guard for the re-run regression: payload/transcript
        # checks require the ref table, which must be (re)detected on EVERY
        # run, not just the one that synthesized the data
        "ref_active": ref_df is not None,
        "batches": n_batches,
        "elapsed_sec": round(elapsed, 2),
        "clips_per_sec": round(rows_this_run / elapsed, 1) if elapsed > 0 else None,
        "violations_by_check_cumulative": by_check,
        "sink": sink_dir,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
