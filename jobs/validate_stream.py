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
        help="micro-batch size bound (files); default: one available-now batch",
    )
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N clips under --checkpoint/data")
    ap.add_argument("--synth-seed", type=int, default=42)
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
            ref_dir = ref_dir or paths["clips_ref"]
    if not data_dir:
        ap.error("--data or --synth is required")

    sink_dir = args.sink or os.path.join(args.checkpoint, "violations")
    ref_df = spark.read.parquet(ref_dir) if ref_dir else None

    t0 = time.time()
    q = incremental_clip_validation(
        spark,
        data_dir,
        sink_dir,
        os.path.join(args.checkpoint, "stream_offsets"),
        ref_df=ref_df,
        max_files_per_trigger=args.mfpt,
    )
    q.awaitTermination()
    elapsed = time.time() - t0

    rows_this_run = sum(int(p["numInputRows"]) for p in q.recentProgress)
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
        "batches": len(q.recentProgress),
        "elapsed_sec": round(elapsed, 2),
        "clips_per_sec": round(rows_this_run / elapsed, 1) if elapsed > 0 else None,
        "violations_by_check_cumulative": by_check,
        "sink": sink_dir,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
