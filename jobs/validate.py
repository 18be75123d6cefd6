"""spark-submit entry point for the validation engine.

Usage (north-rule deployment shape):

    spark-submit --py-files dist/engine.zip jobs/validate.py \
        --data /path/clips --ref /path/clips_ref --hist-ref /path/hist_ref.parquet \
        --checkpoint /path/ck --master local[8]

Or directly: ``python jobs/validate.py --synth 2000 --checkpoint /tmp/ck``
(synthesizes a deterministic table first — useful for smoke runs and the
two-parallelism scaling benchmark).

Prints a JSON summary: per-partition verdicts, violation counts by check,
drift metrics, throughput (clips/sec).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.errors import AnalysisException

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audit_anomaly_detection_etl_spark.plans import checkpoint as ckpt
from audit_anomaly_detection_etl_spark.plans.runner import (
    quarantine_rows,
    ranked_violations,
    run_suite,
)
from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec
from audit_anomaly_detection_etl_spark.session import get_spark, ship_package as _ship_package


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="clips table root (hive-partitioned parquet)")
    ap.add_argument("--ref", help="clips_ref table root")
    ap.add_argument("--hist-ref", dest="hist_ref", help="reference histogram parquet")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--wave-size", type=int, default=8)
    ap.add_argument("--synth", type=int, default=0, help="synthesize N clips under --checkpoint/data")
    ap.add_argument("--synth-seed", type=int, default=42)
    ap.add_argument("--synth-dur-ms", type=float, default=400.0)
    ap.add_argument("--top", type=int, default=10, help="print top-N ranked violations")
    ap.add_argument(
        "--quarantine",
        help="directory to write FULL violating rows (payload + per-key "
        "violation summary, partitioned by part) — the subtract-from-"
        "training table; see plans/runner.quarantine_rows",
    )
    ap.add_argument(
        "--spec",
        help="YAML/JSON suite-spec file (schema columns, drift bins, checks); "
        "its content enters the spec-hash lineage, so editing the file "
        "invalidates prior checkpoints. See conf/suite_default.yml",
    )
    ap.add_argument(
        "--verify-partitioning",
        dest="verify_partitioning",
        action="store_true",
        help="before trusting per-wave key checks, empirically verify the "
        "key_partitioned contract (scan key+part columns for cross-partition "
        "duplicates); flips to global key checks if violated",
    )
    ap.add_argument(
        "--no-key-partitioned",
        dest="key_partitioned",
        action="store_false",
        help="the partition column is NOT a function of clip_id: run "
        "uniqueness/referential globally every invocation (incl. resumes) "
        "instead of per-wave — catches cross-wave duplicates on tables "
        "partitioned by e.g. ingest date",
    )
    ap.add_argument(
        "--run-id",
        default=None,
        help="metrics-log run id (default: wall-clock timestamp + pid); "
        "re-using an id overwrites that run's log file (idempotent re-run)",
    )
    ap.add_argument(
        "--no-metrics-log",
        dest="metrics_log",
        action="store_false",
        help="skip appending this run to <checkpoint>/metrics_log and the "
        "run-over-run anomaly screen",
    )
    ap.add_argument(
        "--bucketize",
        type=int,
        default=0,
        metavar="N",
        help="materialize clips+ref bucketed by the key column into N "
        "buckets under <checkpoint>/bucketed and validate THAT layout — "
        "every shuffle in the per-wave violations plan (payload ref-join, "
        "salted uniqueness, referential anti-joins) is elided by the bucket "
        "spec (plan-audit EXTRA_RULES). Written once; later runs re-attach "
        "the same files via DDL so checkpoint fingerprints — and resume — "
        "survive restarts. Migration/demo utility: on a production table, "
        "write the bucketed layout at INGEST instead and point --data at it",
    )
    ap.add_argument("--anomaly-k", type=float, default=4.0,
                    help="robust-envelope width (median +- k*MAD)")
    ap.add_argument("--anomaly-min-history", type=int, default=3,
                    help="prior runs required before a series is screened")
    args = ap.parse_args(argv)

    if args.synth:
        from audit_anomaly_detection_etl_spark.sources import synth

        data_dir = os.path.join(args.checkpoint, "data")
        if not os.path.isdir(os.path.join(data_dir, "clips")):
            t = synth.generate_clips(
                n_clips=args.synth, seed=args.synth_seed, mean_dur_ms=args.synth_dur_ms
            )
            synth.write_clip_tables(t, data_dir)
        args.data = os.path.join(data_dir, "clips")
        args.ref = os.path.join(data_dir, "clips_ref")
        args.hist_ref = os.path.join(data_dir, "hist_ref.parquet")

    if not args.data:
        ap.error("--data required (or --synth N)")

    if args.spec:
        from audit_anomaly_detection_etl_spark.plans.spec import spec_from_file

        spec = spec_from_file(args.spec)
        if not args.key_partitioned:  # CLI flag overrides the file
            spec.key_partitioned = False
    else:
        spec = SuiteSpec(key_partitioned=args.key_partitioned)

    spark = get_spark(master=args.master)
    _ship_package(spark)

    clips_root, ref_root = args.data, args.ref
    bucketized = None
    if args.bucketize:
        from audit_anomaly_detection_etl_spark.sources import tableio

        bdir = os.path.join(args.checkpoint, "bucketed")
        part_col = spec.schema_spec.part_col
        key_col = spec.schema_spec.key_col
        sides = [("validate_clips_b", args.data, os.path.join(bdir, "clips"))]
        if args.ref:
            sides.append(
                ("validate_ref_b", args.ref, os.path.join(bdir, "clips_ref"))
            )
        for tbl, src, dst in sides:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            if os.path.isdir(dst):
                # resume: re-attach the existing files — fingerprints (and
                # therefore checkpoint skip decisions) stay identical
                tableio.register_bucketed(
                    spark, tbl, dst, args.bucketize, key_col, part_col
                )
            else:
                tableio.write_bucketed(
                    spark,
                    spark.read.parquet(src),
                    tbl,
                    dst,
                    args.bucketize,
                    key_col,
                    part_col,
                )
        clips_root = "validate_clips_b"
        ref_root = "validate_ref_b" if args.ref else None
        bucketized = args.bucketize

    partitioning_audit = None
    if args.verify_partitioning and spec.key_partitioned:
        # empirical test of the key_partitioned contract BEFORE trusting the
        # cheap per-wave uniqueness path: any cross-partition duplicate means
        # per-partition checks are incomplete -> flip to global key checks
        # for this run and report it (operators/uniqueness.dup_locality_report)
        from audit_anomaly_detection_etl_spark.operators.uniqueness import (
            dup_locality_report,
        )
        from audit_anomaly_detection_etl_spark.sources import tableio

        r = dup_locality_report(
            tableio.read_table(spark, args.data).select(
                spec.schema_spec.key_col, spec.schema_spec.part_col
            ),
            key_col=spec.schema_spec.key_col,
            part_col=spec.schema_spec.part_col,
        ).collect()[0]
        partitioning_audit = r.asDict()
        if not r["key_partitioned_safe"]:
            spec.key_partitioned = False

    t0 = time.time()
    res = run_suite(
        spark,
        clips_root=clips_root,
        ref_root=ref_root,
        hist_ref_path=args.hist_ref,
        checkpoint_dir=args.checkpoint,
        spec=spec,
        wave_size=args.wave_size,
    )
    elapsed = time.time() - t0
    n_rows = sum(v.n_rows for v in res.verdicts.values() if v.part in set(res.ran_parts))
    top = [
        r.asDict()
        for r in ranked_violations(
            spark, res.violations_path, res.global_violations_path
        ).limit(args.top).collect()
    ]
    quarantined, quarantine_complete, capped_series = None, None, []
    if args.quarantine:
        from audit_anomaly_detection_etl_spark.sources import tableio

        # The violations SINK is example-bounded (spec.max_violation_rows_
        # per_check, top-N per (part, check)) while verdict COUNTS stay
        # exact — so a saturated series means the sink, and therefore the
        # quarantine key set built from it, is missing violating keys.
        # Saturation is exactly detectable from the verdicts; surface it
        # rather than silently under-quarantining (re-run with
        # max_violation_rows_per_check: null for a complete kill-list).
        cap = spec.max_violation_rows_per_check
        if cap is not None:
            for pv in res.verdicts.values():
                for c, n in pv.violations_by_check.items():
                    if n > cap:
                        capped_series.append(
                            {"part": pv.part, "check": c, "n_violations": n}
                        )
            for c, n in (res.global_violations_by_check or {}).items():
                # global counts are cross-part aggregates: > cap means the
                # sink MAY be truncated (conservative, never false-clean)
                if n > cap:
                    capped_series.append(
                        {"part": None, "check": c, "n_violations": n}
                    )
        quarantine_complete = not capped_series
        if capped_series:
            print(
                f"WARNING: {len(capped_series)} violation series hit the "
                f"{cap}-row sink cap; quarantine is missing keys for them. "
                "Re-run with max_violation_rows_per_check: null to "
                "quarantine completely.",
                file=sys.stderr,
            )
        # ranked_violations handles a None violations_path (clean table)
        v = ranked_violations(spark, res.violations_path, res.global_violations_path)
        qdf = quarantine_rows(
            tableio.read_table(spark, args.data),
            v,
            key_col=spec.schema_spec.key_col,
            part_col=spec.schema_spec.part_col,
        )
        qdf.write.mode("overwrite").partitionBy(spec.schema_spec.part_col).parquet(
            args.quarantine
        )
        # read-back count is one cheap scan of the written files (recomputing
        # qdf would re-run the join) — but a CLEAN table writes only _SUCCESS
        # and the schema-less read raises; that path means 0 quarantined rows
        try:
            quarantined = spark.read.parquet(args.quarantine).count()
        except AnalysisException:
            quarantined = 0
    # run-over-run metrics log + anomaly screen: every run appends a full
    # metric snapshot (resumed partitions included, from their markers);
    # once >= min_history prior runs exist, the latest run's metrics are
    # screened against the robust median+-k*MAD envelope of the history —
    # the row-count-collapse / null-spike monitor that fires even when all
    # row-level checks pass (operators/metric_history.py)
    metric_anoms, n_log_runs = None, 0
    if args.metrics_log:
        store = ckpt.CheckpointStore(args.checkpoint)
        run_id = args.run_id or time.strftime("%Y%m%dT%H%M%S") + f".{os.getpid()}"
        ckpt.append_metrics_log(store, run_id)
        log_dir = os.path.join(args.checkpoint, "metrics_log")
        n_log_runs = len(
            [n for n in os.listdir(log_dir) if n.endswith(".jsonl")]
        )
        if n_log_runs > args.anomaly_min_history:
            rep = ckpt.run_metric_anomaly_report(
                spark, store, k=args.anomaly_k, min_history=args.anomaly_min_history
            )
            from pyspark.sql import functions as F

            metric_anoms = [
                r.asDict()
                for r in rep.where("anomalous")
                .orderBy(F.desc("abs_dev"), "part", "metric")
                .limit(10)
                .collect()
            ]

    summary = {
        "bucketized": bucketized,
        "metrics_log_runs": n_log_runs,
        "metric_anomalies_top": metric_anoms,
        "quarantined_rows": quarantined,
        "quarantine_complete": quarantine_complete,
        "capped_violation_series": capped_series or None,
        "partitioning_audit": partitioning_audit,
        "snapshot_id": res.snapshot_id,
        "spec_hash": res.spec_hash,
        "parts_total": len(res.verdicts),
        "parts_ran": len(res.ran_parts),
        "parts_resumed_skip": len(res.skipped_parts),
        "passed": sum(1 for v in res.verdicts.values() if v.passed),
        "failed": sum(1 for v in res.verdicts.values() if not v.passed),
        "violations_by_check": _sum_by_check(res),
        "global_violations_by_check": res.global_violations_by_check,
        "schema_issues": res.schema_issues,
        "rows_validated": n_rows,
        "elapsed_sec": round(elapsed, 3),
        "clips_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else None,
        "top_violations": top,
    }
    print(json.dumps(summary))
    return summary


def _sum_by_check(res) -> dict:
    out: dict[str, int] = {}
    for v in res.verdicts.values():
        for c, n in v.violations_by_check.items():
            out[c] = out.get(c, 0) + n
    return out


if __name__ == "__main__":
    main()
