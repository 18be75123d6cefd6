"""Same-window A/B: payload ref-comparison join, bucketed vs plain parquet.

The payload join is the engine's one table-scale shuffle; writing clips and
clips_ref bucketed by clip_id (tableio.write_bucketed) elides it entirely
(zero Exchange — locked by the plan-audit EXTRA_RULES). This script measures
what that elision is WORTH at local scale, interleaving the two arms within
one window (BENCH.md protocol: never compare across windows):

    python scripts/bench_bucketed_ab.py [--clips 24000] [--rounds 3]

Prints one JSON line with per-round wall + process-tree CPU for each arm,
plus medians and the Exchange-node counts of both plans. Local caveat,
stated up front: on local[N] a shuffle is an in-memory/local-disk exchange,
so the measured delta UNDERSTATES the cluster win — at 1000 executors the
elided Exchange is cross-network movement of the audio payload bytes
themselves (the dominant term). The honest local signal is CPU (serialize +
compress + hash-partition + spill both table-scale sides) plus the plan
shape; BENCH.md records both.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.audit_plans import _nodes, plan_of  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=int(os.environ.get("SPARK_GRAFT_CLIPS", "24000")))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from audit_anomaly_detection_etl_spark.operators import payload
    from audit_anomaly_detection_etl_spark.procstat import proc_tree_cpu_seconds
    from audit_anomaly_detection_etl_spark.session import get_spark
    from audit_anomaly_detection_etl_spark.sources import synth, tableio

    spark = get_spark(
        "bucketed-ab", master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bucketed_ab_")
    try:
        t = synth.generate_clips(n_clips=args.clips, n_parts=16, seed=42)
        synth.write_clip_tables(t, tmp)
        clips_p = spark.read.parquet(t.paths["clips"])
        ref_p = spark.read.parquet(t.paths["clips_ref"])
        tableio.write_bucketed(
            spark, clips_p, "ab_clips_b", f"{tmp}/clips_b", args.buckets
        )
        tableio.write_bucketed(spark, ref_p, "ab_ref_b", f"{tmp}/ref_b", args.buckets)

        # neither side broadcasts at 10^12 clips; pin the local plan to match
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def arm_parquet():
            return payload.payload_report(clips_p, ref_p)

        def arm_bucketed():
            return payload.payload_report(
                tableio.read_table(spark, "ab_clips_b"),
                tableio.read_table(spark, "ab_ref_b"),
            )

        plans = {"parquet": plan_of(arm_parquet()), "bucketed": plan_of(arm_bucketed())}
        exchanges = {k: _nodes(p, "Exchange") for k, p in plans.items()}

        def run(df) -> tuple[float, float]:
            c0, t0 = proc_tree_cpu_seconds(), time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0, proc_tree_cpu_seconds() - c0

        # warmup both arms once (codegen/JIT/python workers), then interleave
        run(arm_parquet())
        run(arm_bucketed())
        res = {"parquet": {"wall": [], "cpu": []}, "bucketed": {"wall": [], "cpu": []}}
        for _ in range(args.rounds):
            for name, arm in (("parquet", arm_parquet), ("bucketed", arm_bucketed)):
                w, c = run(arm())
                res[name]["wall"].append(round(w, 3))
                res[name]["cpu"].append(round(c, 2))

        out = {
            "metric": "payload_join_bucketed_vs_parquet",
            "clips": args.clips,
            "cpus": args.cpus,
            "buckets": args.buckets,
            "exchange_nodes": exchanges,
            "rounds": res,
            "median_cpu_sec": {
                k: round(statistics.median(v["cpu"]), 2) for k, v in res.items()
            },
            "median_wall_sec": {
                k: round(statistics.median(v["wall"]), 3) for k, v in res.items()
            },
        }
        out["cpu_saved_pct"] = round(
            100.0
            * (1 - out["median_cpu_sec"]["bucketed"] / out["median_cpu_sec"]["parquet"]),
            1,
        )
        print(json.dumps(out))
    finally:
        spark.sql("DROP TABLE IF EXISTS ab_clips_b")
        spark.sql("DROP TABLE IF EXISTS ab_ref_b")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
