"""Degenerate-input sweep: run every registered catalog query against
EMPTY (or single-row) copies of all input tables.

Both shapes are legitimate at 100 TB scale — partition pruning, fresh
shards, and heavily-filtered branches all hand operators empty or
near-empty inputs — so no query may abort on them. Queries must either
return zero rows, a defined "nothing to report" aggregate, or raise the
few documented loud-failure guards (model fits that require data, REST
probes that assert reachability).

This sweep found and fixed q108's ANSI DIVIDE_BY_ZERO on single-row /
zero-variance input (see tests/test_review_r4_edges.py for the pinned
regression tests).

Usage:
    python scripts/check_degenerate.py [nrows] [name_substring,...]

nrows defaults to 0 (empty tables); 1 sweeps the single-row shape.
Writes sliced copies of /root/testdata/sf0.001 to /tmp/sfdegen<nrows>.

Known loud-failure allowlist (intentional, each documented in place):
  - q55_rest_api_scan: asserts endpoint reachability before scanning
    (mirrors the reference's fail-fast credential/reachability probe).
  - q49/q51 model fits: fit_ensemble raises ValueError("empty") rather
    than silently scoring with an unfit model.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

# Failures that are the operator's documented contract, not defects.
EXPECTED_LOUD = {
    "q49_anomaly_ensemble": "ValueError",
    "q51_anomaly_attribution": "ValueError",
    "q141_shap_attribution": "ValueError",  # same fit_ensemble empty-fit contract
    "q55_rest_api_scan": "AssertionError",
}


def main() -> int:
    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    dst = f"/tmp/sfdegen{nrows}"
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(f"{SRC}/*.parquet"):
        t = pq.read_table(p)
        pq.write_table(t.slice(0, nrows), os.path.join(dst, os.path.basename(p)))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from audit_anomaly_detection_etl_spark.queries import QUERIES

    fails = []
    names = sorted(QUERIES)
    for i, name in enumerate(names):
        if only and not any(s in name for s in only):
            continue
        try:
            n = QUERIES[name](spark, dst).count()
            print(f"[{i + 1}/{len(names)}] {name}: ok ({n} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must visit every query
            kind = type(e).__name__
            if EXPECTED_LOUD.get(name) == kind:
                print(f"[{i + 1}/{len(names)}] {name}: expected-loud {kind}", flush=True)
                continue
            msg = str(e).split("\n")[0][:200]
            print(f"[{i + 1}/{len(names)}] {name}: FAIL {kind}: {msg}", flush=True)
            fails.append((name, kind, msg))

    print(f"\n=== FAILURES: {len(fails)}")
    for f in fails:
        print("  ", *f)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
