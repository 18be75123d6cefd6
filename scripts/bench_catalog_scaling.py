#!/usr/bin/env python
"""Catalog-wide data-scaling audit: CPU growth per query at sf0.01 vs sf0.1.

The suite-level linearity evidence (BENCH.md: 17.77 vs 17.67 cpu-ms/clip at
4x the clips) covers the north-rule job; this audits the SAME property for
every one of the registered catalog queries — the empirical complement to
the per-plan shuffle/pushdown rules in scripts/audit_plans.py. A query whose
CPU grows much faster than the data is hiding an all-pairs join, an
unbounded window, or a driver-side loop that the plan rules didn't catch;
at 10^12 rows that query is a wall regardless of how green its oracle is.

Method: for each query, run sf0.01 then sf0.1 BACK TO BACK (both legs share
the host window — the same-window pairing the repo's A/B protocol uses,
because host CPU inflation drifts ~1.2x between windows), forced through a
noop write (full plan executes, nothing collected). Report
``ratio = cpu(sf0.1) / cpu(sf0.01)`` against the 10x row-count ratio.

Reading the ratio:
- ratio <~ 10: at-or-below linear. Fixed overhead (JIT, python-worker
  spin-up, driver fits, fixture staging) biases ratios DOWN at small sf, so
  sub-linear readings are expected and unremarkable.
- ratio > FLAG (default 14): investigate — super-linear growth is a real
  signal precisely BECAUSE the bias runs the other way. 14 leaves ~40%
  headroom over linear for window noise on a single pair.
- connector/fixture queries (CSV/REST/xlsx round-trips) stage
  fixed-size fixtures and pin near ratio ~1; they cannot false-flag.

Usage: python scripts/bench_catalog_scaling.py [--flag 14.0] [--filter SUB]
           [--lo /root/testdata/sf0.01] [--hi /root/testdata/sf0.1]
Writes BENCH_catalog_scaling.json (one JSON object) and prints a summary
table; exits 1 if any query exceeds the flag threshold.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--flag", type=float, default=14.0,
                    help="flag queries whose cpu ratio exceeds this")
    ap.add_argument("--filter", default="", help="name substring filter")
    ap.add_argument("--out", default="BENCH_catalog_scaling.json")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from audit_anomaly_detection_etl_spark.procstat import proc_tree_cpu_seconds
    from audit_anomaly_detection_etl_spark.session import get_spark
    from bench import _warmup

    spark = get_spark("catalog-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, args.lo)
    _warmup(spark, args.hi)

    qs = entry_mod.queries()
    rows: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if args.filter and args.filter not in name:
            continue
        rec: dict = {}
        # untimed per-query warmup at the SMALL sf: the first execution of a
        # query shape pays its whole-stage-codegen compile + pandas-udf
        # worker spin-up, which would otherwise land entirely on the lo leg
        # and invert the ratio (measured: q01 lo 6.1 vs hi 2.9 cpu-s without
        # this)
        try:
            _force(fn(spark, args.lo))
        except Exception:  # noqa: BLE001, S110
            pass  # the timed leg below reports the error
        for tag, sf_dir in (("lo", args.lo), ("hi", args.hi)):
            c0, t0 = proc_tree_cpu_seconds(), time.perf_counter()
            try:
                _force(fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                rec[tag] = {"error": str(e)[:200]}
                break
            rec[tag] = {
                "cpu_s": round(proc_tree_cpu_seconds() - c0, 3),
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        if "error" not in rec.get("hi", {}) and "error" not in rec.get("lo", {}) \
                and "hi" in rec:
            lo_cpu = max(rec["lo"]["cpu_s"], 1e-3)
            rec["cpu_ratio"] = round(rec["hi"]["cpu_s"] / lo_cpu, 2)
            rec["flagged"] = rec["cpu_ratio"] > args.flag
        rows[name] = rec
        r = rec.get("cpu_ratio")
        print(
            f"  {name}: lo {rec.get('lo', {}).get('cpu_s', '?')} cpu-s, "
            f"hi {rec.get('hi', {}).get('cpu_s', '?')} cpu-s, "
            f"ratio {r if r is not None else 'ERR'}"
            + ("  <-- FLAG" if rec.get("flagged") else ""),
            file=sys.stderr,
        )

    # deflake pass: a flagged ratio with a tiny lo denominator is usually a
    # CPU-counter under-read (the monotone floor turns a reap-race dip into
    # a ZERO delta — procstat.py), not super-linear growth. Re-measure each
    # flagged pair once and keep the measurement with the LARGER lo leg (the
    # under-read is always on the small side); both attempts are recorded.
    for name in [n for n, r in rows.items() if r.get("flagged")]:
        fn = qs[name]
        retry: dict = {}
        ok = True
        for tag, sf_dir in (("lo", args.lo), ("hi", args.hi)):
            c0, t0 = proc_tree_cpu_seconds(), time.perf_counter()
            try:
                _force(fn(spark, sf_dir))
            except Exception:  # noqa: BLE001
                ok = False
                break
            retry[tag] = {
                "cpu_s": round(proc_tree_cpu_seconds() - c0, 3),
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        if not ok:
            continue
        rec = rows[name]
        rec["first_attempt"] = {"lo": rec["lo"], "hi": rec["hi"]}
        if retry["lo"]["cpu_s"] > rec["lo"]["cpu_s"]:
            rec["lo"], rec["hi"] = retry["lo"], retry["hi"]
        lo_cpu = max(rec["lo"]["cpu_s"], 1e-3)
        rec["cpu_ratio"] = round(rec["hi"]["cpu_s"] / lo_cpu, 2)
        rec["flagged"] = rec["cpu_ratio"] > args.flag
        rec["retried"] = True
        print(
            f"  retry {name}: lo {rec['lo']['cpu_s']} cpu-s, hi "
            f"{rec['hi']['cpu_s']} cpu-s, ratio {rec['cpu_ratio']}"
            + ("  <-- FLAG" if rec["flagged"] else "  (deflaked)"),
            file=sys.stderr,
        )

    ratios = sorted(
        (r["cpu_ratio"], n) for n, r in rows.items() if "cpu_ratio" in r
    )
    flagged = [n for n, r in rows.items() if r.get("flagged")]
    errors = [n for n, r in rows.items()
              if "error" in r.get("lo", {}) or "error" in r.get("hi", {})]
    summary = {
        "metric": "catalog cpu-scaling ratio sf0.01 -> sf0.1 (10x rows)",
        "n_queries": len(rows),
        "median_ratio": ratios[len(ratios) // 2][0] if ratios else None,
        "max_ratio": ratios[-1][0] if ratios else None,
        "max_query": ratios[-1][1] if ratios else None,
        "flag_threshold": args.flag,
        "flagged": flagged,
        "errors": errors,
        "queries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"\n{len(ratios)} paired; median ratio {summary['median_ratio']}, "
        f"max {summary['max_ratio']} ({summary['max_query']}); "
        f"flagged(> {args.flag}x): {flagged or 'none'}; errors: {errors or 'none'}",
        file=sys.stderr,
    )
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
