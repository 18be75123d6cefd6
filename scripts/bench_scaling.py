"""Scaling-efficiency evidence: the identical validation job at two
parallelism levels (north rule: throughput efficiency >= 0.8 from N to 4N
executors; no real cluster in this sandbox, so N=local[8] vs 4N=local[32]
per driver instruction — see BASELINE.md).

Protocol:
- synthesize ONE deterministic clips table (seeded, no wall-clock);
- for each parallelism level: fresh SparkSession with master=local[N] and
  shuffle partitions 2N, fresh checkpoint dir (no resume short-circuit),
  run the full suite (schema/uniqueness/referential/drift/stats/payload),
  record clips/sec; repeat --runs times and keep the best (JIT/page-cache
  warmth favors neither level — the levels alternate cold);
- efficiency = (throughput_4N / throughput_N) / 4.

Usage: python scripts/bench_scaling.py [--clips 16000] [--runs 2]
                                       [--low 8] [--high 32] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(cpus: int, paths: dict, n_parts: int, workdir: str, runs: int) -> dict:
    from audit_anomaly_detection_etl_spark.plans.runner import run_suite
    from audit_anomaly_detection_etl_spark.session import get_spark

    spark = get_spark(
        f"scaling-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for r in range(runs):
        ckpt = os.path.join(workdir, f"ck_{cpus}_{r}")
        t0 = time.perf_counter()
        res = run_suite(
            spark,
            clips_root=paths["clips"],
            ref_root=paths["clips_ref"],
            hist_ref_path=paths["hist_ref"],
            checkpoint_dir=ckpt,
            wave_size=n_parts,  # one wave: steady-state throughput
        )
        dt = time.perf_counter() - t0
        n = sum(v.n_rows for v in res.verdicts.values())
        tp = n / dt
        print(f"  local[{cpus}] run {r}: {n} clips in {dt:.1f}s = {tp:.1f} clips/s",
              file=sys.stderr)
        if best is None or tp > best["clips_per_sec"]:
            best = {"cpus": cpus, "clips": n, "sec": round(dt, 2),
                    "clips_per_sec": round(tp, 1)}
    spark.stop()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16000)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out", default=None, help="append a markdown section to this file")
    args = ap.parse_args()

    from audit_anomaly_detection_etl_spark.sources import synth

    workdir = tempfile.mkdtemp(prefix="scaling_bench_")
    try:
        t = synth.generate_clips(n_clips=args.clips, n_parts=args.parts, seed=42)
        paths = synth.write_clip_tables(t, os.path.join(workdir, "data"))
        print(f"synthesized {args.clips} clips / {args.parts} parts", file=sys.stderr)

        low = run_level(args.low, paths, args.parts, workdir, args.runs)
        high = run_level(args.high, paths, args.parts, workdir, args.runs)
        ratio = args.high / args.low
        eff = (high["clips_per_sec"] / low["clips_per_sec"]) / ratio
        out = {
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": f"(tp{args.high}/tp{args.low})/{ratio:g}",
            "low": low,
            "high": high,
            "clips": args.clips,
            "parts": args.parts,
        }
        print(json.dumps(out))
        if args.out:
            with open(args.out, "a") as f:
                f.write(
                    "\n## Scaling run ({clips} clips, {parts} partitions)\n\n"
                    "| master | clips/sec | wall (s) |\n|---|---|---|\n"
                    "| local[{lc}] | {ltp} | {ls} |\n"
                    "| local[{hc}] | {htp} | {hs} |\n\n"
                    "**efficiency = ({htp} / {ltp}) / {ratio:g} = {eff:.3f}**\n".format(
                        clips=args.clips, parts=args.parts,
                        lc=low["cpus"], ltp=low["clips_per_sec"], ls=low["sec"],
                        hc=high["cpus"], htp=high["clips_per_sec"], hs=high["sec"],
                        ratio=ratio, eff=eff,
                    )
                )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
