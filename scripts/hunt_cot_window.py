"""Hunt for a clean host window and fire the co-temporal scaling run.

Automates the CLAUDE.md protocol: the co-temporal wall-clock measurement
is only meaningful in the rare windows where the burstable host actually
delivers parallel CPU (see BENCH.md "Host-quota signature"), so fire
`bench_scaling.py --cot-only` ONLY after TWO consecutive 12-process
no-Spark probes, 60 s apart, both show >= --bar (default 0.8) parallel
efficiency. Single probes flip within a minute; the double-gate is the
documented guard.

Runs forever (or --max-hours); on a double-green it launches the
co-temporal run, captures its JSON to --out-json, appends the markdown
section to BENCH.md via --out, then exits. Probe results stream to
stderr so a tail -f shows the window history.

Usage:
    nohup python scripts/hunt_cot_window.py >> /tmp/window_hunt.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import cpu_probe  # noqa: E402


def probe_once() -> float:
    p = cpu_probe(levels=(1, 12), reps=50)
    return p[12]["efficiency_vs_1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bar", type=float, default=0.8)
    ap.add_argument("--interval", type=float, default=60.0)
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--clips", type=int, default=16000)
    ap.add_argument("--out-json", default="/tmp/cot_attempt.json")
    ap.add_argument("--bench-md", default=None,
                    help="append the run's markdown section here (BENCH.md)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deadline = time.time() + args.max_hours * 3600
    prev_green = False
    n = 0
    while time.time() < deadline:
        eff = probe_once()
        n += 1
        print(f"[hunt] probe {n}: 12-proc eff {eff:.3f} "
              f"(prev_green={prev_green})", flush=True)
        if eff >= args.bar:
            if prev_green:
                print("[hunt] double-green — firing --cot-only", flush=True)
                cmd = [sys.executable, "scripts/bench_scaling.py",
                       "--cot-only", "--probe", "--clips", str(args.clips)]
                if args.bench_md:
                    cmd += ["--out", args.bench_md]
                r = subprocess.run(cmd, cwd=repo, capture_output=True, text=True)
                # the run prints ONE json line on stdout (after stderr noise)
                for line in reversed(r.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        with open(args.out_json, "w") as f:
                            f.write(line + "\n")
                        break
                sys.stderr.write(r.stderr[-4000:])
                print(f"[hunt] cot run rc={r.returncode}; json -> "
                      f"{args.out_json}", flush=True)
                return
            prev_green = True
        else:
            prev_green = False
        time.sleep(args.interval)
    print("[hunt] deadline reached without a double-green window", flush=True)


if __name__ == "__main__":
    main()
