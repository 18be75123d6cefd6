"""Hunt for a clean host window and fire the co-temporal scaling run.

Automates the CLAUDE.md protocol (two 12-process no-Spark probes 60 s
apart, both >= --bar parallel efficiency) with PRE-STAGED workers: the
co-temporal run is launched immediately in --go-gate mode, so data
synthesis, Spark startup, and all suite warmups happen up front and both
workers PARK at the barrier. When the double-green probe lands, touching
the gate file releases the barrier and measurement begins within ~2 s —
previous attempts lost the window to the minutes of synthesis+warmup
between the green probe and the first measured run (BENCH.md attempts
3-4: the window flipped mid-setup every time).

The hunter keeps probing through the measurement window, so its log IS
the same-window no-Spark host ceiling the engine-normalized metric needs.

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
    ap.add_argument("--clips", type=int, default=16000)
    ap.add_argument("--window", type=float, default=420.0)
    ap.add_argument("--gate", default="/tmp/cot_go")
    ap.add_argument("--out-json", default="/tmp/cot_attempt.json")
    ap.add_argument("--bench-md", default=None,
                    help="append the run's markdown section here (BENCH.md)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (args.gate, f"{args.gate}.armed"):
        if os.path.exists(p):
            os.remove(p)

    cmd = [sys.executable, "scripts/bench_scaling.py", "--cot-only",
           "--clips", str(args.clips), "--window", str(args.window),
           "--go-gate", args.gate]
    if args.bench_md:
        cmd += ["--out", args.bench_md]
    with open("/tmp/cot_run_stdout.log", "w") as so, \
            open("/tmp/cot_run_stderr.log", "w") as se:
        run = subprocess.Popen(cmd, cwd=repo, stdout=so, stderr=se)
    print(f"[hunt] pre-staging cot run pid={run.pid} "
          f"({args.clips} clips); waiting for workers to park", flush=True)

    while not os.path.exists(f"{args.gate}.armed"):
        if run.poll() is not None:
            print("[hunt] cot run died during staging — see "
                  "/tmp/cot_run_stderr.log", flush=True)
            return
        time.sleep(5)
    print("[hunt] workers parked at barrier; probing for a window", flush=True)

    prev_green = False
    n = 0
    fired = False
    while run.poll() is None:
        eff = probe_once()
        n += 1
        print(f"[hunt] probe {n}: 12-proc eff {eff:.3f} "
              f"(prev_green={prev_green}, fired={fired})", flush=True)
        if not fired and eff >= args.bar:
            if prev_green:
                with open(args.gate, "w") as f:
                    f.write("go")
                fired = True
                print("[hunt] double-green — barrier released, "
                      "measurement window open", flush=True)
            prev_green = True
        elif not fired:
            prev_green = False
        time.sleep(args.interval if not fired else 90.0)

    rc = run.wait()
    with open("/tmp/cot_run_stdout.log") as f:
        for line in reversed(f.read().strip().splitlines()):
            if line.startswith("{"):
                with open(args.out_json, "w") as g:
                    g.write(line + "\n")
                try:
                    d = json.loads(line)
                    cot = d.get("cotemporal", {})
                    print(f"[hunt] rc={rc} eff={cot.get('cotemporal_efficiency')} "
                          f"paired={cot.get('paired_efficiency')} -> "
                          f"{args.out_json}", flush=True)
                except Exception:
                    pass
                break
    print("[hunt] done", flush=True)


if __name__ == "__main__":
    main()
