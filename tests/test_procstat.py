"""proc_tree_cpu_seconds must keep the CPU of descendants that exit: a
reaped child's ticks fold into the parent's cutime/cstime, and the old
live-only sum lost them — producing NEGATIVE per-run deltas whenever a
pyspark worker died between samples (the q36/q50 catalog-scaling
artifact)."""

import subprocess
import sys

from audit_anomaly_detection_etl_spark.procstat import proc_tree_cpu_seconds

BURN = (
    "import time\n"
    "t0 = time.process_time()\n"
    "while time.process_time() - t0 < 0.3:\n"
    "    sum(i * i for i in range(10000))\n"
)


def test_exited_child_cpu_is_retained():
    c0 = proc_tree_cpu_seconds()
    # subprocess.run waits (and so reaps) the child: its ~0.3 CPU-seconds
    # exist only in this process's cutime afterwards
    subprocess.run([sys.executable, "-c", BURN], check=True)
    delta = proc_tree_cpu_seconds() - c0
    assert delta >= 0.25, f"reaped-child CPU lost: delta={delta:.3f}"


def test_monotone_across_child_lifecycle():
    samples = [proc_tree_cpu_seconds()]
    p = subprocess.Popen([sys.executable, "-c", BURN])
    while p.poll() is None:
        samples.append(proc_tree_cpu_seconds())
    p.wait()  # reap
    samples.append(proc_tree_cpu_seconds())
    assert all(b >= a - 1e-9 for a, b in zip(samples, samples[1:])), samples
