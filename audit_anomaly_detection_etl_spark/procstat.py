"""Process-tree CPU accounting for steal-robust benchmarking.

This sandbox runs on a burstable/oversubscribed host whose deliverable CPU
fluctuates 2-10x between minute-scale windows (measured: BENCH.md host
probes). Wall-clock timings taken in different windows are therefore not
comparable across rounds. CPU seconds charged to the process tree ARE
comparable: host steal inflates wall-clock but is never charged to guest
processes, so per-run CPU deltas measure the work the engine actually did.
"""

from __future__ import annotations

import os


def proc_tree_cpu_seconds() -> float:
    """CPU seconds consumed by this process and every descendant — the JVM
    and all pyspark worker daemons — including descendants that have since
    EXITED. Each live process contributes its own utime+stime plus its
    cutime+cstime: the kernel folds a child's total CPU into the parent's
    cutime/cstime only at reap time, and a live child is never in any
    ancestor's cutime, so the sum counts every tick exactly once and is
    monotone non-decreasing. (Summing live utime+stime alone made deltas go
    NEGATIVE whenever a pyspark worker with accumulated CPU was reaped
    between the two samples — the q36/q50 catalog-scaling artifact — and
    silently under-charged any run whose workers exited mid-measurement.)"""
    hz = os.sysconf("SC_CLK_TCK")
    info: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            cpu = int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
            info[int(d)] = (int(parts[1]), cpu)
        except (OSError, IndexError, ValueError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _t) in info.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in info:
            total += info[p][1]
        stack.extend(children.get(p, []))
    return total / hz
