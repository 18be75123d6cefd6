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

# Census of every process identity (pid, starttime) ever observed inside
# this process's tree, mapping to (last-seen own cpu seconds, last-seen
# reaped-children cpu seconds, was it inside the tree at the last
# sighting). A pyspark worker that gets REPARENTED outside the tree (its
# daemon died first) keeps being charged via this census while it lives,
# and its last-seen CPU is retained when it exits — init reaps orphans, so
# that CPU never folds into any cutime we can read. Identity includes
# starttime so PID reuse cannot resurrect an old entry.
_tracked: dict[tuple[int, int], tuple[float, float, bool]] = {}
_retained_s: float = 0.0
_floor_s: float = 0.0


def proc_tree_cpu_seconds() -> float:
    """CPU seconds consumed by this process and every descendant — the JVM
    and all pyspark worker daemons — including descendants that have since
    EXITED or been reparented away. Guaranteed monotone non-decreasing.

    Three mechanisms, each closing a hole the previous one leaves:

    1. Live in-tree processes contribute their own utime+stime PLUS their
       cutime+cstime: the kernel folds a child's total CPU into the parent
       only at reap time, and a live child is never in any ancestor's
       cutime, so each tick is counted exactly once. (Summing live
       utime+stime alone made deltas go NEGATIVE whenever a pyspark worker
       with accumulated CPU was reaped between samples — the q36/q50
       catalog-scaling artifact.)
    2. A census (module state) keeps charging processes that LEFT the tree
       while alive — e.g. workers orphaned to init when their daemon died —
       and retains their last-seen CPU once they exit, since init's reap
       folds their ticks where no caller can see them. (Losing a reused
       Arrow-worker pool this way produced the q44 NEGATIVE-CPU artifact:
       ~29 accumulated cpu-s vanished mid-leg.)
    3. A CONSERVATION CHECK for identities that vanish while believed
       in-tree: their (own+children) CPU must reappear as a cutime
       INCREASE somewhere in the surviving tree (the reap fold); any
       shortfall means the reap chain broke out of the tree — a py4j JVM
       whose python driver exited first is orphaned to init and exits
       before the next scan, so neither the stray path (2) nor any in-tree
       cutime ever sees its ticks. The shortfall is retained. Without this,
       a whole Spark session's accumulated CPU (hundreds of cpu-s) could
       vanish between two samples and the floor (4) then masked REAL work
       as zero deltas for the rest of the window — the round-5 scaling-run
       artifact (a 52 s local[2] suite measuring 6.8 cpu-s).
    4. A monotone floor absorbs the residual sampling races (a process
       reaped between reading its stat and its parent's stat within one
       scan): a transient dip becomes a zero delta instead of a negative
       one.
    """
    global _retained_s, _floor_s
    hz = os.sysconf("SC_CLK_TCK")
    # pid -> (ppid, own_ticks, child_reaped_ticks, starttime)
    info: dict[int, tuple[int, int, int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            own = int(parts[11]) + int(parts[12])
            cut = int(parts[13]) + int(parts[14])
            info[int(d)] = (int(parts[1]), own, cut, int(parts[19]))
        except (OSError, IndexError, ValueError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _o, _c, _s) in info.items():
        children.setdefault(ppid, []).append(pid)

    tree_ticks, tree_ids = 0, set()
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        rec = info.get(p)
        if rec is not None:
            tree_ticks += rec[1] + rec[2]
            tree_ids.add((p, rec[3]))
        stack.extend(children.get(p, []))

    alive = {
        (pid, rec[3]): (rec[1] / hz, rec[2] / hz) for pid, rec in info.items()
    }
    # cutime increases across the surviving tree: the evidence that a
    # vanished in-tree descendant's CPU was folded somewhere we count
    cut_gain_s = 0.0
    for ident in tree_ids:
        own_s, cut_s = alive[ident]
        prev = _tracked.get(ident)
        if prev is not None:
            cut_gain_s += max(0.0, cut_s - prev[1])
        _tracked[ident] = (own_s, cut_s, True)
    stray_s = 0.0
    lost_in_tree_s = 0.0
    for ident in list(_tracked):
        if ident in tree_ids:
            continue
        if ident in alive:  # reparented out of the tree but still running
            own_s, cut_s = alive[ident]
            _tracked[ident] = (own_s, cut_s, False)
            stray_s += own_s
        else:
            own_s, cut_s, was_in_tree = _tracked.pop(ident)
            if was_in_tree:
                # its (own+children) ticks must now live in some surviving
                # in-tree cutime; the conservation check below retains any
                # shortfall (broken reap chain -> init)
                lost_in_tree_s += own_s + cut_s
            else:
                # exited outside the tree: init reaped it; keep its CPU
                _retained_s += own_s
    _retained_s += max(0.0, lost_in_tree_s - cut_gain_s)

    total = tree_ticks / hz + stray_s + _retained_s
    _floor_s = max(_floor_s, total)
    return _floor_s
