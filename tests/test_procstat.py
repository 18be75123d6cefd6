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


# A grandchild that burns ~0.5 cpu-s then lingers so the census can observe
# it both before and after its parent dies.
_ORPHAN_GRANDCHILD = (
    "import time\n"
    "t0 = time.process_time()\n"
    "while time.process_time() - t0 < 0.5:\n"
    "    sum(i * i for i in range(10000))\n"
    "time.sleep(4)\n"
)

_ORPHAN_PARENT = (
    "import subprocess, sys, time\n"
    f"p = subprocess.Popen([sys.executable, '-c', {_ORPHAN_GRANDCHILD!r}])\n"
    "print(p.pid, flush=True)\n"
    "time.sleep(120)\n"
)


def test_orphaned_grandchild_cpu_is_retained():
    """SIGKILLing the middle process reparents the CPU-burning grandchild
    to init: its ticks never fold into any cutime this tree can read. The
    census must keep charging it while it lives and retain its last-seen
    CPU after it exits (the q44 catalog-scaling negative-delta artifact)."""
    import os
    import signal
    import time

    c0 = proc_tree_cpu_seconds()
    parent = subprocess.Popen(
        [sys.executable, "-c", _ORPHAN_PARENT], stdout=subprocess.PIPE
    )
    gc_pid = int(parent.stdout.readline())
    # sample while the grandchild burns, so the census tracks its identity
    deadline = time.time() + 30
    while time.time() < deadline:
        proc_tree_cpu_seconds()
        try:
            with open(f"/proc/{gc_pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            if (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK") >= 0.4:
                break
        except OSError:
            break
        time.sleep(0.05)
    parent.send_signal(signal.SIGKILL)
    parent.wait()  # reap the parent; grandchild is now init's
    mid = proc_tree_cpu_seconds()
    assert mid >= c0 + 0.4, f"orphaned-but-alive CPU lost: {mid - c0:.3f}"
    # wait for the orphan to exit, then the retained total must still hold
    deadline = time.time() + 30
    while os.path.exists(f"/proc/{gc_pid}") and time.time() < deadline:
        time.sleep(0.1)
    final = proc_tree_cpu_seconds()
    assert final >= mid - 1e-9, (c0, mid, final)
    assert final >= c0 + 0.4, f"orphan-exit CPU lost: {final - c0:.3f}"


# Child burns ~0.5 cpu-s then lingers briefly; parent exits WITHOUT reaping
# it (os._exit skips destructors), so the child is orphaned to init and its
# exit folds its CPU where no in-tree cutime can see it.
_LEAK_CHILD = (
    "import time\n"
    "t0 = time.process_time()\n"
    "while time.process_time() - t0 < 0.5:\n"
    "    sum(i * i for i in range(10000))\n"
    "time.sleep(1.5)\n"
)

_LEAK_PARENT = (
    "import os, subprocess, sys\n"
    f"p = subprocess.Popen([sys.executable, '-c', {_LEAK_CHILD!r}])\n"
    "print(p.pid, flush=True)\n"
    "sys.stdin.readline()\n"
    "os._exit(0)\n"  # exit without reaping: child -> init
)


def test_broken_reap_chain_cpu_is_retained():
    """The round-5 scaling-run artifact: a descendant whose last sighting
    was IN-TREE vanishes between two samples with its reap chain broken
    (parent exited first, child orphaned to init, child exits) — no
    surviving in-tree cutime ever receives its ticks. The conservation
    check must retain the shortfall; before it, the whole amount silently
    left the total and the floor masked real work as zero deltas."""
    import os
    import time

    c0 = proc_tree_cpu_seconds()
    parent = subprocess.Popen(
        [sys.executable, "-c", _LEAK_PARENT],
        stdout=subprocess.PIPE,
        stdin=subprocess.PIPE,
        text=True,
    )
    child_pid = int(parent.stdout.readline())
    # sample while the child burns so the census tracks it as in-tree
    deadline = time.time() + 30
    while time.time() < deadline:
        proc_tree_cpu_seconds()
        try:
            with open(f"/proc/{child_pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            if (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK") >= 0.45:
                break
        except OSError:
            break
        time.sleep(0.05)
    # release the parent: it exits WITHOUT reaping; then wait for the child
    # to be fully gone, taking NO samples in between — the vanish must be
    # observed as a single in-tree disappearance
    parent.stdin.write("\n")
    parent.stdin.flush()
    parent.wait()
    deadline = time.time() + 30
    while os.path.exists(f"/proc/{child_pid}") and time.time() < deadline:
        time.sleep(0.1)
    delta = proc_tree_cpu_seconds() - c0
    assert delta >= 0.45, f"broken-reap-chain CPU lost: delta={delta:.3f}"
    # The sharper half of the regression: the monotone floor preserves the
    # PEAK, so the loss shows up as the counter eating SUBSEQUENT work
    # until the raw total re-climbs (the zero-delta windows in the round-5
    # scaling run). Work done AFTER the leak must be fully measured.
    c1 = proc_tree_cpu_seconds()
    subprocess.run([sys.executable, "-c", BURN], check=True)  # ~0.3 cpu-s
    after = proc_tree_cpu_seconds() - c1
    assert after >= 0.25, (
        f"post-leak work eaten by the floor: delta={after:.3f} "
        "(the leaked CPU was never retained)"
    )
