"""Per-partition checkpoint, lineage, and resume planning.

North-rule mandate: "each Iceberg partition's validation result is
checkpointed with lineage + metrics rows so a killed job resumes only
unvalidated partitions." Reference analogue: Kedro's materialized catalog
layers + the pickle import/resume path (SURVEY.md §3.3) — results are
*tables*, so a rerun is a query over what's missing.

Design:
- one JSON marker per (partition) under ``<ckdir>/part=K/verdict.json``,
  written atomically (tmp + rename). A marker is only written after the
  partition's verdict is fully computed, so a kill leaves either a complete
  marker or none — never a torn one.
- the marker records lineage: table snapshot_id, engine version, spec hash.
  A marker whose snapshot/spec doesn't match the current run is *stale* and
  the partition re-validates (data or spec changed => old verdict is void).
- ``plan_resume`` diffs the table's partition listing against valid markers
  and returns only pending partitions — the driver-side work is O(partitions),
  never O(rows).
- violation rows are written separately, hive-partitioned by ``part`` with
  dynamic partition overwrite, so re-validating a partition replaces exactly
  its own violations (idempotent reruns).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass

from ..sources import tableio


@dataclass
class PartitionVerdict:
    part: int
    passed: bool
    n_rows: int
    n_violations: int
    violations_by_check: dict
    metrics: dict
    snapshot_id: str
    spec_hash: str
    engine_version: str
    # partition-grain lineage: marker validity is keyed on THIS (plus the
    # spec hash), not on snapshot_id — an incremental ingest that touches
    # other partitions must not void this one's verdict. snapshot_id stays
    # recorded for reporting/audit. "" = pre-fingerprint marker -> stale.
    part_fingerprint: str = ""


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _marker_path(self, part: int) -> str:
        return os.path.join(self.root, f"part={part}", "verdict.json")

    def write(self, v: PartitionVerdict) -> None:
        path = self._marker_path(v.part)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(v), f, sort_keys=True)
        os.replace(tmp, path)  # atomic on POSIX

    def read(self, part: int) -> PartitionVerdict | None:
        path = self._marker_path(part)
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return PartitionVerdict(**json.load(f))
        except (json.JSONDecodeError, TypeError):
            return None  # torn/garbage marker -> treat as unvalidated

    def write_table_schema(self, snapshot_id: str, types: dict[str, str]) -> None:
        """Record the table schema observed at ``snapshot_id`` — the baseline
        the NEXT run diffs against for schema-evolution checks. Written only
        after a fully-completed pass (runner), so a killed run keeps
        re-reporting the evolution until a clean validation of the new shape."""
        path = os.path.join(self.root, "table_schema.json")
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"snapshot_id": snapshot_id, "columns": types}, f, sort_keys=True)
        os.replace(tmp, path)

    def read_table_schema(self) -> dict | None:
        """{"snapshot_id": ..., "columns": {name: simpleString}} from the
        last completed run, or None on first contact / torn marker."""
        path = os.path.join(self.root, "table_schema.json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                doc = json.load(f)
            return doc if isinstance(doc.get("columns"), dict) else None
        except (json.JSONDecodeError, AttributeError):
            return None

    def completed(
        self,
        snapshot_id: str,
        spec_hash: str,
        fingerprints: dict[int, str] | None = None,
    ) -> dict[int, PartitionVerdict]:
        """Markers still valid under the current lineage. With
        ``fingerprints`` (partition -> manifest digest), validity is
        partition-grained: spec hash AND that partition's own fingerprint —
        a write elsewhere in the table leaves this marker valid. Without it
        (legacy callers), falls back to whole-snapshot equality."""
        out = {}
        for part, v in self.all_markers().items():
            if v.spec_hash != spec_hash:
                continue
            if fingerprints is not None:
                if v.part_fingerprint and v.part_fingerprint == fingerprints.get(part):
                    out[part] = v
            elif v.snapshot_id == snapshot_id:
                out[part] = v
        return out

    def all_markers(self) -> dict[int, PartitionVerdict]:
        """Every readable partition marker, regardless of lineage — the one
        place that knows the marker directory layout (completed() filters it
        by lineage; verdict_diff() diffs two stores' markers)."""
        out: dict[int, PartitionVerdict] = {}
        if not os.path.isdir(self.root):
            return out
        for name in os.listdir(self.root):
            if not name.startswith("part="):
                continue
            try:
                part = int(name.split("=", 1)[1])
            except ValueError:
                continue
            v = self.read(part)
            if v:
                out[part] = v
        return out


def plan_resume(
    table_root: str, store: CheckpointStore, spec_hash: str, spark=None
) -> tuple[str, list[int], dict[int, PartitionVerdict], dict[int, str]]:
    """(snapshot_id, pending partitions, already-valid verdicts,
    per-partition fingerprints). Pending = partitions with no marker valid
    at partition grain — after an incremental ingest only the touched
    partitions re-validate. Pass ``spark`` so an Iceberg-catalog
    ``table_root`` resolves lineage from the table's own snapshots/manifests
    (sources/tableio.py mapping table)."""
    snap = tableio.snapshot_id(table_root, spark)
    parts = [p.part for p in tableio.list_partitions(table_root, spark)]
    fps = tableio.partition_fingerprints(table_root, spark)
    done = store.completed(snap, spec_hash, fps)
    pending = [p for p in parts if p not in done]
    return snap, pending, done, fps


def verdict_diff(store_a: "CheckpointStore", store_b: "CheckpointStore") -> list[dict]:
    """Ops-level diff of two checkpoint stores (run A -> run B): which
    partitions flipped pass/fail, which changed violation mass, which
    appeared or disappeared — the "what regressed since yesterday's run"
    report that turns per-partition verdicts into a monitorable signal.

    Pure driver-side marker reads (O(partitions) JSON files, like
    plan_resume). Each record: part, status in {'flipped_to_fail',
    'flipped_to_pass', 'violations_changed', 'new', 'removed'}, both sides'
    passed/n_violations, and the per-check violation delta — empty list
    means the two runs agree exactly.
    """
    a, b = store_a.all_markers(), store_b.all_markers()
    diffs: list[dict] = []
    for part in sorted(set(a) | set(b)):
        va, vb = a.get(part), b.get(part)
        if va is None or vb is None:
            diffs.append(
                {
                    "part": part,
                    "status": "new" if va is None else "removed",
                    "passed_a": va.passed if va else None,
                    "passed_b": vb.passed if vb else None,
                    "n_violations_a": va.n_violations if va else None,
                    "n_violations_b": vb.n_violations if vb else None,
                    "check_delta": {},
                }
            )
            continue
        checks = set(va.violations_by_check) | set(vb.violations_by_check)
        delta = {
            c: vb.violations_by_check.get(c, 0) - va.violations_by_check.get(c, 0)
            for c in checks
            if vb.violations_by_check.get(c, 0) != va.violations_by_check.get(c, 0)
        }
        if va.passed != vb.passed:
            status = "flipped_to_fail" if va.passed else "flipped_to_pass"
        elif delta:
            status = "violations_changed"
        else:
            continue
        diffs.append(
            {
                "part": part,
                "status": status,
                "passed_a": va.passed,
                "passed_b": vb.passed,
                "n_violations_a": va.n_violations,
                "n_violations_b": vb.n_violations,
                "check_delta": delta,
            }
        )
    return diffs


# ---------------------------------------------------------------------------
# run-over-run metrics log (input to operators/metric_history.py)
# ---------------------------------------------------------------------------

def metric_rows(v: PartitionVerdict) -> list[tuple[str, float]]:
    """Flatten one partition verdict into (metric, value) pairs: row and
    violation totals, per-check violation counts, and every numeric
    column-stat the runner recorded. Names are dotted paths
    (``violations.uniqueness``, ``colstat.dur_ms.mean``) so a history screen
    can group on them directly."""
    rows: list[tuple[str, float]] = [
        ("n_rows", float(v.n_rows)),
        ("n_violations", float(v.n_violations)),
    ]
    for check in sorted(v.violations_by_check):
        rows.append((f"violations.{check}", float(v.violations_by_check[check])))
    for st in (v.metrics or {}).get("column_stats", []):
        col = st.get("column")
        if not col:
            continue
        for key in sorted(st):
            val = st[key]
            if key != "column" and isinstance(val, (int, float)) and val == val:
                rows.append((f"colstat.{col}.{key}", float(val)))
    return rows


def append_metrics_log(store: "CheckpointStore", run_id: str) -> str:
    """Snapshot the store's CURRENT marker set as one metrics-log file,
    ``<root>/metrics_log/run-<run_id>.jsonl`` (atomic tmp+rename; re-running
    the same run_id overwrites its own file — idempotent). One line per
    (part, metric): the long-format history row. Resumed partitions
    contribute their (still valid) marker metrics, so every run logs a FULL
    table snapshot and run-over-run series stay aligned."""
    d = os.path.join(store.root, "metrics_log")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"run-{run_id}.jsonl")
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        for part, v in sorted(store.all_markers().items()):
            for metric, value in metric_rows(v):
                f.write(
                    json.dumps(
                        {"run": run_id, "part": part, "metric": metric, "value": value},
                        sort_keys=True,
                    )
                    + "\n"
                )
    os.replace(tmp, path)
    return path


def metrics_history(spark, store: "CheckpointStore"):
    """The accumulated metrics log as a long-format DataFrame
    (run, part, metric, value) — the input shape
    ``operators/metric_history.metric_anomalies`` screens. Explicit schema:
    no inference pass over the log files."""
    schema = "run string, part int, metric string, value double"
    d = os.path.join(store.root, "metrics_log")
    files = (
        [os.path.join(d, n) for n in sorted(os.listdir(d)) if n.endswith(".jsonl")]
        if os.path.isdir(d)
        else []
    )
    if not files:  # no log yet (fresh checkpoint / --no-metrics-log runs)
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def run_metric_anomaly_report(
    spark, store: "CheckpointStore", *, k: float = 4.0, min_history: int = 3
):
    """Screen the latest logged run against the history: one row per
    (part, metric) series with >= min_history priors, ``anomalous`` where
    the latest value escapes the robust median +- k*MAD envelope. Empty
    until enough runs are logged — by design (two points are not a trend)."""
    from ..operators.metric_history import metric_anomalies

    return metric_anomalies(
        metrics_history(spark, store),
        run_col="run",
        key_cols=("part",),
        metric_col="metric",
        value_col="value",
        k=k,
        min_history=min_history,
    )
