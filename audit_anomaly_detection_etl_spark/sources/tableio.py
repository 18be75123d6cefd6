"""Thin Iceberg-style table IO over hive-partitioned parquet.

No Iceberg runtime jar ships in this sandbox, so we emulate the three Iceberg
capabilities the engine depends on (SURVEY.md §7.1 step 1):

1. partition listing       -> directory scan of ``part=K`` dirs
2. snapshot identity       -> deterministic digest of the file manifest
                              (names + sizes), used as checkpoint lineage
3. partition-pruned reads  -> ``spark.read.parquet(root)`` + ``where(part=...)``
                              (Spark prunes hive partition dirs at planning)

On a real cluster the same interface binds to an Iceberg catalog: partitions
from ``table.partitions`` metadata, snapshot from ``snapshot_id``, pruned reads
from the Iceberg source. Everything above this module is storage-agnostic.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_PART_RE = re.compile(r"^part=(\d+)$")


@dataclass(frozen=True)
class PartitionInfo:
    part: int
    n_files: int
    total_bytes: int


def list_partitions(root: str) -> list[PartitionInfo]:
    """Enumerate partition directories with file-count + byte-size stats.

    The byte sizes feed the skew planner (salting factor scales with
    partition byte-size — SURVEY.md §7.3 'Skew').
    """
    out = []
    for name in sorted(os.listdir(root)):
        m = _PART_RE.match(name)
        if not m:
            continue
        pdir = os.path.join(root, name)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        out.append(PartitionInfo(int(m.group(1)), len(files), total))
    return sorted(out, key=lambda p: p.part)


def snapshot_id(root: str) -> str:
    """Digest of the data-file manifest — the lineage token recorded per
    checkpointed partition. Changes whenever the file manifest (names +
    sizes) changes, i.e. on every new ingest/rewrite — matching Iceberg
    snapshot-id semantics. Same files on disk -> same id, so a resumed run
    can trust prior checkpoints.
    """
    h = hashlib.sha256()
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        for f in sorted(filenames):
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                rel = os.path.relpath(p, root)
                h.update(rel.encode())
                h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:16]


def partition_fingerprints(root: str) -> dict[int, str]:
    """Per-partition digest of that partition's OWN file manifest (relative
    names + sizes) — lineage at partition grain. The global ``snapshot_id``
    changes on ANY write to the table; a partition fingerprint changes only
    when that partition's files change, so an incremental ingest that
    appends to 3 of 10^5 partitions re-validates exactly those 3 (checkpoint
    markers elsewhere stay valid). Matches Iceberg's per-partition manifest
    entries the same way snapshot_id matches its snapshot ids.
    """
    out: dict[int, str] = {}
    for name in sorted(os.listdir(root)):
        m = _PART_RE.match(name)
        if not m:
            continue
        pdir = os.path.join(root, name)
        h = hashlib.sha256()
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                h.update(f.encode())
                h.update(str(os.path.getsize(os.path.join(pdir, f))).encode())
        out[int(m.group(1))] = h.hexdigest()[:16]
    return out


def read_table(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(root)


def read_partitions(spark: SparkSession, root: str, parts: list[int]) -> DataFrame:
    """Partition-pruned read: the IN-filter on the hive partition column is
    resolved at planning time (PartitionFilters in the scan node), so only the
    listed ``part=K`` directories are touched.
    """
    df = spark.read.parquet(root)
    from pyspark.sql import functions as F

    return df.where(F.col("part").isin([int(p) for p in parts]))


def partition_health(
    spark: SparkSession,
    root: str,
    target_file_mb: float = 128.0,
    small_file_frac: float = 0.25,
) -> DataFrame:
    """Table-maintenance audit at MANIFEST grain: per partition, file count,
    bytes, rows (parquet footer metadata only — no data pages read), the
    mean file size vs the ``target_file_mb`` a healthy compaction run
    produces, and a ``compact`` recommendation when more than one file per
    partition averages under ``small_file_frac`` of the target.

    The small-file problem is the silent killer of scan throughput at
    10^12 rows (every file is a task + an open + a footer parse); Iceberg's
    ``rewrite_data_files`` fixes it but something has to DECIDE where to run
    it — this audit is that decision table. On a real deployment the same
    report comes from the Iceberg manifests (``table.files`` metadata
    table); here it is rebuilt from the directory manifest + parquet
    footers, which is metadata-scale work on the driver exactly like
    ``snapshot_id``/``partition_fingerprints`` above.
    """
    import pyarrow.parquet as pq

    rows = []
    for info in list_partitions(root):
        pdir = os.path.join(root, f"part={info.part}")
        files = [
            os.path.join(pdir, f)
            for f in sorted(os.listdir(pdir))
            if f.endswith(".parquet")
        ]
        n_bytes = 0
        n_rows = 0
        for fp in files:
            n_bytes += os.path.getsize(fp)
            n_rows += pq.ParquetFile(fp).metadata.num_rows
        n_files = len(files)
        mean_mb = (n_bytes / n_files / 1048576.0) if n_files else 0.0
        rows.append(
            (
                info.part,
                n_files,
                int(n_rows),
                int(n_bytes),
                round(mean_mb, 6),
                bool(n_files > 1 and mean_mb < target_file_mb * small_file_frac),
            )
        )
    return spark.createDataFrame(
        rows,
        "part int, n_files int, n_rows long, n_bytes long, "
        "mean_file_mb double, compact boolean",
    )
