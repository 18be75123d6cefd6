"""CSV / JSON source-sink surface (SURVEY.md S3/S5/S6).

Reference analogues (data_download/nodes.py:76-131, catalog.yml:13-26):

- per-file CSV reads fanned out in parallel with a bounded retry policy
  (5 attempts / 2 s backoff in the reference)
- column names whitespace-stripped after read (``rename(columns=str.strip)``)
- a source-id column attached per file (``_attach_id``)
- union with schema widening (``pd.concat(ignore_index=True)``)
- post-union width assertion: the concatenated width must equal the widest
  input's width — if the union is WIDER, two inputs disagreed on columns
  (schema drift at scan time) and the load must fail loudly
  (data_download/nodes.py:126-129 raises ValueError)

Spark-first notes:
- one ``spark.read.csv(path)`` over many files would parse every file
  against the FIRST file's header — silently wrong when per-file schemas
  drift, which is exactly the condition the width check exists to catch. So
  each file contributes its own lazy scan bound to its own header, and the
  union is ``unionByName(allowMissingColumns=True)``; Spark still executes
  the N scans in parallel (one task per file split) — the driver only pays
  one header peek per file, the Dask-cluster fan-out of the reference
  collapsing into ordinary Spark task scheduling.
- the retry loop wraps the *driver-side header/schema peek* (where a flaky
  object store surfaces first); executor-side IO retries ride Spark's own
  task-retry machinery.
- type inference is OFF by default: columns arrive as strings and flow
  through ``schema_check.format_columns`` (the reference's own
  config-driven cast step, P1) — inferSchema=True would buy pandas-like
  dtypes at the cost of an extra full read of every file.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WidthMismatchError(ValueError):
    """Union produced more columns than the widest input: inputs disagree on
    schema (the reference's post-concat ValueError)."""


def _read_one_csv(
    spark: SparkSession,
    path: str,
    infer_schema: bool,
    max_retries: int,
    retry_delay: float,
) -> DataFrame:
    attempt = 0
    while True:
        try:
            df = spark.read.option("header", True).option("inferSchema", infer_schema).csv(path)
            df.schema  # force the driver-side header/schema peek NOW
            return df
        except Exception:
            attempt += 1
            if attempt >= max_retries:
                raise
            time.sleep(retry_delay)


def read_csv_union(
    spark: SparkSession,
    paths: list[str],
    id_col: str | None = "source_id",
    infer_schema: bool = False,
    max_retries: int = 5,
    retry_delay: float = 2.0,
    strict_width: bool = True,
) -> DataFrame:
    """Read N header-bearing CSVs -> stripped column names -> per-file id
    column -> widened union -> width check. Lazy scans; the only eager work
    is one header peek per file.

    ``id_col=None`` skips the id attach. ``strict_width=False`` downgrades
    the width mismatch from raise to a returned attribute-free pass (callers
    that WANT widening, e.g. schema-evolution backfills, opt out).
    """
    frames: list[DataFrame] = []
    widths: list[int] = []
    for p in paths:
        df = _read_one_csv(spark, p, infer_schema, max_retries, retry_delay)
        df = df.toDF(*[c.strip() for c in df.columns])
        widths.append(len(df.columns))
        if id_col is not None:
            if id_col in df.columns:
                # withColumn would silently OVERWRITE the data column and
                # then the width check would blame a phantom mismatch
                raise ValueError(
                    f"read_csv_union: input {p!r} already has a column named "
                    f"{id_col!r}; pass a different id_col (or None)"
                )
            stem = os.path.splitext(os.path.basename(p.rstrip("/")))[0]
            df = df.withColumn(id_col, F.lit(stem))
        frames.append(df)
    if not frames:
        raise ValueError("read_csv_union: no input paths")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    data_width = len(out.columns) - (1 if id_col is not None else 0)
    if strict_width and data_width != max(widths):
        raise WidthMismatchError(
            f"Column count mismatch: unioned frame has {data_width} columns, "
            f"expected {max(widths)}."
        )
    return out


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """CSV sink (S6): header-bearing part files. ``n_files`` caps output
    files for small intermediates (the reference writes one CSV per table);
    None keeps the plan's partitioning (no extra shuffle)."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """JSON-lines sink (S5): schema rides with the data; doubles are written
    at full precision so a round-trip is value-exact."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines scan. Pass an explicit DDL ``schema`` on the 100 TB path —
    schema inference reads the data twice."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """ORC sink: the second columnar interchange format (Hive/Trino-side
    lakes standardize on it). Column-pruned, predicate-pushdown scans work
    exactly like parquet's — and a validation engine gets asked to READ the
    customer's existing format far more often than to convert it. Built-in
    Spark source: no extra jar."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (schema rides with the file footers, like parquet)."""
    return spark.read.orc(path)
