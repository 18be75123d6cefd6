"""Snapshot-to-snapshot schema evolution (operators/schema_check.py
schema_evolution + the CheckpointStore baseline marker + runner wiring):
Iceberg compatibility rules — add/widen are non-breaking, drop/retype break."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from audit_anomaly_detection_etl_spark.operators import schema_check
from audit_anomaly_detection_etl_spark.plans.checkpoint import CheckpointStore
from audit_anomaly_detection_etl_spark.plans.runner import run_suite


def _st(ddl: str) -> StructType:
    return StructType.fromDDL(ddl)


def test_classification_matrix(spark):
    prev = {"a": "int", "b": "string", "c": "float", "d": "bigint"}
    cur = _st("a bigint, b string, c string, e double")
    got = {o["column"]: o for o in schema_check.schema_evolution(prev, cur)}
    assert got["a"]["issue"] == "evolution_widened" and not got["a"]["breaking"]
    assert "b" not in got  # unchanged -> no entry
    assert got["c"]["issue"] == "evolution_retyped" and got["c"]["breaking"]
    assert got["d"]["issue"] == "evolution_removed" and got["d"]["breaking"]
    assert got["e"]["issue"] == "evolution_added" and not got["e"]["breaking"]


def test_narrowing_is_breaking(spark):
    got = schema_check.schema_evolution({"x": "bigint"}, _st("x int"))
    assert got == [
        {"column": "x", "issue": "evolution_retyped", "expected": "bigint",
         "actual": "int", "breaking": True}
    ]


def test_store_marker_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"))
    assert store.read_table_schema() is None
    store.write_table_schema("snap1", {"a": "int"})
    doc = store.read_table_schema()
    assert doc == {"snapshot_id": "snap1", "columns": {"a": "int"}}


def test_runner_reports_evolution_across_snapshots(spark, clip_dir, tmp_path):
    ckdir = str(tmp_path / "ck")
    clips = os.path.join(clip_dir, "clips")
    kw = dict(
        ref_root=os.path.join(clip_dir, "clips_ref"),
        hist_ref_path=os.path.join(clip_dir, "hist_ref.parquet"),
        checkpoint_dir=ckdir,
    )
    r1 = run_suite(spark, clips_root=clips, **kw)
    assert not any(i["issue"].startswith("evolution_") for i in r1.schema_issues)
    assert CheckpointStore(ckdir).read_table_schema()["snapshot_id"] == r1.snapshot_id

    # evolve the table: widen sr_hz (safe) and add a lang column, preserving
    # the hive part=K layout => new snapshot id (removed/retyped = breaking
    # is covered by the unit matrix; a table missing a spec'd check column
    # is a hard spec violation, not an evolution scenario)
    evolved = str(tmp_path / "clips_v2")
    df = spark.read.parquet(clips)
    df.withColumn("sr_hz", F.col("sr_hz").cast("bigint")).withColumn(
        "lang", F.lit("en")
    ).write.partitionBy("part").parquet(evolved)

    r2 = run_suite(spark, clips_root=evolved, **kw)
    evo = {i["column"]: i for i in r2.schema_issues if i["issue"].startswith("evolution_")}
    assert evo["sr_hz"]["issue"] == "evolution_widened" and not evo["sr_hz"]["breaking"]
    assert evo["lang"]["issue"] == "evolution_added" and not evo["lang"]["breaking"]

    # completed pass moved the baseline: re-running the SAME table is quiet
    r3 = run_suite(spark, clips_root=evolved, **kw)
    assert not any(i["issue"].startswith("evolution_") for i in r3.schema_issues)
