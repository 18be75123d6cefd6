"""applyInPandasWithState cross-batch duplicate monitor
(streaming/stateful.py): state survives micro-batch and restart boundaries
through the streaming checkpoint."""

import json
import os

from audit_anomaly_detection_etl_spark.streaming import stateful


def _write_jsonl(path: str, keys: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for k in keys:
            f.write(json.dumps({"clip_id": k}) + "\n")


def _run_once(spark, src: str, sink: str, ck: str) -> None:
    stream = spark.readStream.schema("clip_id string").json(src)
    dups = stateful.stateful_duplicate_monitor(stream, key_col="clip_id")

    def dump(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        dups.writeStream.foreachBatch(dump)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()


def test_duplicates_detected_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    # batch 1: b duplicated within the batch; a unique so far
    _write_jsonl(os.path.join(src, "f1.jsonl"), ["a", "b", "b"])
    _run_once(spark, src, sink, ck)
    rows = {r["clip_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) == {"b"}
    assert rows["b"]["n_seen"] == 2 and rows["b"]["n_new"] == 2

    # batch 2 (restarted query, same checkpoint): a reappears -> CROSS-batch
    # duplicate via persisted state; c stays silent
    _write_jsonl(os.path.join(src, "f2.jsonl"), ["a", "c"])
    _run_once(spark, src, sink, ck)
    out = spark.read.parquet(sink).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["clip_id"], []).append(r)
    assert "c" not in by_key
    assert any(r["n_seen"] == 2 and r["n_new"] == 1 for r in by_key["a"])

    # batch 3: b a third time -> running total carries on
    _write_jsonl(os.path.join(src, "f3.jsonl"), ["b"])
    _run_once(spark, src, sink, ck)
    b_rows = [r for r in spark.read.parquet(sink).collect() if r["clip_id"] == "b"]
    assert max(r["n_seen"] for r in b_rows) == 3


# ---------------------------------------------------------------------------
# chronology monitor
# ---------------------------------------------------------------------------

def _write_events(path: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")


def _run_chrono(spark, src: str, sink: str, ck: str) -> None:
    stream = (
        spark.readStream.schema("user_id long, ts string")
        .json(src)
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    late = stateful.stateful_chronology_monitor(stream)

    def dump(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        late.writeStream.foreachBatch(dump)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()


def test_chronology_monitor_detects_cross_batch_late_arrivals(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    # batch 1: user 1 up to 12:00, user 2 up to 11:00 — no late rows, and
    # intra-batch disorder (12:00 before 11:59 in file order) must NOT fire
    _write_events(
        os.path.join(src, "b1.jsonl"),
        [(1, "2024-06-01 12:00:00"), (1, "2024-06-01 11:59:00"),
         (2, "2024-06-01 11:00:00")],
    )
    _run_chrono(spark, src, sink, ck)
    assert not os.path.exists(sink) or spark.read.parquet(sink).count() == 0

    # batch 2 (same checkpoint): user 1 delivers 11:58 — 120 s behind the
    # persisted high water -> late; user 2 moves forward -> silent
    _write_events(
        os.path.join(src, "b2.jsonl"),
        [(1, "2024-06-01 11:58:00"), (2, "2024-06-01 11:30:00")],
    )
    _run_chrono(spark, src, sink, ck)
    rows = {r["user_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_late"] == 1
    assert rows[1]["max_backstep_sec"] == 120.0


def test_chronology_monitor_string_entity_key(spark, tmp_path):
    """Regression: out_schema used to hardcode the group column as long —
    grouping by a string entity key (clip_id) crashed with a schema
    mismatch. The type must be derived from the input stream's schema."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def write(name, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, name), "w") as f:
            for cid, ts in rows:
                f.write(json.dumps({"clip_id": cid, "ts": ts}) + "\n")

    def run():
        stream = (
            spark.readStream.schema("clip_id string, ts string")
            .json(src)
            .selectExpr("clip_id", "CAST(ts AS TIMESTAMP) AS ts")
        )
        late = stateful.stateful_chronology_monitor(stream, group_col="clip_id")

        def dump(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            late.writeStream.foreachBatch(dump)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination()

    write("b1.jsonl", [("clip-a", "2024-06-01 12:00:00")])
    run()
    write("b2.jsonl", [("clip-a", "2024-06-01 11:59:30"), ("clip-b", "2024-06-01 09:00:00")])
    run()
    rows = {r["clip_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) == {"clip-a"}
    assert rows["clip-a"]["n_late"] == 1
    assert rows["clip-a"]["max_backstep_sec"] == 30.0


def test_chronology_monitor_ignores_null_timestamps(spark, tmp_path):
    """A NaT timestamp casts to int64-min in pandas — untreated it would
    score as a ~292,000-year backstep. Null ts rows are the schema check's
    problem; the chronology monitor must skip them entirely."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def write(name, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, name), "w") as f:
            for cid, ts in rows:
                f.write(json.dumps({"clip_id": cid, "ts": ts}) + "\n")

    def run():
        stream = (
            spark.readStream.schema("clip_id string, ts string")
            .json(src)
            .selectExpr("clip_id", "CAST(ts AS TIMESTAMP) AS ts")
        )
        late = stateful.stateful_chronology_monitor(stream, group_col="clip_id")

        def dump(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            late.writeStream.foreachBatch(dump)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination()

    write("b1.jsonl", [("clip-a", "2024-06-01 12:00:00")])
    run()
    # null ts + an on-time arrival: nothing is late, nothing may emit
    write("b2.jsonl", [("clip-a", None), ("clip-a", "2024-06-01 12:01:00")])
    run()
    assert not os.path.exists(sink) or spark.read.parquet(sink).count() == 0
    # a REAL late arrival after the null batch still fires against 12:01
    write("b3.jsonl", [("clip-a", "2024-06-01 12:00:30")])
    run()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1 and rows[0]["n_late"] == 1
    assert rows[0]["max_backstep_sec"] == 30.0
