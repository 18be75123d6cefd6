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
