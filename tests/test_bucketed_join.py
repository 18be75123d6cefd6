"""Shuffle-elision + skew evidence for the engine's one table-scale join.

The payload ref-comparison join (operators/payload.py) is the single
biggest shuffle in the default suite at 10^12 clips. Two storage/runtime
answers, both proven here:

1. LAYOUT (shuffle elided): clips and clips_ref written bucketed by
   clip_id (tableio.write_bucketed) give a sort-merge join with ZERO
   Exchange on either side; run_suite over the bucketed table NAMES
   produces verdicts identical to the plain-parquet run, and the
   checkpoint lineage (snapshot id / partition fingerprints) is invariant
   to reading via the catalog name vs the underlying path.

2. RUNTIME (skew split): when the layout is NOT bucketed and one shuffle
   partition carries planted long-duration clips, AQE's OptimizeSkewedJoin
   splits it — asserted on the executed adaptive plan (``skew=true``),
   with thresholds scaled down so local[4]-sized data exhibits the
   100 TB shape.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import payload
from audit_anomaly_detection_etl_spark.plans.runner import run_suite
from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec
from audit_anomaly_detection_etl_spark.sources import synth, tableio
from scripts.audit_plans import _nodes, plan_of


@pytest.fixture(scope="module")
def bucketed_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    t = synth.generate_clips(n_clips=800, n_parts=8, seed=42)
    synth.write_clip_tables(t, str(d))
    clips = spark.read.parquet(t.paths["clips"])
    ref = spark.read.parquet(t.paths["clips_ref"])
    tableio.write_bucketed(spark, clips, "t_clips_b", str(d / "clips_b"), 8)
    tableio.write_bucketed(spark, ref, "t_ref_b", str(d / "ref_b"), 8)
    yield {"dir": str(d), "paths": t.paths}
    spark.sql("DROP TABLE IF EXISTS t_clips_b")
    spark.sql("DROP TABLE IF EXISTS t_ref_b")


def test_bucketed_join_elides_exchange(spark, bucketed_env):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rep = payload.payload_report(
            tableio.read_table(spark, "t_clips_b"),
            tableio.read_table(spark, "t_ref_b"),
        )
        p = plan_of(rep)
        assert _nodes(p, "Exchange") == 0, p[:4000]
        assert _nodes(p, "SortMergeJoin") == 1, p[:4000]
        # the elision must also survive a partition-pruned wave read
        wave = payload.payload_report(
            tableio.read_partitions(spark, "t_clips_b", [0, 1]),
            tableio.read_partitions(spark, "t_ref_b", [0, 1]),
        )
        pw = plan_of(wave)
        assert _nodes(pw, "Exchange") == 0, pw[:4000]
        # catalog-table reads keep hive-style partition pruning too: the
        # wave's IN-filter must reach the scan as a PartitionFilter
        assert "PartitionFilters: [part" in pw, pw[:4000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lineage_invariant_to_catalog_name(spark, bucketed_env):
    """snapshot_id / partition listing / fingerprints over the table NAME
    resolve through the catalog Location to the same filesystem digests a
    path-based caller sees — a checkpoint written against the path stays
    valid when the job is re-pointed at the table name."""
    root = os.path.join(bucketed_env["dir"], "clips_b")
    assert tableio.snapshot_id("t_clips_b", spark) == tableio.snapshot_id(root)
    assert tableio.partition_fingerprints(
        "t_clips_b", spark
    ) == tableio.partition_fingerprints(root)
    parts_n = [p.part for p in tableio.list_partitions("t_clips_b", spark)]
    parts_p = [p.part for p in tableio.list_partitions(root)]
    assert parts_n == parts_p == list(range(8))


def test_suite_over_bucketed_tables_matches_parquet(
    spark, bucketed_env, tmp_path
):
    spec = SuiteSpec()
    r_name = run_suite(
        spark,
        "t_clips_b",
        "t_ref_b",
        bucketed_env["paths"]["hist_ref"],
        str(tmp_path / "ck_name"),
        spec=spec,
    )
    r_path = run_suite(
        spark,
        bucketed_env["paths"]["clips"],
        bucketed_env["paths"]["clips_ref"],
        bucketed_env["paths"]["hist_ref"],
        str(tmp_path / "ck_path"),
        spec=spec,
    )
    assert set(r_name.verdicts) == set(r_path.verdicts) == set(range(8))
    for p in r_name.verdicts:
        a, b = r_name.verdicts[p], r_path.verdicts[p]
        assert (a.passed, a.n_rows, a.violations_by_check) == (
            b.passed,
            b.n_rows,
            b.violations_by_check,
        ), f"part {p} verdict diverged between bucketed-name and parquet runs"
    # resume over the table name: second invocation skips every partition
    r2 = run_suite(
        spark,
        "t_clips_b",
        "t_ref_b",
        bucketed_env["paths"]["hist_ref"],
        str(tmp_path / "ck_name"),
        spec=spec,
    )
    assert r2.ran_parts == [] and sorted(r2.skipped_parts) == list(range(8))


_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_planted_skew_partition(spark):
    """Planted-skew evidence (VERDICT r4 item 6): long-duration clips whose
    keys all hash into ONE shuffle partition make that partition's bytes
    >> median; with the production session's skewJoin config (thresholds
    scaled to local data volume) the executed plan must show the
    sort-merge join marked ``skew=true`` — AQE re-split the hot partition
    at runtime, which is exactly the 100 TB defense for non-bucketed
    layouts."""
    import numpy as np
    import pandas as pd

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ids = spark.range(3000).select(
        F.concat(F.lit("skew-"), F.col("id").cast("string")).alias("clip_id")
    )
    # pick the keys Spark itself will route to shuffle partition 0 — and
    # STRIDE them across the id range: AQE can only split a skewed reduce
    # partition at MAPPER boundaries, so the planted bytes must come from
    # several input splits (as long-duration clips at 10^12 scale always
    # would), not one head-of-table run
    hot_all = [
        r["clip_id"]
        for r in ids.where(
            F.pmod(F.hash("clip_id"), F.lit(n_shuffle)) == 0
        ).collect()
    ]
    hot_set = set(hot_all[:: max(1, len(hot_all) // 60)][:60])
    assert len(hot_set) == 60
    all_ids = [r["clip_id"] for r in ids.collect()]
    # per-row DISTINCT random payloads: shuffle sizes are measured on
    # COMPRESSED blocks, so a repeated literal would LZ4 away the skew
    rng = np.random.default_rng(7)
    payloads = [
        rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
        if cid in hot_set
        else b"\x00\x00"
        for cid in all_ids
    ]
    pdf = pd.DataFrame({"clip_id": all_ids, "bytes": payloads})
    clips = spark.createDataFrame(pdf)
    ref = spark.createDataFrame(pdf.rename(columns={"bytes": "pcm_ref"}))
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        joined = clips.join(ref, "clip_id").select(
            F.sum(F.length("bytes") + F.length("pcm_ref")).alias("b"),
            F.count(F.lit(1)).alias("n"),
        )
        [row] = joined.collect()
        assert row["n"] == 3000
        p = plan_of(joined)
        assert "isFinalPlan=true" in p
        assert "skew=true" in p, p[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_validate_job_bucketize_run_and_resume(tmp_path):
    """jobs/validate.py --bucketize N end-to-end, twice: the first run
    materializes the bucketed layout and validates it; the second run
    re-attaches the SAME files via DDL (register_bucketed), so every
    partition fingerprint matches its checkpoint marker and the resume
    skips all partitions. Subprocess-driven — the real spark-submit shape,
    fresh session each time (which is exactly what makes re-attachment
    necessary)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = str(tmp_path / "ck")

    def run():
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "jobs", "validate.py"),
                "--synth", "400",
                "--checkpoint", ck,
                "--master", "local[2]",
                "--bucketize", "8",
                "--no-metrics-log",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    first = run()
    assert first["bucketized"] == 8
    assert first["parts_ran"] == first["parts_total"] > 0
    assert sum(first["violations_by_check"].values()) > 0
    assert os.path.isdir(os.path.join(ck, "bucketed", "clips"))

    second = run()
    assert second["bucketized"] == 8
    assert second["parts_ran"] == 0, "re-attached layout must resume-skip"
    assert second["parts_resumed_skip"] == first["parts_total"]
    assert second["violations_by_check"] == first["violations_by_check"]
