"""Violation-path test for operators/referential.fk_health_matrix: inject
orphans and null FKs on a two-edge toy schema and assert exact counts."""

from audit_anomaly_detection_etl_spark.operators import referential


def test_fk_matrix_counts_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None), (7, 30)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    clean_child = spark.createDataFrame([(1, 30), (2, 30)], "id long, fk long")

    out = {
        r["edge"]: r
        for r in referential.fk_health_matrix(
            [
                ("child.fk", child, "fk", "parent", parent, "pk"),
                ("clean.fk", clean_child, "fk", "parent", parent, "pk"),
            ]
        ).collect()
    }
    bad = out["child.fk"]
    assert bad["child_rows"] == 7
    assert bad["null_fk_rows"] == 1
    assert bad["distinct_fk"] == 4  # 10, 20, 99, 30
    assert bad["orphan_values"] == 1  # 99
    assert bad["orphan_rows"] == 2  # ids 4 and 5
    assert bad["ok"] is False

    good = out["clean.fk"]
    assert good["child_rows"] == 2
    assert good["orphan_rows"] == 0 and good["null_fk_rows"] == 0
    assert good["ok"] is True


def test_profile_diff_flags_planted_regressions(spark):
    """profile_diff: mean shift, null regression, and range breach each fire
    on a planted current snapshot and stay quiet on a clean one."""
    import numpy as np

    from audit_anomaly_detection_etl_spark.operators import column_stats as cs

    rng = np.random.default_rng(5)
    ref_rows = [(float(v), float(w)) for v, w in zip(
        rng.normal(100, 5, 400), rng.uniform(0, 1, 400))]
    # cur: 'a' mean shifted +10 and one value beyond ref max; 'b' gains nulls
    cur_rows = [(float(v), float(w) if i % 10 else None) for i, (v, w) in enumerate(
        zip(rng.normal(110, 5, 400), rng.uniform(0, 1, 400)))]
    # range breach kept mild (150 ~ 8 sigma) so it doesn't inflate sd_cur
    # enough to mask the mean-shift z
    cur_rows[0] = (150.0, 0.5)
    ref = spark.createDataFrame(ref_rows, "a double, b double")
    cur = spark.createDataFrame(cur_rows, "a double, b double")
    out = {
        r["column"]: r
        for r in cs.profile_diff(
            cs.column_stats(ref, ["a", "b"]), cs.column_stats(cur, ["a", "b"])
        ).collect()
    }
    assert out["a"]["mean_drift"] is True
    assert out["a"]["range_breach"] is True
    assert out["a"]["null_regressed"] is False
    assert out["b"]["null_regressed"] is True
    assert out["b"]["mean_drift"] is False

    # identical snapshots -> all quiet
    same = cs.profile_diff(cs.column_stats(ref, ["a"]), cs.column_stats(ref, ["a"]))
    r = same.collect()[0]
    assert not (r["mean_drift"] or r["null_regressed"] or r["range_breach"])
    assert r["mean_shift_z"] == 0.0


def test_key_hygiene_violation_path(spark):
    """Near-miss keys collide after canonicalization; clean keys are silent."""
    import __spark_entry__ as e  # noqa: F401  (ensures registration imports)

    from audit_anomaly_detection_etl_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Clip_01 ",), ("clip_01",), ("CLIP_01",), ("clip_02",), ("clip 03",),
         ("clip 03",)],
        "p_name string",
    )
    canon = T.normalized_text(F.col("p_name"))
    out = (
        df.select(canon.alias("canon"), "p_name")
        .groupBy("canon")
        .agg(F.countDistinct("p_name").alias("n_variants"))
        .where(F.col("n_variants") > 1)
        .collect()
    )
    got = {r["canon"]: r["n_variants"] for r in out}
    assert got == {"clip_01": 3, "clip 03": 2}  # NBSP canonicalizes to space


def test_dup_locality_separates_intra_and_cross_partition(spark):
    from audit_anomaly_detection_etl_spark.operators import uniqueness as u

    rows = [
        ("a", 0), ("a", 0),            # intra-partition dup
        ("b", 1), ("b", 5),            # cross-partition dup, span 4
        ("c", 2),                      # unique
        ("d", 3), ("d", 3), ("d", 7),  # mixed -> cross, span 4
    ]
    df = spark.createDataFrame(rows, "clip_id string, part int")
    r = u.dup_locality_report(df).collect()[0]
    assert r["n_dup_keys"] == 3
    assert r["n_intra_partition"] == 1
    assert r["n_cross_partition"] == 2
    assert r["max_partition_span"] == 4
    assert r["key_partitioned_safe"] is False

    clean = spark.createDataFrame([("x", 0), ("x", 0), ("y", 1)], "clip_id string, part int")
    r = u.dup_locality_report(clean).collect()[0]
    assert r["n_cross_partition"] == 0 and r["key_partitioned_safe"] is True

    nodups = spark.createDataFrame([("x", 0), ("y", 1)], "clip_id string, part int")
    r = u.dup_locality_report(nodups).collect()[0]
    assert r["n_dup_keys"] == 0 and r["key_partitioned_safe"] is True


def test_transcript_reuse_flags_planted_label_sharing(spark):
    from audit_anomaly_detection_etl_spark.operators import uniqueness as u

    rows = [
        ("hello world", b"\x01\x02"),   # same transcript, 3 distinct audios
        ("hello world", b"\x03\x04"),
        ("hello world", b"\x05\x06"),
        ("exact dup", b"\x0a\x0b"),      # same transcript, SAME audio (not reuse)
        ("exact dup", b"\x0a\x0b"),
        ("unique", b"\x0c"),
        (None, b"\x0d"),
    ]
    df = spark.createDataFrame(rows, "transcript string, bytes binary")
    out = u.transcript_reuse(df).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 3 and out[0]["n_audio_variants"] == 3


def test_label_conflicts_flags_contradictory_transcripts(spark):
    from audit_anomaly_detection_etl_spark.operators import uniqueness as u

    rows = [
        ("take one", b"\x01\x02"),   # same audio, conflicting labels
        ("take two", b"\x01\x02"),
        ("same", b"\x03"),            # same audio, same label (exact dup, fine)
        ("same", b"\x03"),
        ("solo", b"\x04"),
    ]
    df = spark.createDataFrame(rows, "transcript string, bytes binary")
    out = u.label_conflicts(df).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 2 and out[0]["n_transcripts"] == 2


def test_aggregate_reconciliation_verdict_classes(spark):
    from audit_anomaly_detection_etl_spark.operators import referential as r
    from pyspark.sql import functions as F

    parent = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 7.5)], "k long, total double"
    )
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.0), (2, 3.0)], "k long, amt double"
    )
    out = {
        row["k"]: row
        for row in r.aggregate_reconciliation(
            parent, child, "k", "k", "total", F.col("amt")
        ).collect()
    }
    assert out[1]["verdict"] == "consistent" and out[1]["n_children"] == 2
    assert out[2]["verdict"] == "mismatch" and out[2]["abs_diff"] == 7.0
    assert out[3]["verdict"] == "missing_child" and out[3]["n_children"] == 0
    assert out[3]["child_sum"] is None
