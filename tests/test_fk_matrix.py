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
