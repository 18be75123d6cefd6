"""Violation-path tests for operators/sequence: the sf tables are clean
(zero inversions, dense ids), so inject backward timestamps, holes, and
duplicate ids and assert both audits localize them exactly."""

import datetime as dt

from audit_anomaly_detection_etl_spark.operators import sequence


def test_chronology_flags_injected_inversions(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # user 1: monotonic
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(seconds=10)),
        (3, 1, t0 + dt.timedelta(seconds=20)),
        # user 2: one 90s backstep and one 0.5s backstep
        (4, 2, t0),
        (5, 2, t0 - dt.timedelta(seconds=90)),
        (6, 2, t0 + dt.timedelta(seconds=30)),
        (7, 2, t0 + dt.timedelta(seconds=29, milliseconds=500)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["user_id"]: r
        for r in sequence.chronology_audit(df, "user_id", "event_id", "ts").collect()
    }
    assert out[1]["monotonic"] is True
    assert out[1]["n_inversions"] == 0
    assert out[1]["max_backstep_sec"] == 0.0
    assert out[2]["monotonic"] is False
    assert out[2]["n_inversions"] == 2
    assert out[2]["max_backstep_sec"] == 90.0
    assert out[2]["n_events"] == 4


def test_sequence_gaps_localizes_holes_and_dups(spark):
    # bucket 0: ids 0..9 minus {3, 7} -> 2 missing; bucket 1: 10..19 with 12
    # twice -> 1 dup; bucket 2: 20..29 complete
    ids = [i for i in range(30) if i not in (3, 7)] + [12]
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    out = {r["id_bucket"]: r for r in sequence.sequence_gaps(df, "event_id", 10).collect()}
    assert out[0]["n_missing"] == 2 and out[0]["n_dup"] == 0
    assert out[0]["complete"] is False
    assert out[1]["n_missing"] == 0 and out[1]["n_dup"] == 1
    assert out[1]["complete"] is False
    assert out[2]["complete"] is True
    assert out[2]["first_id"] == 20 and out[2]["last_id"] == 29
    assert out[2]["n_present"] == 10 and out[2]["n_distinct"] == 10


def test_cohort_retention_exact_and_approx_agree_within_rsd(spark):
    """Exact tier: hand-computable triangle on a planted cohort layout
    (multiplicity collapses; retention ratios exact). Approx tier
    (exact=False, no pre-distinct + HLL cells) must agree within a loose
    multiple of the requested rsd on every cell."""
    rows = []
    # cohort day 1: users a,b,c active d1; a,b return d2; a returns d3.
    # duplicate events per (user, day) must not inflate counts.
    for u, days in (("a", [1, 1, 2, 3]), ("b", [1, 2, 2]), ("c", [1])):
        for d in days:
            rows.append((u, f"2024-03-0{d} 10:00:00"))
    # cohort day 2: users d,e; e returns day 3
    for u, days in (("d", [2]), ("e", [2, 3, 3])):
        for d in days:
            rows.append((u, f"2024-03-0{d} 11:30:00"))
    df = spark.createDataFrame(rows, "user_id string, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    exact = {
        (r["cohort_day"].day, r["day_offset"]): r
        for r in sequence.cohort_retention(df).collect()
    }
    assert exact[(1, 0)]["n_users"] == 3 and exact[(1, 0)]["retention"] == 1.0
    assert exact[(1, 1)]["n_users"] == 2 and abs(exact[(1, 1)]["retention"] - 2 / 3) < 1e-6
    assert exact[(1, 2)]["n_users"] == 1
    assert exact[(2, 0)]["n_users"] == 2
    assert exact[(2, 1)]["n_users"] == 1 and exact[(2, 1)]["retention"] == 0.5

    approx = {
        (r["cohort_day"].day, r["day_offset"]): r
        for r in sequence.cohort_retention(df, exact=False, rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for k, er in exact.items():
        ar = approx[k]
        # HLL++ rsd is a std-error bound; 5x slack keeps the test deterministic
        assert abs(ar["n_users"] - er["n_users"]) <= max(1, 0.1 * er["n_users"]), k
