"""CSV/JSON source-sink surface (SURVEY.md S3/S5/S6): per-file header
binding, name strip, id attach, widened union, the width-check violation
path, retry policy, and JSON round-trip fidelity."""

import os

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.sources import csvio


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture()
def csv_dir(tmp_path):
    d = str(tmp_path)
    _write(f"{d}/a.csv", " id , name \n1,alpha\n2,beta\n")
    _write(f"{d}/b.csv", "id,name,extra\n3,gamma,x\n")
    _write(f"{d}/c.csv", "id,other\n4,y\n")
    return d


def test_union_strips_headers_and_attaches_id(spark, csv_dir):
    out = csvio.read_csv_union(spark, [f"{csv_dir}/a.csv", f"{csv_dir}/b.csv"])
    # widened union: b's 'extra' is null for a's rows; names stripped
    assert set(out.columns) == {"id", "name", "extra", "source_id"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows["1"]["source_id"] == "a" and rows["1"]["extra"] is None
    assert rows["3"]["source_id"] == "b" and rows["3"]["extra"] == "x"


def test_width_check_raises_on_schema_drift(spark, csv_dir):
    """a(id,name) vs c(id,other): union is 3 wide but the widest input is 2
    — the reference's post-concat ValueError (data_download/nodes.py:126-129)."""
    with pytest.raises(csvio.WidthMismatchError, match="Column count mismatch"):
        csvio.read_csv_union(spark, [f"{csv_dir}/a.csv", f"{csv_dir}/c.csv"])
    # opting out of strictness yields the widened frame instead
    out = csvio.read_csv_union(
        spark, [f"{csv_dir}/a.csv", f"{csv_dir}/c.csv"], strict_width=False
    )
    assert set(out.columns) == {"id", "name", "other", "source_id"}


def test_retry_gives_up_after_max_retries(spark, csv_dir, monkeypatch):
    calls = {"n": 0}
    orig = csvio._read_one_csv

    def flaky(spark_, path, infer, max_retries, delay):
        calls["n"] += 1
        raise OSError("transient")

    monkeypatch.setattr(csvio, "_read_one_csv", flaky)
    with pytest.raises(OSError):
        csvio.read_csv_union(spark, [f"{csv_dir}/a.csv"])
    assert calls["n"] == 1  # _read_one_csv itself owns the loop; probe it directly
    monkeypatch.setattr(csvio, "_read_one_csv", orig)
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        csvio._read_one_csv(spark, f"{csv_dir}/missing_dir/nope.csv", False, 3, 0.0)


def test_retry_counts_attempts(spark, monkeypatch):
    attempts = {"n": 0}

    class FakeReader:
        def option(self, *a):
            return self

        def csv(self, path):
            attempts["n"] += 1
            raise OSError("transient")

    class FakeSpark:
        read = FakeReader()

    with pytest.raises(OSError):
        csvio._read_one_csv(FakeSpark(), "x.csv", False, max_retries=4, retry_delay=0.0)
    assert attempts["n"] == 4


def test_json_roundtrip_exact(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 1.000001 / 3.0).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("maybe"),
    )
    d = str(tmp_path / "j")
    csvio.write_json(src, d, n_files=2)
    back = csvio.read_json(spark, d, schema="id bigint, v double, s string, maybe bigint")
    a = {r["id"]: r for r in src.collect()}
    b = {r["id"]: r for r in back.collect()}
    assert len(a) == len(b)
    for k in a:
        assert a[k]["v"] == b[k]["v"]  # bit-exact double round-trip
        assert a[k]["s"] == b[k]["s"] and a[k]["maybe"] == b[k]["maybe"]


def test_orc_roundtrip_value_exact(spark, tmp_path):
    """ORC write/read preserves schema and exact values incl. doubles,
    timestamps, and nulls."""
    from audit_anomaly_detection_etl_spark.sources import csvio

    rows = [
        (1, 1.000000000001, "a", None),
        (2, -0.1, None, "2024-03-01 12:00:00.123456"),
        (None, float("inf"), "", "1970-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "i long, x double, s string, t string").selectExpr(
        "i", "x", "s", "CAST(t AS TIMESTAMP) AS t"
    )
    p = str(tmp_path / "orc")
    csvio.write_orc(df, p, n_files=2)
    back = csvio.read_orc(spark, p)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=str)
    b = sorted(back.collect(), key=str)
    assert a == b


def test_id_col_collision_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "a.csv"
    p.write_text("x,source_id\n1,z\n")
    with pytest.raises(ValueError, match="already has a column named"):
        csvio.read_csv_union(spark, [str(p)], id_col="source_id")
