"""Local replica of the driver's correctness gate: every queries() entry vs
its DuckDB oracle at sf0.001 (full matrix) — row count, column names, and
order-insensitive values.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf001, t)}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if hasattr(v, "item"):  # numpy scalars / Decimal-likes
        try:
            return _norm_cell(v.item())
        except Exception:
            return v
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(_norm_cell(x) for x in row))
    return sorted(rows, key=repr)


def _run_pair(spark, ddb, name, sf_dir):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = qfn(spark, sf_dir).toPandas()
    exp = ddb.execute(sql).df()
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns)), (
        f"{name}: column names differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    exp.columns = [c for c in exp.columns]
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    mism = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
    assert not mism, f"{name}: first mismatch row {mism[0]}: spark={g[mism[0]]} oracle={e[mism[0]]}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, sf001, name):
    _run_pair(spark, ddb, name, sf001)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"check", "n"}


def test_every_query_runs(spark, sf001):
    missing_oracle = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    # non-SQL-expressible ops only (binary audio decode/transform, model scoring)
    assert missing_oracle <= {
        "q33_payload_validate",
        "q44_audio_features",
        "q49_anomaly_ensemble",
        "q51_anomaly_attribution",
        "q61_wav_container_check",
        "q62_resample_audio",
        "q69_audio_neardup",
        "q77_audio_qa_signals",
        "q79_segment_slices",
        "q80_payload_drift",
        "q95_loudness_audit",
        "q102_transcode_qa",
        "q104_bandwidth_audit",
        "q105_partition_health",
        "q112_dup_locality",
        "q117_byte_length_audit",
        "q124_transcript_reuse",
        "q125_label_conflicts",
        "q127_quarantine",
        "q134_dropout_audit",
        "q135_codec_sniff",
        "q136_tonal_audit",
        "q138_stutter_audit",
        "q141_shap_attribution",
        "q142_image_decode_qa",
        "q143_video_container_audit",
    }
    for name in missing_oracle:
        out = entry_mod.queries()[name](spark, sf001)
        assert out.count() >= 1


def test_rows_only_queries_name_their_pytest_oracle():
    """Meta-gate: every registered query WITHOUT a DuckDB oracle must name
    the pytest module holding its exact oracle in its own docstring
    (``tests/test_<x>.py``), and that module must exist. Registering a new
    rows-only query without writing (and pointing at) a pytest oracle fails
    here — the allowlist above can no longer silently drift."""
    import os
    import re

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    missing_oracle = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    problems = []
    for name in sorted(missing_oracle):
        doc = entry_mod.queries()[name].__doc__ or ""
        refs = re.findall(r"tests/(test_\w+\.py)", doc)
        if not refs:
            problems.append(f"{name}: docstring names no tests/test_*.py oracle module")
            continue
        for ref in refs:
            if not os.path.exists(os.path.join(tests_dir, ref)):
                problems.append(f"{name}: referenced oracle module tests/{ref} does not exist")
    assert not problems, "\n".join(problems)
