"""Regression tests for core-runner review findings: stale violation
partitions, cross-partition refs under key_partitioned=False, spec-hash
stability with Column predicates, evolution-baseline advancement, the
clean-table violations path, and session-conf hygiene."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators.schema_check import (
    ColumnSpec,
    TableSchemaSpec,
)
from audit_anomaly_detection_etl_spark.plans.checkpoint import CheckpointStore
from audit_anomaly_detection_etl_spark.plans.runner import (
    ranked_violations,
    run_suite,
)
from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec

import numpy as np


def _write_clips(out_dir, rows):
    """rows: list of (clip_id, part, sr, dur, codec, transcript, pcm|None)."""
    table = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array(
                [
                    codecs.encode(
                        r[6] if r[6] is not None else _tone(r[2], r[3]), r[4]
                    )
                    for r in rows
                ],
                pa.binary(),
            ),
            "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
            "dur_ms": pa.array([r[3] for r in rows], pa.int32()),
            "codec": pa.array([r[4] for r in rows], pa.string()),
            "transcript": pa.array([r[5] for r in rows], pa.string()),
            "part": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    pq.write_to_dataset(
        table, out_dir, partition_cols=["part"], basename_template="f-{i}.parquet"
    )


def _tone(sr, dur_ms):
    n = max(1, int(round(dur_ms * sr / 1000.0)))
    t = np.arange(n, dtype=np.float64) / sr
    return np.clip(0.5 * np.sin(2 * np.pi * 200 * t), -0.999, 0.999)


def _write_ref(out_dir, rows):
    """rows: (clip_id, part, pcm, transcript)."""
    table = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "pcm_ref": pa.array(
                [r[2].astype(np.float32).tobytes() for r in rows], pa.binary()
            ),
            "transcript_ref": pa.array([r[3] for r in rows], pa.string()),
            "part": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    pq.write_to_dataset(
        table, out_dir, partition_cols=["part"], basename_template="f-{i}.parquet"
    )


_UNIQ_SPEC = SuiteSpec(checks=("uniqueness",))


def test_revalidated_clean_partition_clears_stale_violations(spark, tmp_path):
    """Run 1: part 0 has a duplicate -> violation rows on disk. The
    partition's files are then replaced with clean data (fingerprint
    changes, plan_resume re-validates). Run 2 must CLEAR the stale rows —
    dynamic partition overwrite alone cannot, because a clean wave writes
    nothing for that partition."""
    clips = str(tmp_path / "clips")
    rows = [
        ("dup", 0, 8000, 100, "pcm_s16le", "t", None),
        ("dup", 0, 8000, 100, "pcm_s16le", "t", None),
        ("ok2", 1, 8000, 100, "pcm_s16le", "t", None),
    ]
    _write_clips(clips, rows)
    ck = str(tmp_path / "ck")
    res1 = run_suite(spark, clips, None, None, ck, spec=_UNIQ_SPEC)
    assert res1.violations_path is not None
    v1 = spark.read.parquet(res1.violations_path).toPandas()
    assert set(v1.key) == {"dup"}
    assert not res1.verdicts[0].passed

    # replace part 0 with clean content (new file name+content -> new digest)
    import shutil

    shutil.rmtree(os.path.join(clips, "part=0"))
    _write_clips(clips, [("fixed", 0, 8000, 100, "pcm_s16le", "t", None)])

    res2 = run_suite(spark, clips, None, None, ck, spec=_UNIQ_SPEC)
    assert 0 in res2.ran_parts  # fingerprint change forced re-validation
    assert res2.verdicts[0].passed
    # the stale rows are gone: either no files remain or zero rows survive
    if res2.violations_path is not None:
        v2 = spark.read.parquet(res2.violations_path).toPandas()
        assert len(v2) == 0
    # a clean result is also consumable through the public reader
    assert ranked_violations(spark, res2.violations_path).count() == 0


def test_non_key_partitioned_payload_checks_cross_partition_refs(spark, tmp_path):
    """key_partitioned=False with the payload check: a clip whose ref row
    lives in a DIFFERENT partition must still be SNR-checked (a wave-pruned
    ref side would silently skip it)."""
    clips = str(tmp_path / "clips")
    ref = str(tmp_path / "ref")
    good = _tone(8000, 100)
    bad = np.clip(good + 0.8 * np.random.RandomState(0).randn(len(good)), -0.999, 0.999)
    # clip 'x' sits in part 0 but its ref row sits in part 1; payload corrupt
    _write_clips(clips, [("x", 0, 8000, 100, "pcm_s16le", "t", bad),
                         ("y", 1, 8000, 100, "pcm_s16le", "t", None)])
    _write_ref(ref, [("x", 1, good, "t"), ("y", 1, _tone(8000, 100), "t")])
    spec = SuiteSpec(checks=("payload",), key_partitioned=False)
    res = run_suite(
        spark, clips, ref, None, str(tmp_path / "ck"), spec=spec, wave_size=1
    )
    v = spark.read.parquet(res.violations_path).toPandas()
    assert "x" in set(v[v.check == "payload_snr"].key)


def test_spec_hash_stable_for_equal_column_predicates():
    """Two separately-constructed but equal Column predicates must produce
    the SAME spec hash — hashing py4j object internals would invalidate
    every checkpoint on each new driver process."""

    def mk():
        schema = TableSchemaSpec(
            columns=[ColumnSpec("clip_id", "string", nullable=False)],
            key_col="clip_id",
            part_col="part",
            extra_predicates={"positive_dur": F.col("dur_ms") > 0},
        )
        return SuiteSpec(schema_spec=schema)

    assert mk().spec_hash() == mk().spec_hash()


def test_breaking_evolution_reported_until_fixed(spark, tmp_path):
    """A breaking schema evolution (dropped column) must re-report on every
    run until resolved — the baseline must NOT advance past it."""
    clips = str(tmp_path / "clips")
    _write_clips(clips, [("a", 0, 8000, 100, "pcm_s16le", "t", None)])
    ck = str(tmp_path / "ck")
    store = CheckpointStore(ck)
    spec = SuiteSpec(checks=("schema",))
    # baseline from a previous snapshot that had an extra column
    store.write_table_schema("oldsnap", {"clip_id": "string", "gone": "double"})

    res1 = run_suite(spark, clips, None, None, ck, spec=spec)
    assert any(i.get("breaking") for i in res1.schema_issues)
    # baseline NOT advanced: a second run still reports the break
    res2 = run_suite(spark, clips, None, None, ck, spec=spec)
    assert any(i.get("breaking") for i in res2.schema_issues)


def test_clean_table_violations_path_none_and_conf_untouched(spark, tmp_path):
    _write_clips(
        str(tmp_path / "clips"), [("a", 0, 8000, 100, "pcm_s16le", "t", None)]
    )
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    res = run_suite(
        spark, str(tmp_path / "clips"), None, None, str(tmp_path / "ck"),
        spec=_UNIQ_SPEC,
    )
    assert res.violations_path is None
    assert ranked_violations(spark, res.violations_path).count() == 0
    # run_suite must not mutate the shared session's overwrite semantics
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    ) == before


def test_encoding_check_requires_text_column():
    spec = SuiteSpec(
        schema_spec=TableSchemaSpec(
            columns=[ColumnSpec("clip_id", "string", nullable=False)],
            key_col="clip_id",
            part_col="part",
        )
    )  # default checks include 'encoding' but schema lacks 'transcript'
    with pytest.raises(ValueError, match="encoding check"):
        run_suite(None, "/nonexistent", None, None, "/tmp/never", spec=spec)


def test_violation_sink_cap_bounds_rows_but_counts_stay_exact(spark, tmp_path):
    """A partition tripping one check on many rows writes only the capped
    top-severity examples to the sink, while the verdict's per-check counts
    come from the FULL violation set. Part 1 stays under the cap and is
    untouched."""
    clips = str(tmp_path / "clips")
    rows = (
        # 7 rows of one duplicated clip_id in part 0 -> 7 uniqueness rows
        [("dup", 0, 8000, 100, "pcm_s16le", "t", None)] * 7
        # part 1: a single duplicate pair -> 2 rows, below the cap
        + [("pair", 1, 8000, 100, "pcm_s16le", "t", None)] * 2
        + [("ok", 1, 8000, 100, "pcm_s16le", "t", None)]
    )
    _write_clips(clips, rows)
    spec = SuiteSpec(checks=("uniqueness",), max_violation_rows_per_check=3)
    res = run_suite(spark, clips, None, None, str(tmp_path / "ck"), spec=spec)
    # exact counts, from the uncapped set
    assert res.verdicts[0].violations_by_check == {"uniqueness": 7}
    assert res.verdicts[1].violations_by_check == {"uniqueness": 2}
    v = spark.read.parquet(res.violations_path).toPandas()
    assert len(v[v.part == 0]) == 3  # sink capped
    assert len(v[v.part == 1]) == 2  # under cap: untouched
    # truncation is discoverable: count exceeds surviving sink rows
    assert res.verdicts[0].n_violations > len(v[v.part == 0])


def test_violation_sink_cap_none_keeps_every_row(spark, tmp_path):
    clips = str(tmp_path / "clips")
    _write_clips(clips, [("dup", 0, 8000, 100, "pcm_s16le", "t", None)] * 5)
    spec = SuiteSpec(checks=("uniqueness",), max_violation_rows_per_check=None)
    res = run_suite(spark, clips, None, None, str(tmp_path / "ck"), spec=spec)
    assert res.verdicts[0].violations_by_check == {"uniqueness": 5}
    assert spark.read.parquet(res.violations_path).count() == 5


def test_violation_sink_cap_applies_to_global_checks(spark, tmp_path):
    """key_partitioned=False routes uniqueness through the global pass; its
    sink must honor the same cap while global_violations_by_check stays
    exact."""
    clips = str(tmp_path / "clips")
    _write_clips(clips, [("dup", 0, 8000, 100, "pcm_s16le", "t", None)] * 7)
    spec = SuiteSpec(
        checks=("uniqueness",), key_partitioned=False,
        max_violation_rows_per_check=3,
    )
    res = run_suite(spark, clips, None, None, str(tmp_path / "ck"), spec=spec)
    assert res.global_violations_by_check == {"uniqueness": 7}  # exact
    gv = spark.read.parquet(res.global_violations_path)
    assert gv.count() == 3  # sink capped


def test_spec_loader_validates_violation_cap(tmp_path):
    from audit_anomaly_detection_etl_spark.plans.spec import spec_from_dict

    assert spec_from_dict({"max_violation_rows_per_check": 50}).max_violation_rows_per_check == 50
    assert spec_from_dict({"max_violation_rows_per_check": None}).max_violation_rows_per_check is None
    with pytest.raises(ValueError, match="must be >= 1 or null"):
        spec_from_dict({"max_violation_rows_per_check": 0})
