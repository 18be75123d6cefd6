import numpy as np

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.sources import synth


def test_deterministic():
    a = synth.generate_clips(n_clips=200, seed=42)
    b = synth.generate_clips(n_clips=200, seed=42)
    assert a.clips.equals(b.clips)
    assert a.clips_ref.equals(b.clips_ref)
    assert a.violations_expected.equals(b.violations_expected)


def test_schema_matches_input_hint():
    t = synth.generate_clips(n_clips=50).clips
    names = dict(zip(t.schema.names, [str(f.type) for f in t.schema]))
    assert names == {
        "clip_id": "string",
        "bytes": "binary",
        "sr_hz": "int32",
        "dur_ms": "int32",
        "codec": "string",
        "transcript": "string",
        "part": "int32",
    }


def test_clean_rows_decode_above_30db_and_dur_consistent():
    t = synth.generate_clips(n_clips=300, seed=1)
    bad_ids = set(t.violations_expected.column("clip_id").to_pylist())
    d = t.clips.to_pydict()
    ref = dict(
        zip(
            t.clips_ref.column("clip_id").to_pylist(),
            t.clips_ref.column("pcm_ref").to_pylist(),
        )
    )
    checked = 0
    for i in range(len(d["clip_id"])):
        cid = d["clip_id"][i]
        if cid in bad_ids or cid not in ref:
            continue
        pcm = codecs.decode(d["bytes"][i], d["codec"][i])
        rp = np.frombuffer(ref[cid], dtype=np.float32)
        assert codecs.snr_db(rp, pcm) >= 30.0, cid
        # dur_ms must equal decoded length
        assert d["dur_ms"][i] == round(len(pcm) / d["sr_hz"][i] * 1000)
        checked += 1
    assert checked > 200


def test_violations_injected():
    t = synth.generate_clips(n_clips=3000, seed=42)
    checks = set(t.violations_expected.column("check").to_pylist())
    assert {
        "uniqueness",
        "payload_snr",
        "codec",
        "transcript_null",
        "transcript_mismatch",
        "encoding",
        "referential_missing_ref",
        "referential_orphan_ref",
    } <= checks


def test_drift_shifts_histogram():
    from audit_anomaly_detection_etl_spark.functions import stats

    clean = synth.generate_clips(n_clips=1000, seed=3, inject_violations=False)
    drifted = synth.generate_clips(n_clips=1000, seed=3, drift=True, inject_violations=False)

    def counts(t, col):
        d = t.hist_ref.to_pydict()
        return np.array([c for cc, c in zip(d["col"], d["count"]) if cc == col])

    assert stats.psi(counts(clean, "sr_hz"), counts(drifted, "sr_hz")) > 0.25
    assert stats.psi(counts(clean, "dur_ms"), counts(drifted, "dur_ms")) > 0.1


def test_partition_assignment_stable():
    assert synth.part_of("clip-0042-00000001", 16) == synth.part_of("clip-0042-00000001", 16)
    t = synth.generate_clips(n_clips=500, seed=2)
    parts = set(t.clips.column("part").to_pylist())
    assert parts <= set(range(16)) and len(parts) == 16


def test_partition_health_reports_and_flags_small_files(spark, clip_dir, tmp_path):
    """partition_health: footer-only row counts match the table, and a
    partition planted with many tiny files is recommended for compaction."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from audit_anomaly_detection_etl_spark.sources import tableio

    root = os.path.join(clip_dir, "clips")
    health = {r["part"]: r for r in tableio.partition_health(spark, root).collect()}
    total_rows = sum(r["n_rows"] for r in health.values())
    assert total_rows == spark.read.parquet(root).count()
    assert all(r["n_files"] >= 1 for r in health.values())

    # planted small-file partition: 20 one-row files
    small_root = str(tmp_path / "clips")
    pdir = os.path.join(small_root, "part=0")
    os.makedirs(pdir)
    for i in range(20):
        pq.write_table(pa.table({"clip_id": [f"c{i}"]}), os.path.join(pdir, f"f{i}.parquet"))
    got = tableio.partition_health(spark, small_root, target_file_mb=128.0).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_files"] == 20 and r["n_rows"] == 20
    assert r["compact"] is True

    # one healthy big file -> no compaction
    one_root = str(tmp_path / "one")
    odir = os.path.join(one_root, "part=0")
    os.makedirs(odir)
    pq.write_table(pa.table({"clip_id": [str(i) for i in range(1000)]}),
                   os.path.join(odir, "f.parquet"))
    r2 = tableio.partition_health(spark, one_root, target_file_mb=0.0001).collect()[0]
    assert r2["compact"] is False  # single file never flags
