"""Multimodal operators (operators/media.py) + streaming (streaming/).

Audio features are checked against a per-clip numpy oracle; image/video
exercise the stub contract (schema, batching, deterministic fake decode);
streaming checks incremental exactly-once progress and batch/stream parity.
"""

import os
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators import media
from audit_anomaly_detection_etl_spark.sources import synth
from audit_anomaly_detection_etl_spark.streaming import incremental


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def test_audio_features_match_per_clip_oracle(spark):
    t = synth.generate_clips(n_clips=300, n_parts=4, seed=11)
    clips = spark.createDataFrame(t.clips.to_pandas())
    got = media.audio_features(clips).toPandas().set_index("clip_id")

    pdf = t.clips.to_pandas()
    checked = 0
    for _, row in pdf.iterrows():
        g = got.loc[row["clip_id"]]
        if isinstance(g, pd.DataFrame):  # duplicate clip_ids from injection
            g = g.iloc[0]
        if row["codec"] not in codecs.CODECS:
            assert not g["decode_ok"]
            continue
        pcm = codecs.decode(row["bytes"], row["codec"]).astype(np.float64)
        assert g["decode_ok"]
        assert g["n_samples"] == len(pcm)
        np.testing.assert_allclose(g["rms"], np.sqrt(np.mean(pcm**2)), rtol=1e-12)
        np.testing.assert_allclose(g["peak"], np.max(np.abs(pcm)), rtol=1e-12)
        flips = int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        np.testing.assert_allclose(g["zcr"], flips / (len(pcm) - 1), rtol=1e-12)
        checked += 1
    assert checked > 250


def test_audio_features_zcr_no_cross_clip_leak(spark):
    """Two clips whose concatenation boundary is a sign flip: the flip must
    not count toward either clip."""
    a = np.full(64, 0.5)   # all positive, zero crossings = 0
    b = np.full(64, -0.5)  # all negative, zero crossings = 0
    pdf = pd.DataFrame(
        {
            "clip_id": ["a", "b"],
            "bytes": [codecs.encode(a, "pcm_f32le"), codecs.encode(b, "pcm_f32le")],
            "sr_hz": [16000, 16000],
            "dur_ms": [4, 4],
            "codec": ["pcm_f32le", "pcm_f32le"],
            "transcript": ["x", "y"],
            "part": [0, 0],
        }
    )
    got = media.audio_features(spark.createDataFrame(pdf)).toPandas()
    assert (got["zcr"] == 0.0).all()


# ---------------------------------------------------------------------------
# image
# ---------------------------------------------------------------------------

def _fake_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _fake_jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 stub + SOF0 with dims
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", h, w) + b"\x01"
    return b"\xff\xd8" + app0 + sof


def test_image_metadata_header_sniff(spark):
    pdf = pd.DataFrame(
        {
            "image_id": ["p1", "j1", "bad"],
            "bytes": [_fake_png(640, 480), _fake_jpeg(320, 200), b"\x00\x01\x02\x03"],
        }
    )
    got = (
        media.image_metadata(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("image_id")
    )
    assert got.loc["p1", "format"] == "png"
    assert (got.loc["p1", "width"], got.loc["p1", "height"]) == (640, 480)
    assert got.loc["j1", "format"] == "jpeg"
    assert (got.loc["j1", "width"], got.loc["j1", "height"]) == (320, 200)
    assert pd.isna(got.loc["bad", "format"])


def test_image_features_stub_raises_and_fake_is_deterministic(spark):
    pdf = pd.DataFrame({"image_id": ["a", "b"], "bytes": [b"12345678", b"abcdefgh"]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="NotImplementedError|image codec library"):
        media.image_features(df, decoder="stub").collect()
    r1 = media.image_features(df, decoder="fake").toPandas().set_index("image_id")
    r2 = media.image_features(df, decoder="fake").toPandas().set_index("image_id")
    assert r1["decode_ok"].all()
    pd.testing.assert_frame_equal(r1, r2)


def test_frame_sample_plan(spark):
    pdf = pd.DataFrame({"video_id": ["v1", "v2"], "fps": [24.0, 30.0], "dur_ms": [3500, 500]})
    got = (
        media.frame_sample_plan(spark.createDataFrame(pdf), every_ms=1000.0)
        .toPandas()
        .sort_values(["video_id", "frame_idx"])
    )
    v1 = got[got.video_id == "v1"]
    assert list(v1["frame_idx"]) == [0, 24, 48]  # samples at 0s,1s,2s @24fps
    assert list(v1["ts_ms"]) == [0.0, 1000.0, 2000.0]
    v2 = got[got.video_id == "v2"]  # shorter than every_ms -> one frame at 0
    assert list(v2["frame_idx"]) == [0]


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def test_incremental_validation_exactly_once(spark, tmp_path):
    t = synth.generate_clips(n_clips=400, n_parts=4, seed=13)
    data = str(tmp_path / "data")
    synth.write_clip_tables(t, data)
    sink = str(tmp_path / "viol_sink")
    ck = str(tmp_path / "stream_ck")

    q = incremental.incremental_clip_validation(
        spark, os.path.join(data, "clips"), sink, ck
    )
    q.awaitTermination()
    first = spark.read.parquet(sink)
    n_first = first.count()
    batches_first = first.select("batch_id").distinct().count()

    # batch-parity: the stream must land exactly the batch suite's
    # ROW-LEVEL composition (schema + byte_length + encoding by default;
    # no ref table here so payload auto-skips on both sides)
    from audit_anomaly_detection_etl_spark.plans.runner import (
        NON_ROW_LEVEL_CHECKS,
        wave_violations,
    )
    from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec

    spec = SuiteSpec()
    row_checks = tuple(c for c in spec.checks if c not in NON_ROW_LEVEL_CHECKS)
    batch_viols = wave_violations(
        spark.read.parquet(os.path.join(data, "clips")), None, spec, row_checks
    )
    assert n_first == batch_viols.count()
    # the default-ON cheap checks really run at ingest time now
    stream_checks = {r["check"] for r in first.select("check").distinct().collect()}
    batch_checks = {r["check"] for r in batch_viols.select("check").distinct().collect()}
    assert stream_checks == batch_checks

    # re-run with no new files: stream checkpoint skips everything
    q2 = incremental.incremental_clip_validation(
        spark, os.path.join(data, "clips"), sink, ck
    )
    q2.awaitTermination()
    assert spark.read.parquet(sink).count() == n_first

    # new files land -> only they are processed
    t2 = synth.generate_clips(n_clips=100, n_parts=4, seed=14)
    pdf2 = t2.clips.to_pandas()
    extra = str(tmp_path / "data" / "clips" / "part=0" / "late-arrival.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    sub = pdf2[pdf2.part == 0].drop(columns=["part"])
    pq.write_table(pa.Table.from_pandas(sub, preserve_index=False), extra)
    q3 = incremental.incremental_clip_validation(
        spark, os.path.join(data, "clips"), sink, ck
    )
    q3.awaitTermination()
    after = spark.read.parquet(sink)
    new_rows = after.where(~after.batch_id.isin([r.batch_id for r in first.select("batch_id").distinct().collect()]))
    expected_new = wave_violations(
        spark.createDataFrame(pdf2[pdf2.part == 0]), None, spec, row_checks
    ).count()
    assert batches_first >= 1
    assert new_rows.count() == expected_new


def test_windowed_event_stats_batch(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:01:00", "2024-01-01 00:05:00", "2024-01-01 00:15:00"]
            ),
            "value": [1.0, 3.0, 10.0],
        }
    )
    got = (
        incremental.windowed_event_stats(spark.createDataFrame(pdf), window="10 minutes")
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(got) == 2
    assert got.loc[0, "n_events"] == 2 and got.loc[0, "mean_value"] == 2.0
    assert got.loc[1, "n_events"] == 1 and got.loc[1, "max_value"] == 10.0


# ---------------------------------------------------------------------------
# training-window slicing (media.slice_segments / packing.segment_plan)
# ---------------------------------------------------------------------------

def _expected_segments(n_samp: int, sr: int, window_ms: int, hop_ms: int):
    w = max(1, int(round(window_ms * sr / 1000.0)))
    h = max(1, int(round(hop_ms * sr / 1000.0)))
    k_max = 0 if n_samp <= w else -(-(n_samp - w) // h)
    return [(k, k * h, min(k * h + w, n_samp)) for k in range(k_max + 1)]


def test_slice_segments_match_numpy_oracle(spark):
    t = synth.generate_clips(n_clips=200, n_parts=4, seed=11)
    pdf = t.clips.to_pandas()
    clips = spark.createDataFrame(pdf)
    got = (
        media.slice_segments(clips, window_ms=200, hop_ms=100, emit_bytes=True)
        .toPandas()
        .sort_values(["clip_id", "seg_idx"])
    )
    by_clip = {cid: g for cid, g in got.groupby("clip_id")}

    checked_segs = 0
    for _, row in pdf.drop_duplicates("clip_id").iterrows():
        g = by_clip[row["clip_id"]].drop_duplicates(["seg_idx", "start_samp"])
        if row["codec"] not in codecs.CODECS:
            assert list(g["slice_ok"]) == [False]
            assert list(g["seg_idx"]) == [-1]
            continue
        bps = codecs.bytes_per_sample(row["codec"])
        n_samp = len(row["bytes"]) // bps
        exp = _expected_segments(n_samp, int(row["sr_hz"]), 200, 100)
        assert list(g["seg_idx"]) == [e[0] for e in exp]
        assert list(g["start_samp"]) == [e[1] for e in exp]
        assert list(g["end_samp"]) == [e[2] for e in exp]
        # byte-exact slice on sample boundaries; full coverage, window overlap
        for (_, a, b), raw in zip(exp, g["bytes"]):
            assert bytes(raw) == row["bytes"][a * bps : b * bps]
        assert exp[-1][2] == n_samp  # last window reaches the end
        if len(exp) > 1:
            assert exp[-1][1] < n_samp  # no window starts past the end
        checked_segs += len(exp)
    assert checked_segs > 400


def test_segment_plan_matches_slice_geometry(spark):
    """The Catalyst plan (packing.segment_plan) and the byte slicer agree on
    geometry when dur_ms is exact (sr=1000 => 1 sample per ms)."""
    from audit_anomaly_detection_etl_spark.operators import packing

    rows = [("a", 250), ("b", 1000), ("c", 1001), ("d", 5000), ("e", 4501)]
    df = spark.createDataFrame(rows, "clip_id string, dur_ms long")
    plan = (
        packing.segment_plan(df, window_ms=1_000, hop_ms=500)
        .toPandas()
        .sort_values(["clip_id", "seg_idx"])
    )
    for cid, dur in rows:
        exp = _expected_segments(dur, 1000, 1_000, 500)
        g = plan[plan["clip_id"] == cid]
        assert list(g["seg_idx"]) == [e[0] for e in exp]
        assert list(g["start_ms"]) == [e[1] for e in exp]
        assert list(g["end_ms"]) == [e[2] for e in exp]
        assert list(g["seg_ms"]) == [e[2] - e[1] for e in exp]
    # dur <= 0 emits nothing
    z = spark.createDataFrame([("z", 0)], "clip_id string, dur_ms long")
    assert packing.segment_plan(z).count() == 0


# ---------------------------------------------------------------------------
# payload-level drift (drift.payload_drift)
# ---------------------------------------------------------------------------

def test_payload_drift_matches_numpy_psi_oracle(spark):
    from audit_anomaly_detection_etl_spark.functions import stats as _stats
    from audit_anomaly_detection_etl_spark.operators import drift

    base = synth.generate_clips(n_clips=250, n_parts=4, seed=7).clips.to_pandas()
    gained = base.copy()
    gained["bytes"] = [
        codecs.encode(codecs.decode(b, c) * 0.45, c) if c in codecs.CODECS else b
        for b, c in zip(gained["bytes"], gained["codec"])
    ]

    lo, hi, n_bins = -60.0, 0.0, 30
    got = drift.payload_drift(
        spark.createDataFrame(base),
        spark.createDataFrame(gained),
        lo=lo,
        hi=hi,
        n_bins=n_bins,
        min_n=100,
    ).collect()[0]

    def counts(pdf):
        arr = np.zeros(n_bins)
        for b, c in zip(pdf["bytes"], pdf["codec"]):
            if c not in codecs.CODECS:
                continue
            pcm = codecs.decode(b, c).astype(np.float64)
            rms = np.sqrt(np.mean(pcm**2))
            if rms <= 0:
                continue
            dbfs = 20.0 * np.log10(rms)
            # width_bucket clamp semantics: edge bins absorb out-of-range
            k = int(np.floor((dbfs - lo) / (hi - lo) * n_bins))
            arr[min(max(k, 0), n_bins - 1)] += 1
        return arr

    ref, cur = counts(base), counts(gained)
    assert got["n_ref"] == int(ref.sum()) and got["n_cur"] == int(cur.sum())
    np.testing.assert_allclose(got["psi"], round(_stats.psi(ref, cur), 6), atol=1e-9)
    np.testing.assert_allclose(
        got["ks"], round(_stats.ks_statistic(ref, cur), 6), atol=1e-9
    )
    assert got["drifted"]  # 0.45x gain is ~-7 dB: must trip PSI

    # same-process regeneration must NOT drift
    fresh = synth.generate_clips(n_clips=250, n_parts=4, seed=8).clips.to_pandas()
    same = drift.payload_drift(
        spark.createDataFrame(base), spark.createDataFrame(fresh), min_n=100
    ).collect()[0]
    assert not same["drifted"] and same["psi"] < 0.1


def test_validate_stream_job_summary_and_resume(spark, tmp_path):
    """The spark-submit streaming job: one run validates every landed file
    exactly once (numInputRows counts ONE scan of the micro-batch, not one
    per check branch), prints the violation families, and a re-run with no
    new files validates zero rows — the file-offset log is the resume
    marker."""
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo_root, "jobs"))
    import validate_stream

    ck = str(tmp_path / "ck")
    s1 = validate_stream.main(["--synth", "200", "--checkpoint", ck])
    assert s1["rows_validated"] == 200
    assert "transcript_mismatch" in s1["violations_by_check_cumulative"]
    assert "payload_snr" in s1["violations_by_check_cumulative"]

    s2 = validate_stream.main(["--synth", "200", "--checkpoint", ck])
    assert s2["rows_validated"] == 0
    # the ref table must be REdetected on the re-run (data dir already
    # exists, so the synth-creation branch is skipped) — otherwise every
    # newly-landed file would silently skip the payload/transcript checks
    assert s1["ref_active"] and s2["ref_active"]
    # cumulative sink is unchanged by the no-op run
    assert (
        s2["violations_by_check_cumulative"] == s1["violations_by_check_cumulative"]
    )


def test_incremental_sink_survives_batch_replay_without_duplicates(spark, tmp_path):
    """Kill-point realism: Structured Streaming commits the sink write
    BEFORE the offset commit, so a crash between the two replays the whole
    micro-batch on restart. Simulate exactly that by deleting the last
    batch's commit marker from the offset log and re-running — the
    batch_id-keyed dynamic overwrite must leave the sink bit-identical,
    not doubled."""
    import glob
    import shutil

    t = synth.generate_clips(n_clips=120, n_parts=4, seed=3)
    paths = synth.write_clip_tables(t, str(tmp_path / "data"))
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    ref = spark.read.parquet(paths["clips_ref"])

    def run():
        q = incremental.incremental_clip_validation(
            spark, paths["clips"], sink, ck, ref_df=ref
        )
        q.awaitTermination()

    run()
    before = sorted(
        tuple(r) for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert before, "fixture must produce violations"

    # crash simulation: offsets say batch 0 ran, commits say it never
    # finished -> restart replays batch 0 against the already-written sink
    commits = sorted(glob.glob(os.path.join(ck, "commits", "[0-9]*")))
    last = commits[-1]
    os.remove(last)
    crc = os.path.join(os.path.dirname(last), f".{os.path.basename(last)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    after = sorted(
        tuple(r) for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert after == before
