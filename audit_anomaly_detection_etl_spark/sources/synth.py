"""Deterministic generator for the engine's primary input table (FIXTURES.md F1).

Synthesizes the Iceberg-style ``clips`` table mandated by BASELINE.json
``input_hint`` — (clip_id:string, bytes:binary, sr_hz:int, dur_ms:int,
codec:string, transcript:string) partitioned by ``part`` — together with:

- ``clips_ref``             ground truth (pcm_ref:binary float32, transcript_ref)
- ``hist_ref``              clean-generation equi-width histograms (drift snapshot)
- ``violations_expected``   sidecar the generator emits so pytest can assert
                            exact violation-row parity (SURVEY.md §5 item 2)

Everything is seeded numpy — no wall-clock, no Python ``hash()`` (PYTHONHASHSEED
-dependent); partition assignment uses crc32 so the layout is stable across
processes, which the checkpoint/resume tests rely on.

Injected violation rates follow FIXTURES.md F1:
~0.5% duplicate clip_ids, ~1% corrupted payloads (SNR<30dB), ~0.2% unknown
codec strings, ~0.5% null transcripts, ~0.5% transcript byte-mismatches vs the
reference table, ~0.4% encoding-corrupted transcripts (U+FFFD / control char /
mojibake, planted in BOTH copies so only the content-level encoding check can
see them), plus referential orphans in both directions and a heavy ``dur_ms``
tail (a few >=20x-median clips) to exercise skew handling.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import codecs
from ..functions.stats import histogram_edges

_WORDS = (
    "the quick spark stream batch audio clip sample rate frame signal noise "
    "table column schema check valid drift hash group join scan sort"
).split()

DUR_BINS = (0.0, 20000.0, 40)  # lo, hi, n_bins for dur_ms drift histograms
SR_BINS = (0.0, 48000.0, 48)


def part_of(clip_id: str, n_parts: int) -> int:
    """Deterministic partition bucket (crc32, not Python hash)."""
    return zlib.crc32(clip_id.encode()) % n_parts


@dataclass
class ClipTables:
    clips: pa.Table
    clips_ref: pa.Table
    hist_ref: pa.Table
    violations_expected: pa.Table
    n_parts: int = 16
    paths: dict = field(default_factory=dict)


def _transcript(rng: np.random.Generator, n_tokens: int) -> str:
    return " ".join(np.asarray(_WORDS)[rng.integers(0, len(_WORDS), n_tokens)])


def generate_clips(
    n_clips: int = 2000,
    n_parts: int = 16,
    seed: int = 42,
    mean_dur_ms: float = 400.0,
    drift: bool = False,
    inject_violations: bool = True,
    tone_rate: float = 0.0,
) -> ClipTables:
    rng = np.random.default_rng(seed)
    srs = np.array([8000, 16000, 22050, 44100])
    sr_probs = np.array([0.5, 0.3, 0.15, 0.05]) if not drift else np.array([0.1, 0.2, 0.3, 0.4])
    codec_list = np.asarray(codecs.CODECS)

    clip_ids, payloads, sr_col, dur_col, codec_col, transcripts = [], [], [], [], [], []
    ref_ids: list[str] = []  # unique per clip_id — the ground-truth dimension
    ref_pcm_col: list[bytes] = []
    ref_txt_col: list[str] = []
    viol: list[tuple[str, str, str]] = []  # (clip_id, check, detail)
    last_clean: int | None = None  # index of last violation-free row (dup source)

    sr_choice = rng.choice(len(srs), size=n_clips, p=sr_probs)
    # log-normal duration, heavy tail; drift shifts the location
    mu = np.log(mean_dur_ms * (2.0 if drift else 1.0))
    durs = np.exp(rng.normal(mu, 0.6, n_clips))
    # skew fixture: a few extreme clips (>=20x median)
    n_skew = max(1, n_clips // 500)
    durs[rng.choice(n_clips, n_skew, replace=False)] = mean_dur_ms * rng.uniform(20, 40, n_skew)
    codec_choice = rng.integers(0, len(codec_list), n_clips)

    u = rng.uniform(size=(n_clips, 5)) if inject_violations else np.ones((n_clips, 5))
    # encoding anomalies draw from an INDEPENDENT stream so adding this
    # injector did not reshuffle every pre-existing draw (keeps the other
    # checks' planted counts comparable across rounds)
    rng_enc = np.random.default_rng(seed ^ 0xE2C0D1)
    u_enc = rng_enc.uniform(size=n_clips) if inject_violations else np.ones(n_clips)
    # synthetic pure tones (opt-in via tone_rate > 0) draw from their OWN
    # independent stream and are swapped in only on otherwise-clean rows
    # AFTER the injection chain, so every pre-existing check's planted
    # counts stay byte-identical and tone_rate=0 fixtures are unchanged
    rng_tone = np.random.default_rng(seed ^ 0x70A0A1)
    u_tone = (
        rng_tone.uniform(size=n_clips)
        if inject_violations and tone_rate > 0
        else np.ones(n_clips)
    )

    for i in range(n_clips):
        # duplicate-ingest violation: replay the last clean row verbatim
        # (same id, bytes, transcript) so the only check it trips is
        # uniqueness — no ref row is added (ref stays unique per clip_id)
        if inject_violations and u[i, 0] < 0.005 and last_clean is not None:
            j = last_clean
            clip_ids.append(clip_ids[j])
            payloads.append(payloads[j])
            sr_col.append(sr_col[j])
            dur_col.append(dur_col[j])
            codec_col.append(codec_col[j])
            transcripts.append(transcripts[j])
            viol.append((clip_ids[j], "uniqueness", "duplicate clip_id"))
            continue

        cid = f"clip-{seed:04d}-{i:08d}"
        sr = int(srs[sr_choice[i]])
        dur_ms = int(max(40.0, durs[i]))
        n_samp = max(1, int(round(dur_ms * sr / 1000.0)))
        t = np.arange(n_samp, dtype=np.float64) / sr
        f0 = 80.0 + 400.0 * rng.uniform()
        pcm = 0.55 * np.sin(2 * np.pi * f0 * t) + 0.08 * rng.standard_normal(n_samp)
        pcm = np.clip(pcm, -0.999, 0.999)
        codec = str(codec_list[codec_choice[i]])
        txt = _transcript(rng, int(rng.integers(3, 20)))

        # ground truth first
        ref_pcm = pcm.astype(np.float32)
        ref_txt = txt
        payload = codecs.encode(pcm, codec)

        # --- violation injection -------------------------------------
        dirty = True
        if u[i, 1] < 0.010:  # corrupted payload -> SNR < 30 dB
            bad = np.clip(pcm + 0.5 * rng.standard_normal(n_samp), -0.999, 0.999)
            payload = codecs.encode(bad, codec)
            viol.append((cid, "payload_snr", "corrupted payload"))
        elif u[i, 2] < 0.002:  # unknown codec string
            codec = "opus"
            viol.append((cid, "codec", "unknown codec"))
        elif u[i, 3] < 0.005:  # null transcript
            txt = None
            viol.append((cid, "transcript_null", "null transcript"))
        elif u[i, 4] < 0.005:  # transcript byte-mismatch vs reference
            txt = ref_txt + " x"
            viol.append((cid, "transcript_mismatch", "transcript differs from reference"))
        elif u_enc[i] < 0.004:
            # encoding corruption upstream of the reference split: BOTH
            # copies carry it, so transcript byte-equality passes and only
            # the content-level encoding check can catch it
            flavor = i % 3
            if flavor == 0:
                txt = txt + " ��"
                detail = "replacement chars"
            elif flavor == 1:
                txt = txt[:4] + "\x07" + txt[4:]
                detail = "control char"
            else:
                txt = txt + " cafÃ© â€™"
                detail = "mojibake"
            ref_txt = txt
            viol.append((cid, "encoding", detail))
        else:
            dirty = False

        if not dirty and u_tone[i] < tone_rate:
            # machine-generated tone: the same sine carrier WITHOUT the
            # noise floor (the noise draw above still consumed its stream
            # slot, so all later main-stream draws are unchanged). The ref
            # row carries the same pure PCM: every byte/SNR tier passes,
            # only the content-level tonal check can catch it.
            pure = np.clip(0.55 * np.sin(2 * np.pi * f0 * t), -0.999, 0.999)
            payload = codecs.encode(pure, codec)
            ref_pcm = pure.astype(np.float32)
            viol.append((cid, "tonal", "synthetic pure tone"))
            dirty = True

        clip_ids.append(cid)
        payloads.append(payload)
        sr_col.append(sr)
        dur_col.append(dur_ms)
        codec_col.append(codec)
        transcripts.append(txt)
        ref_ids.append(cid)
        ref_pcm_col.append(ref_pcm.tobytes())
        ref_txt_col.append(ref_txt)
        if not dirty:
            last_clean = len(clip_ids) - 1

    parts = [part_of(c, n_parts) for c in clip_ids]

    # referential orphans, both directions (SURVEY.md J6/J7 analogue)
    if inject_violations and n_clips >= 100:
        # clips with no reference row: drop last 3 *clean* unique ids from the
        # ref side (a dirty clip without a ref would make its payload
        # violation unobservable, breaking sidecar parity)
        viol_ids = {v[0] for v in viol}
        drop = set()
        for cid in reversed(clip_ids):
            if len(drop) >= 3:
                break
            if cid not in viol_ids:
                drop.add(cid)
        keep = [j for j, c in enumerate(ref_ids) if c not in drop]
        for cid in sorted(drop):
            viol.append((cid, "referential_missing_ref", "clip has no reference row"))
        ref_ids = [ref_ids[j] for j in keep]
        ref_pcm_col = [ref_pcm_col[j] for j in keep]
        ref_txt_col = [ref_txt_col[j] for j in keep]
        # reference rows with no clip
        for k in range(2):
            ghost = f"clip-{seed:04d}-ghost-{k:04d}"
            ref_ids.append(ghost)
            ref_pcm_col.append(np.zeros(8, dtype=np.float32).tobytes())
            ref_txt_col.append("ghost")
            viol.append((ghost, "referential_orphan_ref", "reference row has no clip"))

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array(sr_col, pa.int32()),
            "dur_ms": pa.array(dur_col, pa.int32()),
            "codec": pa.array(codec_col, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
            "part": pa.array(parts, pa.int32()),
        }
    )
    clips_ref = pa.table(
        {
            "clip_id": pa.array(ref_ids, pa.string()),
            "pcm_ref": pa.array(ref_pcm_col, pa.binary()),
            "transcript_ref": pa.array(ref_txt_col, pa.string()),
            "part": pa.array([part_of(c, n_parts) for c in ref_ids], pa.int32()),
        }
    )

    # clean-generation drift snapshot over dur_ms and sr_hz
    hist_rows = {"col": [], "bin": [], "lo": [], "hi": [], "count": []}
    for col_name, vals, (lo, hi, nb) in (
        ("dur_ms", np.asarray(dur_col, dtype=np.float64), DUR_BINS),
        ("sr_hz", np.asarray(sr_col, dtype=np.float64), SR_BINS),
    ):
        edges = histogram_edges(lo, hi, nb)
        idx = np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, nb - 1)
        counts = np.bincount(idx, minlength=nb)
        for b in range(nb):
            hist_rows["col"].append(col_name)
            hist_rows["bin"].append(b)
            hist_rows["lo"].append(float(edges[b]))
            hist_rows["hi"].append(float(edges[b + 1]))
            hist_rows["count"].append(int(counts[b]))
    hist_ref = pa.table(
        {
            "col": pa.array(hist_rows["col"], pa.string()),
            "bin": pa.array(hist_rows["bin"], pa.int32()),
            "lo": pa.array(hist_rows["lo"], pa.float64()),
            "hi": pa.array(hist_rows["hi"], pa.float64()),
            "count": pa.array(hist_rows["count"], pa.int64()),
        }
    )

    violations_expected = pa.table(
        {
            "clip_id": pa.array([v[0] for v in viol], pa.string()),
            "check": pa.array([v[1] for v in viol], pa.string()),
            "detail": pa.array([v[2] for v in viol], pa.string()),
        }
    )
    return ClipTables(clips, clips_ref, hist_ref, violations_expected, n_parts)


def write_clip_tables(tables: ClipTables, out_dir: str) -> dict:
    """Write as Iceberg-style partitioned parquet (hive layout, part=K dirs)."""
    paths = {
        "clips": os.path.join(out_dir, "clips"),
        "clips_ref": os.path.join(out_dir, "clips_ref"),
        "hist_ref": os.path.join(out_dir, "hist_ref.parquet"),
        "violations_expected": os.path.join(out_dir, "violations_expected.parquet"),
    }
    # deterministic file names -> same seed reproduces the same snapshot_id
    pq.write_to_dataset(
        tables.clips, paths["clips"], partition_cols=["part"], basename_template="part-{i}.parquet"
    )
    pq.write_to_dataset(
        tables.clips_ref,
        paths["clips_ref"],
        partition_cols=["part"],
        basename_template="part-{i}.parquet",
    )
    pq.write_table(tables.hist_ref, paths["hist_ref"])
    pq.write_table(tables.violations_expected, paths["violations_expected"])
    tables.paths = paths
    return paths


def generate_melody_clips(
    n_base: int = 40,
    n_dup: int = 12,
    n_parts: int = 8,
    seed: int = 5,
    sr: int = 8000,
) -> pd.DataFrame:
    """Deterministic near-duplicate AUDIO fixture for the landmark
    fingerprinting tier (operators/audiofp.py).

    ``n_base`` distinct "melodies" (random 8-15 note tone sequences, 120 ms
    Hann-enveloped notes — spectrally rich enough to yield discriminative
    landmark constellations, unlike the single-sine clips of
    ``generate_clips``) plus ``n_dup`` derived near-duplicates: each a base
    clip time-shifted by 50-200 ms of prepended silence, perturbed with
    additive noise, possibly re-encoded (G.711 u-law) and possibly rendered
    at 16 kHz — exactly the transformations content fingerprints must
    survive and byte hashes cannot. ``dup_of`` carries the ground truth
    (None for base clips) for recall/precision assertions.
    """
    rng = np.random.default_rng(seed)
    rows: list[dict] = []

    def render(freqs: np.ndarray, rate: int) -> np.ndarray:
        note_n = int(0.120 * rate)
        t = np.arange(note_n, dtype=np.float64) / rate
        env = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(note_n) / note_n)
        # fundamental + two harmonics: spectrally rich notes whose exact bin
        # positions are continuous-random, so unrelated melodies share almost
        # no landmark hashes (a 28-note quantized scale would alias them all
        # onto the same bins and drown matching in false positives)
        pcm = np.concatenate(
            [
                env
                * (
                    0.45 * np.sin(2 * np.pi * f * t)
                    + 0.25 * np.sin(2 * np.pi * 2.0 * f * t)
                    + 0.12 * np.sin(2 * np.pi * 3.0 * f * t)
                )
                for f in freqs
            ]
        )
        return pcm

    melodies = []
    for i in range(n_base):
        n_notes = int(rng.integers(8, 16))
        notes = np.exp(rng.uniform(np.log(180.0), np.log(1100.0), size=n_notes))
        melodies.append(notes)
        pcm = render(notes, sr)
        rows.append(
            {
                "clip_id": f"mel-{seed:04d}-{i:04d}",
                "part": i % n_parts,
                "bytes": _encode_pd(pcm, "pcm_s16le"),
                "codec": "pcm_s16le",
                "sr_hz": sr,
                "dup_of": None,
            }
        )

    for j in range(n_dup):
        src = int(rng.integers(0, n_base))
        rate = 16000 if rng.uniform() < 0.3 else sr
        pcm = render(melodies[src], rate)
        shift = int(rng.uniform(0.05, 0.2) * rate)
        pcm = np.concatenate([np.zeros(shift), pcm])
        pcm = np.clip(pcm + 0.01 * rng.standard_normal(len(pcm)), -0.999, 0.999)
        codec = "ulaw" if rng.uniform() < 0.4 else "pcm_s16le"
        rows.append(
            {
                "clip_id": f"mel-{seed:04d}-dup{j:04d}-of-{src:04d}",
                "part": (n_base + j) % n_parts,
                "bytes": _encode_pd(pcm, codec),
                "codec": codec,
                "sr_hz": rate,
                "dup_of": f"mel-{seed:04d}-{src:04d}",
            }
        )
    return pd.DataFrame(rows)


def _encode_pd(pcm: np.ndarray, codec: str) -> bytes:
    return codecs.encode(pcm, codec)
