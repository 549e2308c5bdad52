"""Deterministic synthetic ``clips`` / ``transcripts`` tables.

Exactly the BASELINE.json input_hint shape:
  clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
        codec string, transcript string)
plus the referential side table transcripts(clip_id, transcript, lang).

Every cell is a pure function of (seed, i) — FIXTURES.md requires
generators to be pure functions of (seed, n_rows) — so the same table can
be regenerated at any scale on any number of executors with identical
content. Generation runs DISTRIBUTED via mapInPandas over spark.range(n):
the driver never materializes a row.

Violation injection (rates per FIXTURES.md F1/F2), all by deterministic
index tests so golden expectations are computable:
  - i % 1000 == 7   -> duplicate clip_id (copies i-1)         (~0.1%)
  - i % 2000 == 11  -> empty clip_id                          (~0.05%)
  - i % 500  == 13  -> truncated WAV payload                  (~0.2%)
  - i % 500  == 263 -> corrupted RIFF magic
  - i % 200  == 17  -> invalid sr_hz (12345)                  (~0.5%)
  - i % 100  == 23  -> dur_ms out of Range(1, 600000)         (~1%)
  - i % 500  == 29  -> dur_ms NULL                            (~0.2%)
  - i % 200  == 31  -> transcript NULL                        (~0.5%)
  - i % 333  == 2   -> transcript leading/trailing whitespace (~0.3%)
  - i % 500  == 37  -> transcript mismatch vs side table      (~0.2%)
  - i % 333  == 100 -> unknown codec 'ogg'                    (~0.3%)
  - side table: i % 200 == 3 -> orphan clip_id                (~0.5%)
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .audio import encode_wav_pcm16

CLIPS_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)
TRANSCRIPTS_DDL = "clip_id string, transcript string, lang string"

_SRS = np.array([8000, 16000, 22050, 44100, 48000])
_VOCAB = (
    "the quick brown fox jumps over lazy dog audio clip speech sound "
    "hello world test sample voice noise signal wave tone pitch"
).split()


def _mix(i: int, salt: int, seed: int) -> int:
    """Deterministic 63-bit mix of (seed, i, salt) — splitmix64-style."""
    x = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + seed) & (
        (1 << 64) - 1
    )
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return (x ^ (x >> 31)) & ((1 << 63) - 1)


def _transcript(i: int, seed: int) -> str:
    n = 3 + _mix(i, 1, seed) % 8
    return " ".join(
        _VOCAB[_mix(i, 10 + k, seed) % len(_VOCAB)] for k in range(n)
    )


def _clip_row(i: int, seed: int, min_ms: int = 40, spread_ms: int = 80) -> dict:
    base = i - 1 if (i % 1000 == 7 and i > 0) else i  # duplicate ids
    clip_id = "" if i % 2000 == 11 else f"clip_{base:012d}"

    r = _mix(i, 2, seed) % 100
    codec = "wav" if r < 85 else "flac" if r < 95 else "opus" if r < 99 else "mp3"
    if i % 333 == 100:
        codec = "ogg"

    sr = int(_SRS[_mix(i, 3, seed) % len(_SRS)])
    n_samples = int(sr * (min_ms + _mix(i, 4, seed) % spread_ms) / 1000)
    true_dur = round(n_samples * 1000.0 / sr)

    if codec == "wav":
        # seeded sine + noise, PCM16 (numpy only)
        rng = np.random.default_rng(_mix(i, 5, seed))
        freq = 100 + _mix(i, 6, seed) % 3900
        t = np.arange(n_samples, dtype=np.float64) / sr
        amp = 3000 + _mix(i, 7, seed) % 20000
        wave_f = amp * np.sin(2 * np.pi * freq * t) + rng.normal(
            0, 200, n_samples
        )
        buf = encode_wav_pcm16(
            np.clip(wave_f, -32768, 32767).astype(np.int16), sr
        )
        if i % 500 == 13:
            buf = buf[: max(10, len(buf) // 3)]  # truncated
        elif i % 500 == 263:
            buf = b"JUNK" + buf[4:]  # bad magic
    else:
        raw = np.frombuffer(
            np.random.default_rng(_mix(i, 5, seed)).bytes(64), dtype=np.uint8
        )
        magic = {"flac": b"fLaC", "opus": b"OggS", "mp3": b"ID3\x03",
                 "ogg": b"OggS"}[codec]
        buf = magic + raw.tobytes()

    sr_col = 12345 if i % 200 == 17 else sr
    dur: typing.Optional[int]
    if i % 500 == 29:
        dur = None
    elif i % 100 == 23:
        dur = 999_999_999
    else:
        dur = true_dur

    tr: typing.Optional[str] = _transcript(i, seed)
    if i % 200 == 31:
        tr = None
    elif i % 333 == 2:
        tr = "  " + tr + " "

    return {
        "clip_id": clip_id,
        "bytes": buf,
        "sr_hz": sr_col,
        "dur_ms": dur,
        "codec": codec,
        "transcript": tr,
    }


def clips_df(spark: SparkSession, n_rows: int, seed: int = 42,
             partitions: int | None = None, min_ms: int = 40,
             spread_ms: int = 80) -> DataFrame:
    """Distributed deterministic clips table. ``min_ms``/``spread_ms``
    control clip duration (default 40-120ms for fast tests; benches use
    realistic ~0.5s speech-length clips)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [_clip_row(int(i), seed, min_ms, spread_ms)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=CLIPS_DDL)
    )


ORACLE_CLIPS_DDL = (
    "clip_id long, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)
ORACLE_SR = 16000


def _oracle_samples(c: int) -> np.ndarray:
    """int16 samples for oracle clip ``c`` — a closed form a SQL engine
    can regenerate exactly: v(c,k) = ((c+1)*104729*(k+13)) % 65536 - 32768
    (all operands non-negative, so %% agrees across numpy / SQL), with
    variant overrides by c %% 8 (0 = digital silence, 1 = full-scale
    clipped). n_samples = 1600 + (c %% 5)*320 is a multiple of 16 so
    dur_ms = n/16 exactly (no round-half parity traps between Python
    banker's rounding, Spark F.round and SQL ROUND)."""
    n = 1600 + (c % 5) * 320
    k = np.arange(n, dtype=np.int64)
    v = ((c + 1) * 104729 * (k + 13)) % 65536 - 32768
    if c % 8 == 0:
        v = np.zeros(n, dtype=np.int64)
    elif c % 8 == 1:
        v = np.where(v >= 0, 32767, -32768)
    return v.astype(np.int16)


def _oracle_clip_row(c: int) -> dict:
    v = _oracle_samples(c)
    buf: typing.Optional[bytes] = encode_wav_pcm16(v, ORACLE_SR)
    actual_ms = len(v) // 16
    dur = actual_ms
    sr: int = ORACLE_SR
    codec = "wav"
    m = c % 8
    if m == 3:
        dur = actual_ms + 500       # duration mismatch
    elif m == 4:
        sr = 8000                   # header/metadata sample-rate mismatch
    elif m == 5:
        buf = None                  # missing payload
    elif m == 6:
        buf = buf[:8]               # truncated header
    elif m == 7:
        codec = "opus"              # non-PCM codec: structural check only
    return {
        "clip_id": c, "bytes": buf, "sr_hz": sr, "dur_ms": dur,
        "codec": codec, "transcript": f"t{c}",
    }


def oracle_clips_df(spark: SparkSession, n_clips: int,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic clips table whose PCM content is a pure closed form
    of (clip_id, sample_index) — regenerable by a DuckDB oracle via
    range() joins — with one planned defect class per ``clip_id %% 8``.
    Used by the driver queries that hash-check the WAV encode -> decode ->
    feature/verdict pipeline end-to-end against SQL."""
    # a 64-row fixture on 32 partitions would fork 32 Python workers for
    # 2 rows each — size partitions to ~8 clips per task instead
    parts = partitions or max(
        1, min(spark.sparkContext.defaultParallelism, n_clips // 8)
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([_oracle_clip_row(int(i)) for i in pdf["id"]])

    return (
        spark.range(0, n_clips, numPartitions=parts)
        .mapInPandas(gen, schema=ORACLE_CLIPS_DDL)
    )


def transcripts_df(spark: SparkSession, n_rows: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Referential side table: mostly matching clip_ids + ~0.5% orphans,
    transcripts equal except ~0.2% injected mismatches."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                base = i - 1 if (i % 1000 == 7 and i > 0) else i
                cid = (
                    f"orphan_{i:012d}" if i % 200 == 3
                    else f"clip_{base:012d}"
                )
                tr = _transcript(i, seed)
                if i % 500 == 37:
                    tr = tr + " MISMATCH"
                lang = ["en", "de", "fr"][_mix(i, 20, seed) % 3]
                rows.append(
                    {"clip_id": cid, "transcript": tr, "lang": lang}
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_DDL)
    )


def write_clips(spark: SparkSession, n_rows: int, path: str, seed: int = 42,
                partitions: int | None = None, min_ms: int = 40,
                spread_ms: int = 80) -> None:
    clips_df(spark, n_rows, seed, partitions, min_ms, spread_ms).write.mode(
        "overwrite"
    ).parquet(f"{path}/clips.parquet")
    transcripts_df(spark, n_rows, seed, partitions).write.mode(
        "overwrite"
    ).parquet(f"{path}/transcripts.parquet")
