"""Multimodal binary-column plumbing: image / video / generic media.

A 100TB training-data pipeline carries media as opaque ``binary`` columns
with typed metadata (this repo's audio pipeline — ``audio.py`` — is the
fully-real instance: WAV decode, SNR cross-check). This module provides
the same Spark-side plumbing for image and video payloads:

- schema convention: ``(id, bytes, <typed metadata...>)``
- Arrow-batched ``mapInPandas`` operators with explicit output schemas
  and bounded batch sizes (the same
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` discipline as audio —
  batches of wide binary rows must fit worker memory)
- the decode kernels themselves are STUBBED: no image/video codec
  libraries exist in this environment, so each operator takes a
  ``decode`` callable. The default is a deterministic fake (shape +
  checksum derived from the bytes) so the plumbing — schema, batching,
  partitioning, column pruning, drop-the-bytes-early — is real and
  testable; swapping in PIL/ffmpeg is a one-argument change on a real
  cluster.

Design rules carried over from audio.py:
- the binary column crosses the JVM->Python boundary ONCE and is dropped
  from the output batch (downstream plans never carry it again);
- no per-row Python in Spark's row pipeline — everything is Arrow-batch;
- outputs are narrow typed columns (features, dims, frame indexes).
"""

from __future__ import annotations

import hashlib
import typing

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _fake_image_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for an image codec: derives a small HxWx3
    uint8 array purely from the payload bytes. Replace with a real
    decoder (PIL.Image.open) on a cluster that has one."""
    if buf is None or len(buf) < 4:
        raise ValueError("truncated image payload")
    d = hashlib.sha256(bytes(buf)).digest()
    h = 8 + d[0] % 8
    w = 8 + d[1] % 8
    rng = np.frombuffer(
        hashlib.sha256(d).digest() * ((h * w * 3) // 32 + 1), dtype=np.uint8
    )
    return rng[: h * w * 3].reshape(h, w, 3).copy()


def image_features(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "bytes",
    decode: typing.Callable[[bytes], np.ndarray] = _fake_image_decode,
) -> DataFrame:
    """(id, height, width, channels, mean_luma, err) via mapInPandas.
    ``err`` is NULL on success — the same violation convention as the
    audio PCM check, so results plug into Schema.validate extra_checks."""
    out_schema = (
        f"`{id_col}` string, height int, width int, channels int, "
        "mean_luma double, err string"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr = decode(buf)
                    rows.append(
                        (
                            rid,
                            int(arr.shape[0]),
                            int(arr.shape[1]),
                            int(arr.shape[2]),
                            float(arr.mean()),
                            None,
                        )
                    )
                except Exception as exc:  # decode failures become data
                    rows.append((rid, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "height", "width", "channels", "mean_luma",
                    "err",
                ],
            )

    return df.select(id_col, bytes_col).mapInPandas(gen, out_schema)


def image_resize_stub(
    df: DataFrame,
    target: tuple[int, int],
    id_col: str = "id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Resize plumbing: (id, bytes) -> (id, resized binary, h, w). The
    resample kernel requires a real image library — STUB: raises
    NotImplementedError per batch so a misconfigured cluster fails loudly
    rather than producing fake pixels. The schema and batch shape are the
    real contract."""
    out_schema = f"`{id_col}` string, resized binary, h int, w int"

    def gen(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "image resize requires an image codec library "
                "(PIL/opencv); none is available in this environment"
            )
        return
        yield  # pragma: no cover — unreachable; makes gen a generator

    return df.select(id_col, bytes_col).mapInPandas(gen, out_schema)


def video_frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "id",
    bytes_col: str = "bytes",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index,
    (id, frame_idx, ts_ms, frame binary NULL-stubbed). Frame timestamps
    come from metadata (dur_ms), so the fan-out is real and testable;
    the pixel payload needs ffmpeg — stubbed as NULL bytes."""
    out_schema = (
        f"`{id_col}` string, frame_idx int, ts_ms int, frame binary"
    )

    def gen(batches):
        for pdf in batches:
            ids, idxs, tss = [], [], []
            for rid, dur in zip(pdf[id_col], pdf[dur_col]):
                n = 0 if pd.isna(dur) else int(dur) // every_ms + 1
                for i in range(n):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(i * every_ms)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "frame": [None] * len(ids),
                }
            )

    return df.select(id_col, dur_col).mapInPandas(gen, out_schema)
