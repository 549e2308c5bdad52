"""Structured Streaming validation path."""

import tempfile
import time

from pyspark.sql import functions as F

from voluptuous_spark import ALLOW_EXTRA, In, Range, Schema
from voluptuous_spark.streaming import validate_stream


def test_streaming_validate(spark):
    schema = Schema(
        {"sr_hz": In([8000, 16000]), "dur_ms": Range(min=1, max=1000)},
        extra=ALLOW_EXTRA,
    )
    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        df = spark.createDataFrame(
            [("a", 8000, 100), ("b", 12345, 100), ("c", 8000, 5000)],
            "clip_id string, sr_hz int, dur_ms int",
        )
        df.write.parquet(in_dir)

        stream = spark.readStream.schema(
            "clip_id string, sr_hz int, dur_ms int"
        ).parquet(in_dir)
        annotated = validate_stream(stream, schema)
        q = (
            annotated.withColumn("n_errors", F.size("__errors"))
            .drop("__errors")
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {r["clip_id"]: r["n_errors"] for r in
               spark.read.parquet(out_dir).collect()}
        assert out == {"a": 0, "b": 1, "c": 1}


def test_stateful_duplicates_survive_restart(spark):
    """applyInPandasWithState: per-key counts persist in the checkpointed
    state store — a duplicate arriving in a LATER run (query restart from
    the same checkpoint) is flagged."""
    from voluptuous_spark.streaming import stateful_duplicate_flags

    with tempfile.TemporaryDirectory() as tmp:
        in_dir, ckpt = f"{tmp}/in", f"{tmp}/ckpt"

        def run(batch_df, out_dir):
            batch_df.write.mode("append").parquet(in_dir)
            stream = spark.readStream.schema("clip_id string").parquet(in_dir)
            # foreachBatch: checkpoint-recoverable with any batch sink
            q = (
                stateful_duplicate_flags(stream)
                .writeStream.foreachBatch(
                    lambda bdf, _id: bdf.write.mode("append")
                    .parquet(out_dir)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {
                r["clip_id"]: (r["n_seen"], r["is_duplicate"])
                for r in spark.read.parquet(out_dir).collect()
            }

        first = run(
            spark.createDataFrame([("a",), ("b",)], "clip_id string"),
            f"{tmp}/out1",
        )
        assert first == {"a": (1, False), "b": (1, False)}

        second = run(
            spark.createDataFrame([("b",), ("c",)], "clip_id string"),
            f"{tmp}/out2",
        )
        # 'b' was seen in run 1: state restored from checkpoint flags it
        assert second["b"] == (2, True)
        assert second["c"] == (1, False)


def test_streaming_pcm_check_composes(spark):
    """The Arrow PCM decode (mapInArrow) composes with readStream: audio
    validation-on-ingest — payload decoded once per micro-batch, bytes
    dropped before the sink."""
    import numpy as np

    from voluptuous_spark.audio import PCM_ERR_COL, encode_wav_pcm16, with_pcm_check

    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        sr = 8000
        good = encode_wav_pcm16(
            (1000 * np.sin(np.arange(sr) / 10)).astype(np.int16), sr
        )
        df = spark.createDataFrame(
            [("ok", good, sr, 1000, "wav"),
             ("bad", b"JUNKJUNKJUNK", sr, 1000, "wav")],
            "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
        )
        df.write.parquet(in_dir)

        stream = spark.readStream.schema(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
        ).parquet(in_dir)
        q = (
            with_pcm_check(stream)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        assert "bytes" not in out.columns
        errs = {r["clip_id"]: r[PCM_ERR_COL] for r in out.collect()}
        assert errs["ok"] is None
        assert "decode failed" in errs["bad"]


def test_streaming_numeric_psi(spark):
    """Windowed drift-on-ingest: a window matching the reference
    distribution scores ~0 PSI; a concentrated window scores high."""
    import datetime as dt

    from voluptuous_spark.streaming import (
        reference_bucket_probs,
        streaming_numeric_psi,
    )

    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double"
    )
    probs = reference_bucket_probs(ref, "v", 0.0, 100.0, n_buckets=10)
    assert len(probs) == 12
    assert abs(sum(probs) - 1.0) < 1e-9
    assert all(abs(p - 0.1) < 1e-9 for p in probs[1:11])

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # window 1: uniform 0..99 (matches reference)
        *[(float(i), t0 + dt.timedelta(seconds=i % 60)) for i in range(100)],
        # window 2 (5 min later): everything piles into one bucket
        *[(5.0, t0 + dt.timedelta(minutes=5, seconds=i % 60))
          for i in range(100)],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        spark.createDataFrame(rows, "v double, ts timestamp").write.parquet(
            in_dir
        )
        stream = spark.readStream.schema("v double, ts timestamp").parquet(
            in_dir
        )
        psi = streaming_numeric_psi(
            stream, "v", "ts", probs, 0.0, 100.0,
            window_duration="1 minute", watermark="1 minute",
        )
        q = (
            psi.writeStream.foreachBatch(
                lambda bdf, _id: bdf.write.mode("overwrite").parquet(out_dir)
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = sorted(
            (r["window"]["start"], r["rows"], r["psi"])
            for r in spark.read.parquet(out_dir).collect()
        )
        assert len(out) == 2
        (w1_start, w1_rows, w1_psi), (w2_start, w2_rows, w2_psi) = out
        assert (w1_rows, w2_rows) == (100, 100)
        assert w1_psi < 0.01          # matches reference
        assert w2_psi > 1.0           # concentrated -> strong drift


def test_streaming_sketch_sink_incremental(spark):
    """Stats-on-ingest: sketch rows per micro-batch fold to the same
    stats a batch sketch of all ingested data gives; a second ingest
    updates the fold without re-reading the first."""
    import pytest

    from voluptuous_spark.checks.sketches import column_sketches, merge_sketches
    from voluptuous_spark.datasynth import clips_df
    from voluptuous_spark.streaming import (
        merged_stream_stats,
        streaming_sketch_sink,
    )

    first = clips_df(spark, 300, seed=41, partitions=2).drop("bytes").cache()
    second = clips_df(spark, 200, seed=42, partitions=2).drop("bytes").cache()
    first.count(); second.count()
    cols = ["sr_hz", "dur_ms", "codec"]

    with tempfile.TemporaryDirectory() as tmp:
        src, stats, ck = f"{tmp}/in", f"{tmp}/stats", f"{tmp}/ck"
        first.write.mode("append").parquet(src)
        stream = spark.readStream.schema(first.schema).parquet(src)
        q = (
            streaming_sketch_sink(stream, cols, stats, ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

        def stats_map(df):
            return {r["column"]: r for r in df.collect()}

        got1 = stats_map(merged_stream_stats(spark, stats, quantiles=(0.5,)))
        want1 = stats_map(
            merge_sketches(column_sketches(first, cols), quantiles=(0.5,))
        )
        for c in cols:
            assert got1[c]["n_rows"] == want1[c]["n_rows"]
            assert got1[c]["quantiles"] == want1[c]["quantiles"]

        # second ingest: new files -> new batches only
        second.write.mode("append").parquet(src)
        q = (
            streaming_sketch_sink(stream, cols, stats, ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        both = first.unionByName(second)
        got2 = stats_map(merged_stream_stats(spark, stats, quantiles=(0.5,)))
        want2 = stats_map(
            merge_sketches(column_sketches(both, cols), quantiles=(0.5,))
        )
        for c in cols:
            assert got2[c]["n_rows"] == want2[c]["n_rows"]
            assert got2[c]["null_count"] == want2[c]["null_count"]
            assert got2[c]["min_value"] == want2[c]["min_value"]
            assert got2[c]["max_value"] == want2[c]["max_value"]
            assert got2[c]["quantiles"] == want2[c]["quantiles"]
            assert got2[c]["distinct_count"] == pytest.approx(
                want2[c]["distinct_count"], rel=0.05
            )

        # retried-batch dedupe: duplicate one (batch_id, column) row
        dup = spark.read.parquet(stats).limit(1)
        dup.write.mode("append").parquet(stats)
        got3 = stats_map(merged_stream_stats(spark, stats, quantiles=(0.5,)))
        for c in cols:
            assert got3[c]["n_rows"] == want2[c]["n_rows"]


def test_streaming_embedding_psi(spark):
    """Embedding drift on ingest: a window drawn from the reference
    distribution scores ~0 on every plane; a rescaled window fires."""
    import datetime as dt
    import random

    from voluptuous_spark.checks.embedding_drift import (
        embedding_projections,
    )
    from voluptuous_spark.streaming import (
        reference_bucket_probs,
        streaming_embedding_psi,
    )

    dim, n_planes = 8, 3
    bound = float(dim) ** 0.5 / 2.0
    rng = random.Random(5)

    def vecs(n, scale):
        return [[rng.gauss(0, 1) * scale for _ in range(dim)]
                for _ in range(n)]

    ref = spark.createDataFrame(
        [(v,) for v in vecs(800, 1.0)], "embedding array<double>"
    )
    proj = embedding_projections(ref, dim, n_planes)
    probs = [
        reference_bucket_probs(proj, f"proj_{p}", -bound, bound,
                               n_buckets=8)
        for p in range(n_planes)
    ]

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        *[(v, t0 + dt.timedelta(seconds=i % 50))
          for i, v in enumerate(vecs(400, 1.0))],
        *[(v, t0 + dt.timedelta(minutes=5, seconds=i % 50))
          for i, v in enumerate(vecs(400, 2.5))],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        spark.createDataFrame(
            rows, "embedding array<double>, ts timestamp"
        ).write.parquet(in_dir)
        stream = spark.readStream.schema(
            "embedding array<double>, ts timestamp"
        ).parquet(in_dir)
        psi = streaming_embedding_psi(
            stream, dim, "ts", probs, n_planes=n_planes,
            window_duration="1 minute", watermark="1 minute",
        )
        q = (
            psi.writeStream.foreachBatch(
                lambda bdf, _id: bdf.write.mode("overwrite").parquet(out_dir)
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = sorted(
            (r["window"]["start"], r["rows"],
             [r[f"psi_{p}"] for p in range(n_planes)])
            for r in spark.read.parquet(out_dir).collect()
        )
        assert len(out) == 2
        (_, r1, psis1), (_, r2, psis2) = out
        assert (r1, r2) == (400, 400)
        assert all(p < 0.1 for p in psis1)   # same distribution
        assert max(psis2) > 0.5              # rescaled -> drift on ingest
