"""Checkpoint/resume: kill mid-run, resume, verify lineage."""

import tempfile

from pyspark.sql import functions as F

from voluptuous_spark import ALLOW_EXTRA, In, Range, Schema
from voluptuous_spark.checkpoint import CheckpointedValidation
from voluptuous_spark.datasynth import clips_df

SCHEMA = Schema(
    {"sr_hz": In([8000, 16000, 22050, 44100, 48000]),
     "dur_ms": Range(min=1, max=600000)},
    extra=ALLOW_EXTRA,
)


def _fn(d):
    return SCHEMA.validate(d, id_cols=["clip_id"]).annotated


def test_checkpoint_resume(spark):
    clips = clips_df(spark, 2000, seed=1, partitions=4).cache()
    clips.count()
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ckpt"
        cv = CheckpointedValidation(spark, path, n_buckets=16)
        assert len(cv.pending_buckets()) == 16

        # simulate interruption: only 1 step of 4 buckets
        steps = cv.run(clips, _fn, buckets_per_step=4, max_steps=1)
        assert steps == 1
        assert len(cv.completed_buckets()) == 4
        assert len(cv.pending_buckets()) == 12

        # resume completes the rest, skipping finished buckets
        steps = cv.run(clips, _fn, buckets_per_step=4)
        assert steps == 3
        assert cv.pending_buckets() == []

        rep = cv.report()
        total = rep.agg(F.sum("n_rows").alias("n")).collect()[0]["n"]
        assert total == 2000
        # rerun is a no-op
        assert cv.run(clips, _fn) == 0

        # lineage: unchanged input -> no stale buckets
        assert cv.verify_lineage(clips).count() == 0
        # changed input -> stale buckets detected
        changed = clips.withColumn(
            "clip_id",
            F.when(F.col("dur_ms") > 100, F.concat(F.col("clip_id"), F.lit("x")))
            .otherwise(F.col("clip_id")),
        )
        assert cv.verify_lineage(changed).count() > 0
