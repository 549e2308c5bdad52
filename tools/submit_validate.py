"""spark-submit entry point: run the full clips constraint suite on a
cluster, resumable from per-partition checkpoints.

    python tools/package.py
    spark-submit --py-files dist/voluptuous_spark.zip \
        tools/submit_validate.py \
        --clips /data/clips --transcripts /data/transcripts \
        --output /data/validation_out --checkpoint /data/validation_ckpt \
        [--format iceberg] [--buckets 256] [--no-pcm] \
        [--resample-to 16000] [--trim-silence] [--transcript-rate 1:25]

Outputs under --output:
    violations/   one row per Invalid (clip_id, path, message, error_type,
                  offending) — MultipleInvalid exploded
    report/       per-partition pass/fail rows
    stats/        per-column stats (null rate, min/max, HLL distinct,
                  quantiles)
    summary.json  suite-level counts (driver-side, small)

Checkpoint/resume: with --checkpoint, row-level validation runs bucket-at-
a-time through CheckpointedValidation; re-invoking the same command after
a kill skips completed buckets (lineage fingerprints detect changed
input). Table formats: parquet paths by default; --format iceberg reads
``spark.read.format('iceberg')`` via sources.catalog (config flip, same
plan).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True)
    ap.add_argument("--transcripts", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--staging", default=None,
        help="bucket-partitioned staging layout for checkpointed runs: "
        "the input is written partitionBy(__bucket) here once, so every "
        "step and every resume is a partition-pruned scan of only its "
        "chunk's directories (on Iceberg, instead make the table's "
        "partition spec bucket(N, clip_id) and skip this)")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--buckets-per-step", type=int, default=8)
    ap.add_argument("--no-pcm", action="store_true",
                    help="skip the Arrow PCM decode check")
    ap.add_argument("--run-id", default="submit")
    ap.add_argument("--transcript-rate", default=None, metavar="LO:HI",
                    help="enable the joint speaking-rate gate with "
                         "chars/sec bounds, e.g. 1:25")
    ap.add_argument("--resample-to", type=int, default=None, metavar="SR",
                    help="canonicalize the corpus to one sample rate "
                         "before validation (linear resample)")
    ap.add_argument("--trim-silence", action="store_true",
                    help="cut leading/trailing silence (frame-RMS) "
                         "before validation")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from voluptuous_spark.checkpoint import CheckpointedValidation
    from voluptuous_spark.sources.catalog import load_table
    from voluptuous_spark.suite import CLIPS_SCHEMA, run_suite

    # On a cluster, spark-submit provides master/executors; getOrCreate
    # only fills in app name + the engine's Arrow batch sizing.
    spark = (
        SparkSession.builder.appName("voluptuous_spark_validate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )

    clips = load_table(spark, args.clips, format=args.format)
    transcripts = (
        load_table(spark, args.transcripts, format=args.format)
        if args.transcripts
        else None
    )

    # optional canonicalization passes ahead of validation — each is one
    # zero-copy Arrow pass; chaining them keeps a single payload scan
    if args.resample_to:
        from voluptuous_spark.audio import audio_resample

        clips = audio_resample(clips, args.resample_to)
    if args.trim_silence:
        from voluptuous_spark.audio import audio_trim_silence

        clips = audio_trim_silence(clips)
    transcript_rate = None
    if args.transcript_rate:
        lo, hi = args.transcript_rate.split(":")
        transcript_rate = (float(lo), float(hi))

    if args.checkpoint:
        ckpt = CheckpointedValidation(
            spark, args.checkpoint, n_buckets=args.buckets
        )
        steps = ckpt.run(
            clips,
            lambda d: CLIPS_SCHEMA.validate(d, id_cols=["clip_id"]).annotated,
            buckets_per_step=args.buckets_per_step,
            run_id=args.run_id,
            staging_path=args.staging,
        )
        print(f"checkpointed row-level validation: {steps} steps")

    res = run_suite(
        clips, transcripts, with_pcm=not args.no_pcm, persist=True,
        transcript_rate=transcript_rate,
    )
    out = args.output
    res.violations.write.mode("overwrite").parquet(f"{out}/violations")
    res.report.write.mode("overwrite").parquet(f"{out}/report")
    res.stats.write.mode("overwrite").parquet(f"{out}/stats")
    counts = res.counts()
    res.unpersist()

    os.makedirs(out, exist_ok=True)
    with open(f"{out}/summary.json", "w") as f:
        json.dump({k: (float(v) if v is not None else None)
                   for k, v in counts.items()}, f, indent=2)
    print(json.dumps(counts, default=float))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
