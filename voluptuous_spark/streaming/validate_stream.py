"""Structured Streaming validation: validate clips as they arrive.

The reference validates values synchronously at call time; the streaming
analog validates each micro-batch with the SAME compiled Schema (the
row-level plan is a stateless projection, so it applies unchanged to a
streaming DataFrame) and maintains a windowed pass/fail aggregate with a
watermark for late events.

Usage:
    stream = spark.readStream.schema(CLIPS_DDL).parquet(in_dir)
    annotated = validate_stream(stream, CLIPS_SCHEMA)
    q = (annotated.writeStream.format('parquet')
         .option('checkpointLocation', ckpt).start(out_dir))

At 10^12-scale ingest this is the validation-on-ingest path: violations
stream to a quarantine sink, valid rows to the main table, and the report
aggregate feeds monitoring. The Arrow PCM pass (audio.with_pcm_check)
composes: mapInArrow is supported on streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import Schema


def validate_stream(stream_df: DataFrame, schema: Schema,
                    id_cols=("clip_id",)) -> DataFrame:
    """Annotated streaming DataFrame: original columns + __errors array.
    Stateless — no watermark needed; each micro-batch is one projection."""
    res = schema.validate(stream_df, id_cols=list(id_cols))
    return res.annotated


def streaming_report(
    annotated: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed pass/fail aggregate with late-data watermark — the
    streaming analog of ValidationResult.report()."""
    ok = (F.size("__errors") == 0).cast("long")
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(ok).alias("passed"),
            F.sum(1 - ok).alias("failed"),
            F.sum(F.size("__errors")).alias("violation_count"),
        )
    )


def stateful_duplicate_flags(
    stream_df: DataFrame, key_col: str = "clip_id"
) -> DataFrame:
    """Cross-micro-batch duplicate detection — the custom STATEFUL
    streaming operator (applyInPandasWithState): per-key occurrence counts
    live in the state store (checkpointed, restored on restart), so a
    clip_id that re-appears hours later in the ingest stream is flagged
    even though the table-level uniqueness check only sees one batch.

    Emits one row per key per trigger: (key, n_seen, is_duplicate).
    State is one long per key; at 10^12-key scale use RocksDB state store
    (spark.sql.streaming.stateStore.providerClass) and a key TTL.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def flag(key, pdf_iter, state):
        prev = state.get[0] if state.exists else 0
        rows = 0
        for pdf in pdf_iter:
            rows += len(pdf)
        total = prev + rows
        state.update((total,))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_seen": [total],
                "is_duplicate": [total > 1],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        flag,
        outputStructType=f"`{key_col}` string, n_seen long, "
                         "is_duplicate boolean",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reference_bucket_probs(df: DataFrame, col: str, min_v: float,
                           max_v: float, n_buckets: int = 10) -> list:
    """Reference bucket probabilities for ``streaming_numeric_psi``: one
    tiny batch aggregation (``n_buckets + 2`` conditional sums — indexes
    follow ``width_bucket``: 0 = below ``min_v``, ``n_buckets + 1`` =
    at/above ``max_v``), collected driver-side as plain floats. Compute
    ONCE on the reference corpus; the result is literal-broadcast into
    the streaming aggregate, so the reference side costs the stream
    nothing per batch."""
    b = F.width_bucket(
        F.col(col).cast("double"), F.lit(float(min_v)),
        F.lit(float(max_v)), F.lit(n_buckets),
    )
    row = (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum((F.col("__b") == i).cast("long")).alias(f"c{i}")
                for i in range(n_buckets + 2)
            ],
        )
        .first()
    )
    n = row["n"] or 1
    return [(row[f"c{i}"] or 0) / n for i in range(n_buckets + 2)]


def streaming_numeric_psi(
    stream_df: DataFrame,
    col: str,
    ts_col: str,
    ref_probs: list,
    min_v: float,
    max_v: float,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed PSI of a streaming numeric column against a FIXED
    reference distribution — drift-on-ingest, the streaming analog of
    ``checks.drift.numeric_psi`` (same EPS floor, same fixed-width
    ``width_bucket`` bucketing).

    Structured Streaming allows ONE aggregation per query, so the
    per-window histogram is ``len(ref_probs)`` conditional sums inside
    the single windowed aggregate (a ``groupBy(bucket)`` followed by a
    re-aggregation would be two), and PSI folds over those sums as a
    closed-form select expression — no second shuffle, no state beyond
    the windowed agg's own store. Returns (window, rows, psi) per
    event-time window; alert when psi exceeds the usual 0.1/0.25
    thresholds."""
    from ..checks.drift import EPS

    n_buckets = len(ref_probs) - 2
    b = F.width_bucket(
        F.col(col).cast("double"), F.lit(float(min_v)),
        F.lit(float(max_v)), F.lit(n_buckets),
    )
    agg = (
        stream_df.filter(F.col(col).isNotNull())
        .withColumn("__b", b)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            *[
                F.sum((F.col("__b") == i).cast("long")).alias(f"__c{i}")
                for i in range(n_buckets + 2)
            ],
        )
    )
    rows = F.col("rows")
    psi = None
    for i, q in enumerate(ref_probs):
        p = F.greatest(F.col(f"__c{i}") / rows, F.lit(EPS))
        ql = F.lit(max(float(q), EPS))
        term = (p - ql) * F.log(p / ql)
        psi = term if psi is None else psi + term
    return agg.select("window", "rows", F.round(psi, 6).alias("psi"))


def streaming_sketch_sink(
    stream_df: DataFrame,
    cols,
    stats_path: str,
    checkpoint_location: str,
    lg_k: int = 12,
    bins_per_octave: int = 8,
):
    """Stats-on-ingest: a ``foreachBatch`` sink that appends one
    MERGEABLE sketch row per (batch, column) — the streaming counterpart
    of ``CheckpointedValidation.run(stats_cols=...)``. Each micro-batch
    pays one narrow aggregation (``checks.sketches.column_sketches``);
    the running corpus stats are then ``merged_stream_stats`` over the
    KB-scale sketch table, and drift between any two time ranges of the
    ingest is ``sketch_psi`` over the same rows — neither ever re-reads
    the ingested data.

    Exactly-once accounting: Spark re-runs ``foreachBatch`` with the
    SAME batch_id on failure recovery, so a crash between the sketch
    append and the offset commit can only duplicate a (batch_id, column)
    row; ``merged_stream_stats`` keeps one row per (batch_id, column),
    restoring exactly-once for the folded stats.

    Returns the DataStreamWriter — caller picks the trigger:
        streaming_sketch_sink(stream, ["dur_ms"], p, ck)
            .trigger(availableNow=True).start()
    """
    from ..checks.sketches import column_sketches

    cols = list(cols)

    def _write(batch_df, batch_id):
        (
            column_sketches(
                batch_df, cols, lg_k=lg_k,
                bins_per_octave=bins_per_octave,
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append").parquet(stats_path)
        )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )


def merged_stream_stats(
    spark, stats_path: str, quantiles=()
) -> DataFrame:
    """Running corpus-level column stats from a ``streaming_sketch_sink``
    table: dedupe retried batches (one row per (batch_id, column)), then
    fold — reads only the sketch rows."""
    from pyspark.sql import Window

    from ..checks.sketches import merge_sketches

    sk = spark.read.parquet(stats_path)
    w = Window.partitionBy("batch_id", "column").orderBy(
        F.desc("n_rows")
    )
    latest = (
        sk.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "batch_id")
    )
    return merge_sketches(latest, quantiles=quantiles)


def streaming_embedding_psi(
    stream_df: DataFrame,
    dim: int,
    ts_col: str,
    ref_probs_per_plane: list,
    n_planes: int = 4,
    bound: float | None = None,
    vec_col: str = "embedding",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Embedding drift ON INGEST: project each arriving vector onto the
    deterministic SRP directions (``checks.embedding_drift`` — pure
    Column folds riding the stream's projection, no extra state) and
    score every event-time window's per-plane histogram against fixed
    reference bucket probabilities (from
    ``checks.embedding_drift.embedding_psi``'s batch bucketing of the
    reference corpus, or ``reference_bucket_probs`` on a projected
    frame). One windowed aggregation total: all planes' conditional
    bucket counts live in the SAME agg, so plane count widens the
    aggregate row, not the plan. Returns (window, rows, psi_0..psi_{n-1})
    per window."""
    from ..checks.drift import EPS
    from ..checks.embedding_drift import projection_expr

    if bound is None:
        bound = float(dim) ** 0.5 / 2.0
    s = stream_df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    aggs = [F.count(F.lit(1)).alias("rows")]
    for p in range(n_planes):
        n_buckets = len(ref_probs_per_plane[p]) - 2
        b = F.width_bucket(
            projection_expr(F.col(vec_col), p, dim),
            F.lit(-bound), F.lit(bound), F.lit(n_buckets),
        )
        aggs += [
            F.sum((b == i).cast("long")).alias(f"__p{p}c{i}")
            for i in range(n_buckets + 2)
        ]
    agg = (
        s.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(*aggs)
    )
    rows = F.col("rows")
    out = [F.col("window"), rows]
    for p in range(n_planes):
        psi = None
        for i, q in enumerate(ref_probs_per_plane[p]):
            pr = F.greatest(F.col(f"__p{p}c{i}") / rows, F.lit(EPS))
            ql = F.lit(max(float(q), EPS))
            term = (pr - ql) * F.log(pr / ql)
            psi = term if psi is None else psi + term
        out.append(F.round(psi, 6).alias(f"psi_{p}"))
    return agg.select(*out)
