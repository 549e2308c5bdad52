"""Physical-plan quality assertions: the properties that matter at 100TB.

- column pruning: validating 2 columns of a wide table must not read the
  audio ``bytes`` column (ReadSchema excludes it)
- predicate pushdown: filters reach the parquet scan (PushedFilters)
- broadcast: referential check with broadcast_parent uses
  BroadcastHashJoin, no shuffle of the fact side
- whole-stage codegen covers the validation projection
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from voluptuous_spark import ALLOW_EXTRA, In, Range, Schema
from voluptuous_spark.checks import orphans
from voluptuous_spark.datasynth import clips_df


@pytest.fixture(scope="module")
def clips_path(spark):
    tmp = tempfile.mkdtemp()
    clips_df(spark, 500, seed=3, partitions=2).write.parquet(f"{tmp}/clips")
    return f"{tmp}/clips"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_skips_audio(spark, clips_path):
    df = spark.read.parquet(clips_path)
    res = Schema(
        {"sr_hz": In([8000, 16000]), "dur_ms": Range(min=1)},
        extra=ALLOW_EXTRA,
    ).validate(df.select("clip_id", "sr_hz", "dur_ms"), id_cols=["clip_id"])
    res.annotated.collect()  # resolve AQE so the final plan is visible
    plan = _plan(res.annotated)
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "bytes" not in scan_line
    # the expensive per-field err CASE chains (stage-1 hidden columns)
    # must be inside whole-stage codegen ("*(n)" prefix); only the final
    # small array-assembly projection is interpreted
    assert any(
        "*(" in l and "__e_0" in l for l in plan.splitlines()
    ), plan[:2000]


def test_predicate_pushdown(spark, clips_path):
    df = spark.read.parquet(clips_path).filter(F.col("codec") == "wav")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(codec,wav)" in plan


def test_row_validation_zero_shuffle(spark, clips_path):
    df = spark.read.parquet(clips_path).drop("bytes")
    res = Schema(
        {"sr_hz": In([8000]), "codec": In(["wav"])}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["clip_id"])
    plan = _plan(res.annotated)
    assert "Exchange" not in plan


def test_referential_broadcast(spark, clips_path):
    df = spark.read.parquet(clips_path).select("clip_id")
    parent = spark.createDataFrame(
        [(f"clip_{i:012d}",) for i in range(100)], "clip_id string"
    )
    anti = orphans(df, parent, "clip_id", broadcast_parent=True)
    anti.collect()
    plan = _plan(anti)
    # anti-join executes as a broadcast join: the parent-side dedup may
    # shuffle the (small) parent, but the fact side streams unshuffled
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    fact_section = plan.split("BroadcastHashJoin")[1]
    # the fact branch (first child printed) reads the parquet scan directly
    assert "FileScan parquet" in fact_section


def test_salted_agg_matches_plain(spark, clips_path):
    """Explicit skew salting (north rule): the two-stage salted
    aggregation recombines to exactly the plain groupBy answer — codec
    is the intentionally skewed column (85% 'wav', FIXTURES.md F1)."""
    from voluptuous_spark.checks.skew import salted_agg

    df = spark.read.parquet(clips_path).drop("bytes")
    plain = {
        r["codec"]: (r["n"], r["ms"])
        for r in df.groupBy("codec").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dur_ms").alias("ms")
        ).collect()
    }
    salted_df = salted_agg(
        df, "codec", {"n": "count", "ms": "sum:dur_ms"}, n_salts=8
    )
    salted = {r["codec"]: (r["n"], r["ms"]) for r in salted_df.collect()}
    assert salted == plain
    # the hot key really is spread: stage 1 groups on (codec, salt)
    plan = _plan(salted_df)
    assert plan.count("HashAggregate") >= 4  # 2x partial+final


def test_salted_join_left_anti_matches_plain(spark, clips_path):
    from voluptuous_spark.checks.skew import salted_join

    child = spark.read.parquet(clips_path).select("clip_id")
    parent = child.filter(F.col("clip_id") < "clip_000000000250")
    plain = {r["clip_id"] for r in orphans(child, parent, "clip_id").collect()}
    salted = {
        r["clip_id"]
        for r in salted_join(
            child, parent, "clip_id", how="left_anti", n_salts=4
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_cosine_band_join_carries_no_vectors(spark):
    # the SRP band self-join must shuffle ONLY (id, band_id, band_val) —
    # the embedding payload re-attaches AFTER pair dedup via id-keyed
    # joins (round-2 verdict: full vectors were riding the band explode
    # through the shuffle n_bands times)
    import random

    from voluptuous_spark.similarity import cosine_near_duplicates

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = cosine_near_duplicates(emb, dim=8, threshold=0.5)
    d.collect()  # resolve AQE
    plan = _plan(d)
    band_projects = [
        l for l in plan.splitlines()
        if "Project [" in l and "__band_id" in l
    ]
    assert band_projects, plan[:2000]
    for line in band_projects:
        assert " v#" not in line and "va#" not in line \
            and "vb#" not in line, line


def test_ivf_indexed_probe_partition_pruning(spark):
    # ivf_write_index writes the corpus partitioned by cluster id; a
    # probe must prune to whole partition directories (PartitionFilters
    # in the scan), not post-filter a full scan — and return exactly
    # what the unindexed ivf_topk computes
    import random
    import shutil
    import tempfile

    from voluptuous_spark.similarity import (
        ivf_topk, ivf_topk_indexed, ivf_write_index)

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(256)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(j, [rng.uniform(-1, 1) for _ in range(8)]) for j in range(3)],
        "query_id long, embedding array<double>",
    )
    tmp = tempfile.mkdtemp(prefix="vs_ivf_")
    try:
        cents = ivf_write_index(emb, f"{tmp}/idx", dim=8, n_clusters=8)
        d = ivf_topk_indexed(spark, f"{tmp}/idx", q, cents, k=5, n_probe=2)
        got = {(r["query_id"], r["rank"]): r["vec_id"] for r in d.collect()}
        plan = _plan(d)
        scan = next(
            l for l in plan.splitlines()
            if "FileScan" in l and "idx" in l
        )
        assert "PartitionFilters" in scan
        import re as _re

        pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", scan).group(1)
        assert "__cid" in pf and pf.strip(), scan
        # parity with the unindexed path (same quantizer parameters)
        ref = ivf_topk(emb, q, dim=8, k=5, n_clusters=8, n_probe=2)
        want = {(r["query_id"], r["rank"]): r["vec_id"] for r in ref.collect()}
        assert got == want
        # scan fraction shrinks with n_probe: probed-partition rows only
        def probed_rows(n_probe):
            dd = ivf_topk_indexed(
                spark, f"{tmp}/idx", q, cents, k=5, n_probe=n_probe)
            dd.collect()
            sc = next(
                l for l in _plan(dd).splitlines()
                if "FileScan" in l and "idx" in l
            )
            m = _re.search(r"PartitionFilters: \[[^\]]*IN \(([^)]*)\)", sc)
            return len(m.group(1).split(",")) if m else 8

        assert probed_rows(1) <= probed_rows(3) <= 8
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_staged_steps_prune_partitions(spark):
    # run(staging_path=...) materializes the input partitionBy(__bucket)
    # once; each step's scan must then carry a PartitionFilters entry on
    # __bucket (resume I/O proportional to REMAINING work — without
    # staging the bucket is a computed column and every step re-scans
    # the full table)
    import re as _re
    import shutil

    from voluptuous_spark import ALLOW_EXTRA, Range, Schema
    from voluptuous_spark.checkpoint import CheckpointedValidation

    tmp = tempfile.mkdtemp()
    try:
        df = spark.range(400).select(
            F.col("id").alias("clip_id"),
            (F.col("id") % 7).cast("double").alias("score"),
        )
        cv = CheckpointedValidation(
            spark, f"{tmp}/ckpt", n_buckets=8, key="clip_id",
            bucket_expr=F.pmod(F.col("clip_id"), F.lit(8)).cast("int"),
            fingerprint_expr=F.col("clip_id"),
        )
        bdf = cv._bucketed_input(df, f"{tmp}/staged")
        subset = bdf.filter(F.col("__bucket").isin([0, 1, 2]))
        subset.collect()
        scan = next(
            l for l in _plan(subset).splitlines()
            if "FileScan" in l and "staged" in l
        )
        assert "PartitionFilters" in scan
        pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", scan).group(1)
        assert "__bucket" in pf and pf.strip(), scan
        # end-to-end: staged run + resume produce the same report as the
        # unstaged path, and restaging is skipped on the resumed run
        schema = Schema({"score": Range(max=5.0)}, extra=ALLOW_EXTRA)
        fn = lambda sub: schema.validate(sub, id_cols=["clip_id"]).annotated
        cv.run(df, fn, buckets_per_step=4, max_steps=1, run_id="a",
               staging_path=f"{tmp}/staged")
        cv.run(df, fn, buckets_per_step=4, run_id="b",
               staging_path=f"{tmp}/staged")
        staged = {
            (r["bucket"], r["n_rows"], r["passed"], r["failed"], r["run_id"])
            for r in cv.report().collect()
        }
        cv2 = CheckpointedValidation(
            spark, f"{tmp}/ckpt2", n_buckets=8, key="clip_id",
            bucket_expr=F.pmod(F.col("clip_id"), F.lit(8)).cast("int"),
            fingerprint_expr=F.col("clip_id"),
        )
        cv2.run(df, fn, buckets_per_step=4, max_steps=1, run_id="a")
        cv2.run(df, fn, buckets_per_step=4, run_id="b")
        plain = {
            (r["bucket"], r["n_rows"], r["passed"], r["failed"], r["run_id"])
            for r in cv2.report().collect()
        }
        assert staged == plain and len(staged) == 8
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
