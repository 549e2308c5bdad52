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
