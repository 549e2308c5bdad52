"""Source/Sink abstraction (Iceberg-shaped, parquet fallback)."""

import os


def test_source_sink_roundtrip(spark, tmp_path):
    from voluptuous_spark.sources import Sink, Source, load_table

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "t")
    Sink(path, mode="overwrite").write(df)
    assert os.path.isdir(path)

    back = Source(path).load(spark)
    assert back.count() == 100
    assert set(back.columns) == {"id", "v"}
    assert load_table(spark, path).count() == 100

    # append mode accumulates (the violation/report sink shape)
    Sink(path, mode="append").write(df.limit(10))
    assert Source(path).load(spark).count() == 110


def test_source_pushdown_reaches_scan(spark, tmp_path):
    """Filter + projection through the abstraction must reach the parquet
    scan (PushedFilters / narrow ReadSchema) — the property that matters
    when `format` flips to iceberg at 10^12 rows."""
    from voluptuous_spark.sources import Sink, Source

    df = spark.range(1000).selectExpr(
        "id", "id * 2 AS v", "repeat('x', 100) AS pad"
    )
    path = str(tmp_path / "p")
    Sink(path, mode="overwrite").write(df)

    q = Source(path).load(spark).filter("id = 7").select("v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(id)" in plan
    assert "pad" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert q.collect()[0]["v"] == 14
