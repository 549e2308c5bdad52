"""Constraint suggestion: profile -> Schema -> validate the next
delivery. The suggested schema must speak the same DSL (reference-exact
messages) and profile in two aggregations."""

import datetime

import pytest
from pyspark.sql import functions as F

from voluptuous_spark.suggest import (
    schema_from_spec,
    suggest_constraints,
    suggest_from_stats,
    suggest_schema,
)


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        (i,
         50.0 + (i % 40) * 5.0,
         ["wav", "flac", "opus"][i % 3],
         f"note text number {i}",           # high-cardinality string
         None if i % 10 == 0 else i % 5,    # 10% nulls
         datetime.date(2026, 1, 1 + i % 28))
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "id long, dur double, codec string, note string, "
              "flaky int, d date"
    )


def test_spec_shapes(profiled):
    spec = suggest_constraints(profiled)
    assert spec["id"]["kind"] == "range" and spec["id"]["integral"]
    assert spec["id"]["min"] == 0 and spec["id"]["max"] == 199
    assert spec["dur"] == {
        "required": True, "null_rate": 0.0, "kind": "range",
        "min": 50.0, "max": 245.0, "integral": False,
    }
    assert spec["codec"]["kind"] == "in"
    assert spec["codec"]["values"] == ["flac", "opus", "wav"]
    # 200 distinct notes >> max_in_values -> length bounds instead
    assert spec["note"]["kind"] == "length"
    assert spec["note"]["min_len"] == len("note text number 0")
    assert spec["note"]["max_len"] == len("note text number 100")
    # 10% nulls -> Optional by default, Required under tolerance 0.2
    assert spec["flaky"]["required"] is False
    assert spec["flaky"]["null_rate"] == pytest.approx(0.1)
    tol = suggest_constraints(profiled, null_tolerance=0.2)
    assert tol["flaky"]["required"] is True
    # date column: presence only
    assert spec["d"]["kind"] == "none" and spec["d"]["required"]


def test_self_validation_clean_and_drift_flagged(spark, profiled):
    schema, spec = suggest_schema(profiled)
    assert schema.validate(profiled, id_cols=["id"]).violations.count() == 0

    bad = spark.createDataFrame(
        [(900, 999.0, "mp3", "x", 2, datetime.date(2026, 1, 1)),
         (150, 100.0, "wav", "note text number 150x!!", None,
          datetime.date(2026, 1, 2))],
        profiled.schema,
    )
    v = schema.validate(bad, id_cols=["id"]).violations
    got = {(r["id"], r["path"][0], r["error_type"]) for r in v.collect()}
    assert (900, "id", "RangeInvalid") in got
    assert (900, "dur", "RangeInvalid") in got
    assert (900, "codec", "InInvalid") in got
    assert (900, "note", "LengthInvalid") in got
    # 150 drifts only on note length (+3 chars); its null flaky is fine
    # because flaky was suggested Optional
    assert (150, "note", "LengthInvalid") in got
    assert not any(r[0] == 150 and r[1] != "note" for r in got)


def test_required_null_violates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, c string"
    )
    schema, spec = suggest_schema(df)
    assert spec["c"]["required"] is True
    nulls = spark.createDataFrame([(3, None)], "id int, c string")
    v = schema.validate(nulls, id_cols=["id"]).violations.collect()
    assert any(r["error_type"] == "RequiredFieldInvalid" for r in v)


def test_range_slack_widens(profiled):
    spec = suggest_constraints(profiled, range_slack=0.1)
    # dur spans 195 -> pad 19.5 each side
    assert spec["dur"]["min"] == pytest.approx(50.0 - 19.5)
    assert spec["dur"]["max"] == pytest.approx(245.0 + 19.5)


def test_suggest_from_sketch_stats(spark, profiled):
    """Gate a new delivery from a PREVIOUS run's merged sketch stats —
    no re-read of the profiled table."""
    from voluptuous_spark.checks.sketches import (
        column_sketches,
        merge_sketches,
    )

    merged = merge_sketches(
        column_sketches(profiled, ["dur", "codec", "flaky"])
    )
    spec = suggest_from_stats(merged)
    assert spec["dur"]["kind"] == "range"
    assert spec["dur"]["min"] == 50.0 and spec["dur"]["max"] == 245.0
    assert spec["codec"]["kind"] == "none"     # sketches carry no values
    assert spec["flaky"]["required"] is False

    schema = schema_from_spec(spec)
    ok = spark.createDataFrame(
        [(1, 100.0, "anything", 0)], "id int, dur double, codec string, "
                                     "flaky int"
    )
    assert schema.validate(ok, id_cols=["id"]).violations.count() == 0
    bad = spark.createDataFrame(
        [(2, 9999.0, "x", 0)], "id int, dur double, codec string, flaky int"
    )
    v = bad_v = schema.validate(bad, id_cols=["id"]).violations.collect()
    assert [r["error_type"] for r in bad_v] == ["RangeInvalid"]
