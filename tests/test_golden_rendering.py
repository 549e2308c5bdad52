"""Golden rendered-string corpus, translated from the reference's doctest
file ``voluptuous/tests/tests.md`` (run there via --doctest-glob). Every
expected string below was verified by executing the reference library
against the equivalent data. Dict documents become one-row DataFrames;
nested dicts become struct columns."""

from pyspark.sql import functions as F

from voluptuous_spark import ALLOW_EXTRA, In, Range, Required, Schema


def _rendered(res):
    return sorted(r["rendered"] for r in res.violations.collect())


def test_extra_keys_not_allowed(spark):
    # tests.md: "extra keys not allowed @ data['two']"
    df = spark.createDataFrame([(2,)], "two int")
    res = Schema({"one": int}).validate(df, id_cols=[])
    assert _rendered(res) == ["extra keys not allowed @ data['two']"]


def test_required_key_not_provided(spark):
    # reference-verified: "required key not provided @ data['x']"
    df = spark.createDataFrame([(1,)], "i long")
    res = Schema({Required("x"): int}, extra=ALLOW_EXTRA).validate(
        df, id_cols=["i"]
    )
    assert _rendered(res) == ["required key not provided @ data['x']"]


def test_scalar_value_in_dict(spark):
    # tests.md "Multiple errors are reported": value mismatches render with
    # the mapping context, the extra key without it
    df = spark.createDataFrame([(2, 3, 4)], "one int, two int, three int")
    res = Schema({"one": 1, "two": 2}).validate(df, id_cols=[])
    assert _rendered(res) == [
        "extra keys not allowed @ data['three']",
        "not a valid value for dictionary value @ data['one']",
        "not a valid value for dictionary value @ data['two']",
    ]


def test_nested_dict_value(spark):
    # tests.md: "not a valid value for dictionary value
    #            @ data['one']['four']" (depth-first, nested path)
    df = spark.createDataFrame(
        [(("three", "six"),)],
        "one struct<two:string,four:string>",
    )
    res = Schema({"one": {"two": "three", "four": "five"}}).validate(
        df, id_cols=[]
    )
    assert _rendered(res) == [
        "not a valid value for dictionary value @ data['one']['four']"
    ]


def test_validator_messages_keep_context_out_of_message(spark):
    """The driver-facing ``message`` column stays the plain reference msg;
    only ``rendered`` carries the ' for dictionary value' context."""
    df = spark.createDataFrame([(99,)], "x int")
    res = Schema({"x": Range(min=0, max=10)}, extra=ALLOW_EXTRA).validate(
        df, id_cols=[]
    )
    row = res.violations.collect()[0]
    assert row["message"] == "value must be at most 10"
    assert row["rendered"] == (
        "value must be at most 10 for dictionary value @ data['x']"
    )


def test_in_rendering_matches_reference(spark):
    # reference-verified:
    # "value must be one of ['mp3', 'wav'] for dictionary value
    #  @ data['codec']. Got 'ogg'"
    df = spark.createDataFrame([("ogg",)], "codec string")
    res = Schema({"codec": In(["wav", "mp3"])}).validate(df, id_cols=[])
    assert res.violations.select("humanized").collect()[0][0] == (
        "value must be one of ['mp3', 'wav'] for dictionary value"
        " @ data['codec']. Got 'ogg'"
    )
