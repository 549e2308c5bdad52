"""Schema-level semantics: required/optional/defaults, extra policies,
Exclusive/Inclusive groups, nested structs, extend/infer, rendering.
Mirrors reference tests.py:89-94 (required), 190-223 (remove/extra),
1623-1680 (inclusive/exclusive), tests.md golden renderings.
"""

import pytest
from pyspark.sql import functions as F

from voluptuous_spark import (
    ALLOW_EXTRA,
    PREVENT_EXTRA,
    REMOVE_EXTRA,
    All,
    Coerce,
    Exclusive,
    In,
    MultipleInvalid,
    Inclusive,
    Length,
    Optional,
    Range,
    Remove,
    Required,
    Schema,
    UnsupportedSchema,
)


def _viol(res):
    return {
        (tuple(r["path"]), r["message"], r["error_type"])
        for r in res.violations.collect()
    }


def test_required_missing_null(spark):
    df = spark.createDataFrame([("a",), (None,)], "q string")
    res = Schema({Required("q"): str}).validate(df, id_cols=[])
    assert _viol(res) == {
        (("q",), "required key not provided", "RequiredFieldInvalid")
    }


def test_required_column_absent(spark):
    df = spark.createDataFrame([(1,)], "other int")
    res = Schema({Required("q"): str}, extra=ALLOW_EXTRA).validate(df, id_cols=[])
    assert _viol(res) == {
        (("q",), "required key not provided", "RequiredFieldInvalid")
    }


def test_required_custom_msg(spark):
    df = spark.createDataFrame([(None,)], "q string")
    res = Schema({Required("q", msg="aaa?"): str}).validate(df, id_cols=[])
    assert _viol(res) == {(("q",), "aaa?", "RequiredFieldInvalid")}


def test_optional_default(spark):
    df = spark.createDataFrame([(None,), (7,)], "per_page int")
    res = Schema({Optional("per_page", default=5): int}).validate(df, id_cols=[])
    assert sorted(r["per_page"] for r in res.valid.collect()) == [5, 7]


def test_required_default_no_error(spark):
    df = spark.createDataFrame([(None,)], "q int")
    res = Schema({Required("q", default=42): int}).validate(df, id_cols=[])
    assert _viol(res) == set()
    assert res.valid.collect()[0]["q"] == 42


def test_extra_prevent(spark):
    df = spark.createDataFrame([("a", 1)], "q string, rogue int")
    res = Schema({"q": str}).validate(df, id_cols=[])
    assert _viol(res) == {(("rogue",), "extra keys not allowed", "Invalid")}


def test_extra_allow_and_remove(spark):
    df = spark.createDataFrame([("a", 1)], "q string, rogue int")
    allow = Schema({"q": str}, extra=ALLOW_EXTRA).validate(df, id_cols=[])
    assert allow.valid.columns == ["q", "rogue"]
    rm = Schema({"q": str}, extra=REMOVE_EXTRA).validate(df, id_cols=[])
    assert rm.valid.columns == ["q"]


def test_remove_marker(spark):
    """Remove drops the column from output, never errors (tests.py:190-223)."""
    df = spark.createDataFrame([("a", "junk")], "q string, tmp string")
    res = Schema({"q": str, Remove("tmp"): str}).validate(df, id_cols=[])
    assert _viol(res) == set()
    assert res.valid.columns == ["q"]


def test_exclusive_group(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 2), (1, 2), (None, None)], "x int, y int"
    )
    res = Schema(
        {Exclusive("x", "pair"): int, Exclusive("y", "pair"): int}
    ).validate(df, id_cols=[])
    assert _viol(res) == {
        (
            ("<pair>",),
            "two or more values in the same group of exclusion 'pair'",
            "ExclusiveInvalid",
        )
    }
    assert res.valid.count() == 3


def test_inclusive_group(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, None), (1, None)], "x int, y int"
    )
    res = Schema(
        {Inclusive("x", "pair"): int, Inclusive("y", "pair"): int}
    ).validate(df, id_cols=[])
    assert _viol(res) == {
        (
            ("<pair>",),
            "some but not all values in the same group of inclusion 'pair'",
            "InclusiveInvalid",
        )
    }


def test_nested_struct_paths(spark):
    """Depth-first error paths into nested dicts (tests.md:48-57)."""
    df = spark.createDataFrame(
        [(("public", 3),), (("private", 99),)],
        "settings struct<snmp_community:string, retries:int>",
    )
    res = Schema(
        {"settings": {"snmp_community": str, "retries": Range(min=0, max=10)}}
    ).validate(df, id_cols=[])
    assert _viol(res) == {
        (("settings", "retries"), "value must be at most 10", "RangeInvalid")
    }
    rendered = res.violations.select("rendered").collect()[0][0]
    # reference-verified: value errors in a dict render with the
    # ' for dictionary value' context (schema_builder.py:370, error.py:52)
    assert rendered == (
        "value must be at most 10 for dictionary value"
        " @ data['settings']['retries']"
    )


def test_humanized(spark):
    """humanize_error: '<rendered>. Got <repr>' (humanize.py:43-48)."""
    df = spark.createDataFrame([("ogg",)], "codec string")
    res = Schema({"codec": In(["wav", "mp3"])}).validate(df, id_cols=[])
    h = res.violations.select("humanized").collect()[0][0]
    # reference-verified via voluptuous.humanize.humanize_error
    assert h == (
        "value must be one of ['mp3', 'wav'] for dictionary value"
        " @ data['codec']. Got 'ogg'"
    )


def test_sequence_alternatives(spark):
    """list schema: each element matches >=1 alternative
    (schema_builder.py:578-633)."""
    df = spark.createDataFrame([(["a", "b"],), (["a", ""],)], "tags array<string>")
    res = Schema({"tags": [Length(min=1)]}, extra=ALLOW_EXTRA).validate(
        df, id_cols=[]
    )
    v = _viol(res)
    # element-level error with index path (schema_builder.py:609-625):
    # the failing element's own message at data['tags'][1]
    assert v == {
        (("tags", "1"), "length of value must be at least 1",
         "LengthInvalid")
    }


def test_multiple_errors_accumulate(spark):
    """dict validation accumulates every error (schema_builder.py:360-377)."""
    df = spark.createDataFrame([(0, "zz")], "n int, s string")
    res = Schema({"n": Range(min=1), "s": In(["a"])}).validate(df, id_cols=[])
    assert len(res.violations.collect()) == 2


def test_extend(spark):
    base = Schema({"a": int, "b": str})
    ext = base.extend({"b": int, "c": float})
    names = {str(k) for k in ext.schema}
    assert names == {"a", "b", "c"}
    assert ext.schema["b"] is int


def test_infer(spark):
    df = spark.createDataFrame([("x", 1, 1.5)], "a string, b long, c double")
    s = Schema.infer(df)
    res = s.validate(df, id_cols=[])
    assert res.valid.count() == 1


def test_non_dict_schema_rejected_for_tables(spark):
    # constructing is fine (reference compiles any root), but TABLE
    # validation needs a dict of column -> validator
    s = Schema([1, 2, 3])
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(UnsupportedSchema):
        s.validate(df)


def test_scalar_schema_single_doc(spark):
    # reference schema_builder.py:202-205: any root schema validates a
    # single value through __call__
    assert Schema(int)(5) == 5
    assert Schema([int])([1, 2]) == [1, 2]
    from voluptuous_spark import All, Coerce, Range

    assert Schema(All(Coerce(int), Range(min=1)))("7") == 7
    with pytest.raises(MultipleInvalid) as ei:
        Schema(int)("x")
    assert str(ei.value) == "expected int"
    with pytest.raises(MultipleInvalid) as ei:
        Schema({"k": int})(5)
    assert str(ei.value) == "expected a dictionary"
    with pytest.raises(MultipleInvalid) as ei:
        Schema([int])([1, None, 3])
    assert str(ei.value) == "expected int @ data[1]"
    # mixed-type sequences validate element-wise driver-side (reference
    # _compile_sequence semantics; schema._driver_validate_sequence)
    with pytest.raises(MultipleInvalid) as ei:
        Schema([int])([1, "a"])
    assert str(ei.value) == "expected int @ data[1]"


def test_report_partitions(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "n int, part int"
    ).repartition(4)
    res = Schema({"n": Range(min=5), "part": int}, extra=ALLOW_EXTRA).validate(
        df, id_cols=[]
    )
    rep = res.report().collect()
    assert sum(r["rows"] for r in rep) == 30
    assert sum(r["failed"] for r in rep) == 5


def test_single_select_plan(spark):
    """Linearity analog (tests.py:1201-1243): all row checks compile into
    ONE projection — the physical plan has no joins/shuffles/extra scans."""
    df = spark.createDataFrame([(1, "a", 2.0)], "a int, b string, c double")
    res = Schema(
        {"a": Range(min=0), "b": Length(min=1), "c": Range(max=10.0)},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=[])
    plan = res.annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles
    assert "Join" not in plan


def test_wide_schema_linear_compile(spark):
    """Wide-schema linearity (reference tests.py:1201-1243, the O(n)
    regression test with a 1000-key schema and 50% extra keys): a
    300-key schema over a 400-column row — 100 columns extra under
    ALLOW_EXTRA — compiles to a single shuffle-free projection, and each
    schema column is referenced a BOUNDED number of times in the plan
    (one check evaluation per key, not keys x candidates)."""
    n_keys, n_extra = 300, 100
    cols = ", ".join(f"c{i} int" for i in range(n_keys + n_extra))
    row = tuple(range(n_keys + n_extra))
    df = spark.createDataFrame([row], cols)
    res = Schema(
        {f"c{i}": Range(min=0) for i in range(n_keys)},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=[])
    plan = res.annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # every key evaluated once: the check column c7's references don't
    # multiply with schema width (appears in the scan + its own check)
    assert plan.count("c7#") < 40
    rep = res.report().collect()
    assert sum(r["rows"] for r in rep) == 1
    assert sum(r["failed"] for r in rep) == 0


def test_required_complex_key_any(spark):
    """Required(Any('a','b')) = at-least-one-of (reference
    schema_builder.py:311-325; tests.py:2042-2065)."""
    from voluptuous_spark import ALLOW_EXTRA, Any, Required, Schema

    df = spark.createDataFrame(
        [(1, "red", None), (2, None, "50%"), (3, None, None)],
        "i long, color string, brightness string",
    )
    res = Schema(
        {Required(Any("color", "brightness")): str}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["i"])
    v = sorted(res.violations.collect(), key=lambda r: r["message"])
    # the reference emits TWO errors per unsatisfied group: the group
    # error (schema_builder.py:311-325) then the generic 'required key
    # not provided' (:397-404) — verified live against the reference
    assert len(v) == 2 and all(r["i"] == 3 for r in v)
    assert v[0]["message"] == (
        "at least one of ['color', 'brightness'] is required"
    )
    assert v[1]["message"] == "required key not provided"
    assert all(r["error_type"] == "RequiredFieldInvalid" for r in v)
    # present candidates are validated against the value schema
    assert res.valid.count() == 2


def test_required_complex_key_custom_message(spark):
    """Custom msg on a complex Required key (tests.py:2067-2088)."""
    from voluptuous_spark import ALLOW_EXTRA, Any, Required, Schema

    df = spark.createDataFrame([(1, None, None)], "i long, a string, b string")
    res = Schema(
        {Required(Any("a", "b"), msg="Please specify one"): str},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["i"])
    assert res.violations.collect()[0]["message"] == "Please specify one"


def test_object_type_accepts_everything(spark):
    """`object` as a value schema passes any type (isinstance(v, object)
    is always True; schema_builder.py:789-796)."""
    from voluptuous_spark import ALLOW_EXTRA, Schema

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, None)], "i long, d double, s string"
    )
    res = Schema({"d": object, "s": object}, extra=ALLOW_EXTRA).validate(
        df, id_cols=["i"]
    )
    assert res.violations.count() == 0


def test_union_discriminant_kwarg(spark):
    """Union accepts the reference's discriminant kwarg
    (validators.py:343-382); column semantics match Any."""
    from voluptuous_spark import ALLOW_EXTRA, In, Range, Schema, Union

    df = spark.createDataFrame([(1, 5.0), (2, 99.0), (3, 77.0)], "i long, v double")
    res = Schema(
        {"v": Union(Range(min=0.0, max=50.0), In([99.0]),
                    discriminant=lambda val, alts: alts)},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["i"])
    bad = res.violations.collect()
    assert [r["i"] for r in bad] == [3]
    # deepest-error rule: losing branch's (Range's) error surfaces
    assert bad[0]["message"] == "value must be at most 50.0"
    assert bad[0]["error_type"] == "RangeInvalid"
