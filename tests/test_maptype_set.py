"""Round-2 parity tests: dynamic MapType key schemas
(reference schema_builder.py:469-488), set schemas (schema_builder.py:
665-703), Unordered greedy matching (validators.py:1035-1113), Any
deepest-error selection (validators.py:322-336), Msg depth<=1 rule
(schema_builder.py:942-949), humanize truncation marker
(humanize.py:44-47).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from voluptuous_spark import (
    ALLOW_EXTRA,
    REMOVE_EXTRA,
    Coerce,
    In,
    Length,
    Match,
    Msg,
    Range,
    Required,
    Schema,
    Unordered,
    dsl,
)


# ---------------------------------------------------------------------------
# MapType dynamic keys


def test_map_wildcard_value_check(spark):
    df = spark.createDataFrame(
        [(1, {"a": 5, "b": 50}), (2, {"a": 200}), (3, None), (4, {})],
        "id long, props map<string,long>",
    )
    res = Schema(
        {"props": {str: Range(min=0, max=100)}}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["id"])
    bad = res.violations.orderBy("id").collect()
    assert [(r.id, list(r.path), r.message) for r in bad] == [
        (2, ["props", "a"], "value must be at most 100")
    ]
    assert bad[0].rendered == (
        "value must be at most 100 for dictionary value @ data['props']['a']"
    )
    # NULL map == absent key; empty map valid
    assert sorted(r.id for r in res.valid.collect()) == [1, 3, 4]


def test_map_literal_required_and_extra(spark):
    df = spark.createDataFrame(
        [(1, {"name": "x", "age": "5"}), (2, {"zzz": "1"})],
        "id long, m map<string,string>",
    )
    # PREVENT_EXTRA inside the map: undeclared keys error with the
    # reference message/path (schema_builder.py:384-396)
    res = Schema(
        {"id": int, "m": {Required("name"): str}}
    ).validate(df, id_cols=["id"])
    got = sorted(
        (r.id, list(r.path), r.message) for r in res.violations.collect()
    )
    assert got == [
        (1, ["m", "age"], "extra keys not allowed"),
        (2, ["m", "name"], "required key not provided"),
        (2, ["m", "zzz"], "extra keys not allowed"),
    ]


def test_map_coerce_keys(spark):
    # {Coerce(int): str} (reference doctest schema_builder.py:483-488):
    # coercible keys transform; un-coercible keys are extra
    df = spark.createDataFrame(
        [(1, {"10": "x", "oops": "y"}), (2, {"7": "z"})],
        "id long, m map<string,string>",
    )
    res = Schema({"id": int, "m": {Coerce(int): str}}).validate(
        df, id_cols=["id"]
    )
    rows = {r.id: r.m for r in res.annotated.select("id", "m").collect()}
    assert rows[1] == {10: "x"} and rows[2] == {7: "z"}
    bad = res.violations.collect()
    assert [(r.id, list(r.path)) for r in bad] == [(1, ["m", "oops"])]


def test_map_remove_extra_policy(spark):
    df = spark.createDataFrame(
        [(1, {"name": "x", "junk": "y"})], "id long, m map<string,string>"
    )
    res = Schema(
        {"m": {"name": str}}, extra=REMOVE_EXTRA
    ).validate(df, id_cols=["id"])
    assert res.violations.count() == 0
    assert res.annotated.select("m").first().m == {"name": "x"}


def test_map_optional_default_injection(spark):
    from voluptuous_spark import Optional

    df = spark.createDataFrame(
        [(1, {"a": 5}), (2, {"lvl": 9, "a": 1})],
        "id long, m map<string,long>",
    )
    res = Schema(
        {"m": {Optional("lvl", default=3): int, str: int}},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["id"])
    rows = {r.id: r.m for r in res.annotated.select("id", "m").collect()}
    assert rows[1]["lvl"] == 3 and rows[2]["lvl"] == 9


# ---------------------------------------------------------------------------
# set schemas


def test_set_schema_alternatives(spark):
    df = spark.createDataFrame(
        [(1, ["A", "N"]), (2, ["A", "X"]), (3, None)],
        "id long, v array<string>",
    )
    res = Schema(
        {"v": {"A", "N", "R"}}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["id"])
    bad = res.violations.collect()
    assert [(r.id, r.message, r.error_type) for r in bad] == [
        (2, "invalid value in set", "Invalid")
    ]


def test_set_schema_not_a_set(spark):
    # non-array column -> 'expected a set' (schema_builder.py:681)
    ch = dsl.compile_validator({1, 2}, T.LongType())
    df = spark.createDataFrame([(5,)], "v long")
    e = df.select(ch.err(F.col("v")).alias("e")).first().e
    assert e.message == "expected a set" and e.error_type == "Invalid"


def test_frozenset_schema(spark):
    ch = dsl.compile_validator(frozenset({1, 2}), T.ArrayType(T.LongType()))
    df = spark.createDataFrame([([1, 3],)], "v array<long>")
    e = df.select(ch.err(F.col("v")).alias("e")).first().e
    assert e.message == "invalid value in frozenset"


# ---------------------------------------------------------------------------
# Unordered greedy semantics (exact reference parity incl. messages)


@pytest.mark.parametrize(
    "value,expected",
    [
        ([3.0, 1.0], "Element #1 (1.0) is not valid against any validator"),
        ([1.0, 3.0], None),
        ([11.0, 1.0], "Element #0 (11.0) is not valid against any validator"),
        ([5.0, 5.0], None),
        ([1.0, 1.0], "Element #1 (1.0) is not valid against any validator"),
    ],
)
def test_unordered_greedy(spark, value, expected):
    # greedy consumption (validators.py:1072-1088): element takes the
    # FIRST unconsumed passing validator; [3.0, 1.0] consumes Range(0,10)
    # for 3.0, leaving Range(2,10) which 1.0 fails — the permissive
    # perfect-matching answer (valid) is WRONG here
    ch = Unordered([Range(0, 10), Range(2, 10)]).bind(
        T.ArrayType(T.DoubleType())
    )
    df = spark.createDataFrame([(value,)], "v array<double>")
    e = df.select(ch.err(F.col("v")).alias("e")).first().e
    assert (e.message if e else None) == expected


def test_unordered_length_mismatch(spark):
    ch = Unordered([Range(0, 10), Range(2, 10)]).bind(
        T.ArrayType(T.DoubleType())
    )
    df = spark.createDataFrame([([1.0],)], "v array<double>")
    e = df.select(ch.err(F.col("v")).alias("e")).first().e
    assert e.message == "List lengths differ, value:1 != target:2"


def test_unordered_not_sequence(spark):
    ch = Unordered([Range(0, 10)]).bind(T.DoubleType())
    df = spark.createDataFrame([(7.0,)], "v double")
    e = df.select(ch.err(F.col("v")).alias("e")).first().e
    assert e.message == "Value 7.0 is not sequence!"


# ---------------------------------------------------------------------------
# Any deepest-error + Msg depth rule


def test_any_surfaces_first_branch_error(spark):
    df = spark.createDataFrame([(1, "zzz")], "id long, v string")
    res = Schema(
        {"v": dsl.Any(In(["click", "view"]), Match("^err"))},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["id"])
    bad = res.violations.first()
    assert bad.message == "value must be one of ['click', 'view']"
    assert bad.error_type == "InInvalid"


def test_msg_direct_override_collapses(spark):
    df = spark.createDataFrame([(1, ("bad",))], "id long, s struct<a:string>")
    res = Schema(
        {"s": Msg({"a": Range(min=0, max=5)}, "custom boom")},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["id"])
    bad = res.violations.first()
    assert (list(bad.path), bad.message, bad.error_type) == (
        ["s"], "custom boom", "Invalid"
    )


def test_msg_deep_error_passes_through(spark):
    df = spark.createDataFrame(
        [(1, (("x",),))], "id long, s struct<inner:struct<b:string>>"
    )
    res = Schema(
        {"s": Msg({"inner": {"b": Range(min=0, max=5)}}, "boom")},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["id"])
    bad = res.violations.first()
    assert list(bad.path) == ["s", "inner", "b"]
    assert bad.message == "invalid value or type (must have a partial ordering)"


def test_range_cross_type_is_range_invalid(spark):
    # reference: 'bad' >= 0 raises TypeError -> RangeInvalid
    # (validators.py:668-673); must NOT become a Spark ANSI cast error
    df = spark.createDataFrame([(1, "bad")], "id long, v string")
    res = Schema({"v": Range(min=0, max=5)}, extra=ALLOW_EXTRA).validate(
        df, id_cols=["id"]
    )
    bad = res.violations.first()
    assert bad.message == "invalid value or type (must have a partial ordering)"
    assert bad.error_type == "RangeInvalid"


# ---------------------------------------------------------------------------
# humanize truncation marker


def test_offending_truncated_with_marker(spark):
    long_s = "x" * 600
    df = spark.createDataFrame([(1, long_s)], "id long, v string")
    from voluptuous_spark import Length

    res = Schema({"v": Length(max=10)}, extra=ALLOW_EXTRA).validate(
        df, id_cols=["id"]
    )
    off = res.violations.first().offending
    # repr cut to 497 chars + '...' (humanize.py:44-47)
    assert len(off) == 500 and off.endswith("...")


def test_map_nested_in_struct(spark):
    # a map column nested inside a struct validates per entry (was
    # silently DictInvalid before round 2)
    df = spark.createDataFrame(
        [(1, ({"a": 5},)), (2, ({"a": 500},))],
        "id long, s struct<m:map<string,long>>",
    )
    res = Schema(
        {"s": {"m": {str: Range(min=0, max=100)}}}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["id"])
    bad = res.violations.collect()
    assert [(r.id, list(r.path), r.message) for r in bad] == [
        (2, ["s", "m", "a"], "value must be at most 100")
    ]


def test_any_of_dicts_on_non_struct_is_dict_invalid(spark):
    # Any(dict, dict) over a non-struct column: every branch fails its
    # dict gate, deepest-error surfaces 'expected a dictionary'
    res = Schema(
        {"v": dsl.Any({"a": int}, {"b": str})}, extra=ALLOW_EXTRA
    ).validate(
        spark.createDataFrame([(1, "x")], "id long, v string"),
        id_cols=["id"],
    )
    rows = res.violations.collect()
    assert len(rows) == 1
    assert rows[0]["message"] == "expected a dictionary"
    assert rows[0]["error_type"] == "DictInvalid"


def test_all_of_dicts_on_non_struct_is_dict_invalid(spark):
    # All(dict, dict) over a non-struct column: the FIRST stage fails its
    # dict gate and propagates (first-failing-stage-wins,
    # validators.py:276-295)
    res = Schema(
        {"v": dsl.All({"a": int}, {"b": str})}, extra=ALLOW_EXTRA
    ).validate(
        spark.createDataFrame([(1, "x")], "id long, v string"),
        id_cols=["id"],
    )
    rows = res.violations.collect()
    assert len(rows) == 1
    assert rows[0]["message"] == "expected a dictionary"
    assert rows[0]["error_type"] == "DictInvalid"


# ---------------------------------------------------------------------------
# top-level wildcard column keys (dynamic keys over the static column set)


def test_wildcard_type_key_matches_all_columns(spark):
    # Schema({str: validator}): every column validates (reference
    # {type: schema} dynamic keys, resolved against static column names)
    df = spark.createDataFrame(
        [(5, 20), (500, 7)], "a long, b long"
    )
    res = Schema({str: Range(min=0, max=100)}).validate(df, id_cols=[])
    bad = sorted(
        (list(r.path), r.message) for r in res.violations.collect()
    )
    assert bad == [(["a"], "value must be at most 100")]


def test_wildcard_match_key_and_remove(spark):
    from voluptuous_spark import Remove

    df = spark.createDataFrame(
        [(1, 5.0, "x")], "id long, l_val double, tmp_scratch string"
    )
    res = Schema(
        {
            "id": int,
            Match(r"^l_"): Range(min=0.0, max=10.0),
            Remove(Match(r"^tmp_")): object,
        }
    ).validate(df, id_cols=["id"])
    assert res.violations.count() == 0
    assert "tmp_scratch" not in res.valid.columns  # Remove wildcard
    assert "l_val" in res.valid.columns


def test_wildcard_extra_key_allows_and_validates(spark):
    from voluptuous_spark import dsl

    df = spark.createDataFrame([(1, "ok"), (2, "")], "id long, note string")
    res = Schema(
        {"id": int, dsl.Extra: Length(min=1)}
    ).validate(df, id_cols=["id"])
    bad = res.violations.collect()
    assert [(r.id, list(r.path)) for r in bad] == [(2, ["note"])]


# ---------------------------------------------------------------------------
# non-string document keys via __call__ (tests.py:1111-1129 ordered dict)
# ---------------------------------------------------------------------------


def test_ordered_dict_number_keys(spark):
    # Schema({Number(): Number()}) over float->float pairs: the doc rides
    # one MapType column; entry order is restored on the way out
    from voluptuous_spark import Number

    schema = Schema({Number(): Number()})
    data = {5.0: 3.7, 24.0: 8.7, 43.0: 1.5, 62.0: 2.1,
            71.5: 6.7, 90.5: 4.1, 109.0: 3.9}
    out = schema(data)
    assert out == data
    assert list(out.keys()) == list(data.keys()), "order not preserved"


def test_number_keyed_doc_value_error_path(spark):
    # failing value renders the FLOAT key in the path: data[5.0], not
    # data['5.0'] (verified against the reference)
    from voluptuous_spark import MultipleInvalid, Number

    with pytest.raises(MultipleInvalid) as exc:
        Schema({Number(): Number()})({5.0: "x"})
    assert str(exc.value) == (
        "Value must be a number enclosed with string for dictionary "
        "value @ data[5.0]"
    )


def test_int_keyed_doc_roundtrip(spark):
    out = Schema({int: str})({1: "a", 2: "b"})
    assert out == {1: "a", 2: "b"}


def test_msg_over_maptype_collapse(spark):
    """Msg over a dynamic-key map value: a per-entry error sits at depth 1
    relative to the Msg, so the whole set collapses to Invalid(msg) at the
    key path (schema_builder.py:946-951) — per row, from runtime paths."""
    import voluptuous_spark as vs

    sch = vs.Schema({"k": vs.Msg({str: int}, "mm")}, extra=vs.ALLOW_EXTRA)
    df = spark.createDataFrame(
        [(1, {"a": 3}), (2, {"b": None})], "id int, k map<string,bigint>"
    )
    res = sch.validate(df, id_cols=["id"])
    rows = res.violations.select("id", "path", "message").collect()
    assert [(r.id, list(r.path), r.message) for r in rows] == [
        (2, ["k"], "mm")
    ]
    assert [r.id for r in res.valid.select("id").collect()] == [1]


def test_maptype_table_group_checks(spark):
    """Exclusive/Inclusive groups inside a dynamic-key MAP column at
    TABLE scale (round-3: the map compiler runs the same group
    predicates as the struct path — _compile_dict:520-571 runs group
    checks at every mapping level, before mapping validation)."""
    import voluptuous_spark as vs

    sch = vs.Schema({"m": {
        vs.Exclusive("a", "g"): int,
        vs.Exclusive("b", "g"): int,
        vs.Inclusive("x", "i"): int,
        vs.Inclusive("y", "i"): int,
    }}, extra=vs.ALLOW_EXTRA)
    df = spark.createDataFrame(
        [
            (1, {"a": 1}),              # ok
            (2, {"a": 1, "b": 2}),      # exclusive fires
            (3, {"x": 1}),              # inclusive fires (y missing)
            (4, {"x": 1, "y": 2}),      # ok
            (5, {"a": 1, "b": 2, "x": 9}),  # exclusive wins, incl hidden
        ],
        "id int, m map<string,bigint>",
    )
    res = sch.validate(df, id_cols=["id"])
    rows = sorted(
        (r.id, list(r.path), r.message, r.error_type)
        for r in res.violations.collect()
    )
    assert rows == [
        (2, ["m", "<g>"],
         "two or more values in the same group of exclusion 'g'",
         "ExclusiveInvalid"),
        (3, ["m", "<i>"],
         "some but not all values in the same group of inclusion 'i'",
         "InclusiveInvalid"),
        (5, ["m", "<g>"],
         "two or more values in the same group of exclusion 'g'",
         "ExclusiveInvalid"),
    ]
    assert sorted(r.id for r in res.valid.select("id").collect()) == [1, 4]


def test_maptype_table_group_suppresses_entry_errors(spark):
    """A firing group suppresses every other error of that map level
    (the reference raises group errors BEFORE mapping validation)."""
    import voluptuous_spark as vs

    sch = vs.Schema({"m": {
        vs.Exclusive("a", "g"): vs.Range(min=100),
        vs.Exclusive("b", "g"): int,
    }}, extra=vs.ALLOW_EXTRA)
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (2, {"a": 1})],
        "id int, m map<string,bigint>",
    )
    res = sch.validate(df, id_cols=["id"])
    rows = sorted(
        (r.id, r.error_type) for r in res.violations.collect()
    )
    # row 1: ONLY the group error (the a<100 Range error is suppressed);
    # row 2: no group fire -> the Range error surfaces
    assert rows == [(1, "ExclusiveInvalid"), (2, "RangeInvalid")]
