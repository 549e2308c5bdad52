"""API-parity surface: exceptions hierarchy, raises, humanize bridge,
Object/Self nested schemas, truth/message decorators, Coerce(Enum),
IsFile/IsDir/PathExists, validate decorator, default_factory.

Each test cites the reference behavior it mirrors
(/root/reference/voluptuous/...).
"""

import enum

import pytest

import voluptuous_spark as vs
from voluptuous_spark import (
    All,
    Coerce,
    FileInvalid,
    Invalid,
    IsDir,
    IsFile,
    Length,
    MultipleInvalid,
    Object,
    PathExists,
    Range,
    Required,
    Schema,
    SchemaError,
    Self,
    TypeInvalid,
    message,
    raises,
    truth,
    validate,
)
from voluptuous_spark.dsl import ALLOW_EXTRA
from voluptuous_spark.exceptions import (
    humanize_error_rows,
    invalid_from_row,
    raise_if_invalid,
)


# -- exceptions (error.py:15-87) --------------------------------------------


def test_invalid_str_matches_reference():
    e = Invalid("not a valid value", path=["a", 0])
    assert str(e) == "not a valid value @ data['a'][0]"
    e2 = Invalid("bad", error_type="value")
    assert str(e2) == "bad for value"


def test_invalid_prepend():
    e = Invalid("m", path=["b"])
    e.prepend(["a"])
    assert e.path == ["a", "b"]


def test_multiple_invalid_surfaces_first():
    m = MultipleInvalid([Invalid("first", path=["x"]), Invalid("second")])
    assert m.msg == "first"
    assert m.path == ["x"]
    assert str(m) == "first @ data['x']"
    m.add(Invalid("third"))
    assert len(m.errors) == 3


def test_typed_subclass_hierarchy():
    assert issubclass(FileInvalid, Invalid)
    assert issubclass(MultipleInvalid, Invalid)
    with pytest.raises(Invalid):
        raise TypeInvalid("expected int")


def test_raises_context_manager():
    with raises(Invalid, "boom"):
        raise Invalid("boom")
    with pytest.raises(AssertionError):
        with raises(Invalid):
            pass  # nothing raised


# -- DataFrame -> exception bridge ------------------------------------------


def test_raise_if_invalid_and_humanize(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 500)], "clip_id string, dur int"
    )
    s = Schema(
        {Required("clip_id"): str, "dur": Range(min=1, max=100)},
        extra=ALLOW_EXTRA,
    )
    res = s.validate(df, id_cols=["clip_id"])
    with pytest.raises(MultipleInvalid) as ei:
        raise_if_invalid(res)
    err = ei.value.errors[0]
    assert err.msg == "value must be at most 100"
    assert err.path == ["dur"]
    assert type(err).__name__ == "RangeInvalid"

    rows = res.violations.collect()
    h = humanize_error_rows(rows)
    # reference-verified: value errors in a dict carry the
    # ' for dictionary value' context in the rendered form
    assert h == (
        "value must be at most 100 for dictionary value @ data['dur']."
        " Got 500"
    )


def test_raise_if_invalid_noop_when_valid(spark):
    df = spark.createDataFrame([("a",)], "clip_id string")
    res = Schema({Required("clip_id"): str}).validate(df)
    raise_if_invalid(res)  # should not raise


def test_invalid_from_row_restores_int_path_components():
    row = {"error_type": "RangeInvalid", "message": "m", "path": ["a", "0"]}
    e = invalid_from_row(row)
    assert str(e) == "m @ data['a'][0]"


# -- Object / Self (schema_builder.py:955-960, 215-216) ---------------------


def test_object_schema_over_struct(spark):
    df = spark.createDataFrame(
        [(1, ("two", "four")), (2, ("three", "four"))],
        "i long, obj struct<one:string, three:string>",
    )
    s = Schema(
        {"obj": Object({"one": "two", "three": "four"})}, extra=ALLOW_EXTRA
    )
    out = s.validate(df, id_cols=["i"])
    viol = {r["i"]: r for r in out.violations.collect()}
    assert 1 not in viol
    assert viol[2]["message"] == "not a valid value"
    assert list(viol[2]["path"]) == ["obj", "one"]


def test_object_type_gate_on_non_struct(spark):
    df = spark.createDataFrame([(1, "scalar")], "i long, obj string")
    s = Schema({"obj": Object({"one": "two"})}, extra=ALLOW_EXTRA)
    rows = s.validate(df, id_cols=["i"]).violations.collect()
    assert rows[0]["error_type"] == "ObjectInvalid"
    assert rows[0]["message"] == "expected an object"


def test_self_recursion_bounded_by_struct_depth(spark):
    # tree: {label: str, child: {label: str, child: null-ish}}
    df = spark.createDataFrame(
        [
            (1, "ok", ("ok", ("ok",))),
            (2, "ok", (None, None)),  # nested label missing
        ],
        "i long, label string, "
        "child struct<label:string, child:struct<label:string>>",
    )
    # child re-enters the root schema; unrolls to the struct's finite depth
    s = Schema(
        {Required("label"): str, "child": Self}, extra=ALLOW_EXTRA
    )
    # validate the nested struct column via the root schema shape
    out = s.validate(df, id_cols=["i"])
    viol = {r["i"]: r for r in out.violations.collect()}
    assert 1 not in viol
    assert list(viol[2]["path"]) == ["child", "label"]
    assert viol[2]["error_type"] == "RequiredFieldInvalid"


# -- truth / message / CallableValidator ------------------------------------


def test_truth_decorator(validate_one):
    is_even = truth(lambda v: v % 2 == 0)
    out = validate_one(is_even, [2, 3], "long")
    assert out[0] == ("ok", 2)
    assert out[1][0] == "err"
    assert out[1][1][0][0] == "not a valid value"


def test_message_decorator(validate_one):
    @message("not an integer")
    def isint(v):
        int(v)  # ValueError on non-integer strings
        return v

    out = validate_one(isint(), ["12", "a"], "string")
    assert out[0] == ("ok", "12")
    assert out[1][1][0][0] == "not an integer"
    # per-use override (schema_builder.py:1267-1269)
    out = validate_one(isint("bad"), ["a"], "string")
    assert out[0][1][0][0] == "bad"


def test_message_rejects_non_invalid_cls():
    with pytest.raises(SchemaError):
        message("m", cls=ValueError)


def test_coerce_enum(validate_one):
    class Color(enum.Enum):
        RED = "red"
        BLUE = "blue"

    out = validate_one(Coerce(Color), ["red", "green"], "string")
    assert out[0] == ("ok", "red")
    msg = out[1][1][0][0]
    assert msg == "expected Color or one of 'red', 'blue'"
    assert out[1][1][0][1] == "CoerceInvalid"


# -- IsFile / IsDir / PathExists (validators.py:558-619) --------------------


def test_path_validators(validate_one):
    import voluptuous_spark.dsl as dslmod

    f = dslmod.__file__
    out = validate_one(IsFile(), [f, "/nonexistent_xyz", None], "string")
    assert out[0] == ("ok", f)
    assert out[1][1][0][:2] == ("Not a file", "FileInvalid")
    assert out[2][0] == "ok"  # NULL = absent key, not validated

    out = validate_one(IsDir(), ["/", f], "string")
    assert out[0] == ("ok", "/")
    assert out[1][1][0][0] == "Not a directory"

    out = validate_one(PathExists(), [f, "/nonexistent_xyz"], "string")
    assert out[0] == ("ok", f)
    assert out[1][1][0][:2] == ("path does not exist", "PathInvalid")


# -- validate decorator (schema_builder.py:1329-1376) -----------------------


def test_validate_decorator_static_bind(spark):
    s = Schema({Required("clip_id"): str, "dur": Range(min=0)})

    @validate(df=s)
    def process(df):
        return df

    good = spark.createDataFrame([("a", 1)], "clip_id string, dur long")
    process(good)  # binds cleanly

    bad = spark.createDataFrame([(1,)], "dur long")
    with pytest.raises(Invalid) as ei:
        process(bad)
    assert ei.value.path == ["df", "clip_id"]


def test_validate_decorator_scalar_types():
    @validate(int, __return__=int)
    def double(n):
        return n * 2

    assert double(2) == 4
    with pytest.raises(TypeInvalid):
        double("x")


def test_validate_decorator_per_value(spark):
    """Non-DataFrame args with validator specs run the reference's
    per-value path (schema_builder.py:1366-1372): the function receives
    the TRANSFORMED argument, and the return value is validated too."""

    @validate(n=vs.All(Coerce(int), Range(min=1, max=10)))
    def triple(n):
        assert isinstance(n, int)  # Coerce output reaches the body
        return n * 3

    assert triple("4") == 12
    with pytest.raises(MultipleInvalid) as ei:
        triple(50)
    assert "data['n']" in str(ei.value)


def test_validate_decorator_dict_arg(spark):
    @validate(doc=Schema({Required("k"): vs.Coerce(int)}))
    def get_k(doc):
        return doc["k"]

    assert get_k({"k": "7"}) == 7


# -- default_factory / misc aliases -----------------------------------------


def test_default_factory():
    f = vs.default_factory(42)
    assert callable(f) and f() == 42
    g = vs.default_factory(lambda: 7)
    assert g() == 7


def test_optional_callable_default(spark):
    df = spark.createDataFrame([(1, None)], "i long, tag string")
    s = Schema(
        {vs.Optional("tag", default=lambda: "none"): str}, extra=ALLOW_EXTRA
    )
    row = s.validate(df, id_cols=["i"]).valid.collect()[0]
    assert row["tag"] == "none"


def test_email_regex_exports():
    assert vs.USER_REGEX.match("john.doe")
    assert vs.DOMAIN_REGEX.match("example.com")
    assert not vs.DOMAIN_REGEX.match("nodots")
    assert str(vs.VirtualPathComponent("grp")) == "<grp>"


def test_schema_call_single_document(spark):
    """Reference entry point: schema(data) -> transformed doc or
    MultipleInvalid (schema_builder.py:202-210), driven through the
    DataFrame engine."""
    from voluptuous_spark import Coerce, In, Optional

    s = Schema(
        {
            Required("clip_id"): str,
            "sr_hz": In([8000, 16000]),
            Optional("lang", default="en"): str,
            "n": Coerce(int),
        },
        extra=ALLOW_EXTRA,
    )
    out = s({"clip_id": "c1", "sr_hz": 8000, "n": "42"})
    assert out == {"clip_id": "c1", "sr_hz": 8000, "lang": "en", "n": 42}

    with pytest.raises(MultipleInvalid) as ei:
        s({"clip_id": "c1", "sr_hz": 123, "n": "1"})
    assert str(ei.value) == (
        "value must be one of [8000, 16000] for dictionary value"
        " @ data['sr_hz']"
    )

    # nested dicts become struct columns transparently
    s2 = Schema({"one": {"two": "three"}})
    assert s2({"one": {"two": "three"}}) == {"one": {"two": "three"}}
    with pytest.raises(MultipleInvalid) as ei2:
        s2({"one": {"two": "nine"}})
    assert "@ data['one']['two']" in str(ei2.value)


def test_case_transforms_are_callable_like_reference_functions():
    """The reference exposes case transforms as bare functions
    (util.py:15-62; tests.py:1570-1606): ``Lower(3) == '3'``. The
    classes here are dual-use: called with a value they transform it,
    called with no args they build the Column validator."""
    from voluptuous_spark import Capitalize, Lower, Strip, Title, Upper

    assert Lower(3) == "3"
    assert Lower("3") == "3"
    assert Lower("A") == "a"
    assert Upper(3) == "3"
    assert Upper("a") == "A"
    assert Capitalize("hello world") == "Hello world"
    assert Capitalize(4.30) == "4.3"
    assert Title("hello world") == "Hello World"
    assert Strip("  text  ") == "text"
    assert Strip(3) == "3"
    # zero-arg construction still yields the schema validator object
    from voluptuous_spark.dsl import _Transform

    assert isinstance(Lower(), _Transform)
