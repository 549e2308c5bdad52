"""Python-API ergonomics parity: Marker ordering/equality/hash, Schema
equality, validator ``__repr__`` — checked differentially against the
reference library where formats overlap (tests.py:404-574, 1132-1147,
1264-1279, 1497-1506).

These behaviors matter for a user switching over: schema dicts keyed by
markers must answer ``.get('name')``, marker lists must sort, and reprs
must round-trip the reference's documented formats.
"""

from __future__ import annotations

import copy
import sys

import pytest

import voluptuous_spark as vs
from voluptuous_spark import (
    All,
    Any,
    Clamp,
    Coerce,
    Contains,
    Date,
    Datetime,
    Equal,
    Exclusive,
    In,
    Inclusive,
    Length,
    Marker,
    Match,
    Maybe,
    NotIn,
    Number,
    Optional,
    Range,
    Remove,
    Replace,
    Required,
    Schema,
    SomeOf,
    Unique,
    Unordered,
)

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    try:
        import voluptuous as v
    except ImportError:  # pragma: no cover
        pytest.skip("reference checkout not available")
    return v


# -- sorting (tests.py:419-426) ---------------------------------------------


def test_marker_sorting():
    foo = Required("foo")
    bar = Required("bar")
    assert sorted([foo, bar]) == [bar, foo]


def test_marker_lt_str():
    # tests.py:1505-1506
    assert Optional("Classification") < "Name"


# -- equality (tests.py:493-552) --------------------------------------------


def test_schema_equality():
    dict_a = {"foo": 1, "bar": 2, "baz": 3}
    dict_b = {"baz": 3, "bar": 2, "foo": 1}
    assert Schema(dict_a) == Schema(dict_b)
    assert not Schema(dict_a) != Schema(dict_b)


def test_schema_equality_negative():
    assert not Schema({"foo": int}) == "{'foo': int}"
    assert Schema({"foo": int}) != "{'foo': int}"
    assert Schema({"foo": int}) != Schema({"foo": str})


# -- marker hash/equality (tests.py:1132-1147) ------------------------------


def test_marker_hashable():
    definition = {
        Required("x"): int,
        Optional("y"): float,
        Remove("j"): int,
        Remove(int): str,
        int: int,
    }
    assert definition.get("x") == int
    assert definition.get("y") == float
    assert Required("x") == Required("x")
    assert Required("x") != Required("y")
    assert hash(Required("x").schema) == hash(Required("x"))
    # Remove markers hash by identity, so lookup by key misses
    assert definition.get("j") is None


def test_copy_dict_undefined():
    # deepcopied Undefined defaults must not break validation
    # (tests.py:404-417)
    fields = {Required("foo"): int}
    copied = copy.deepcopy(fields)
    schema = Schema(copied)
    with pytest.raises(Exception):
        schema({"foo": "bar"})


# -- description (tests.py:1264-1279) ---------------------------------------


def test_description():
    assert Marker("k", description="Hello").description == "Hello"
    assert Optional("key", description="Hello").description == "Hello"
    assert Exclusive("alpha", "angles",
                     description="Hello").description == "Hello"
    assert Inclusive("alpha", "angles",
                     description="Hello").description == "Hello"
    assert Required("key", description="Hello").description == "Hello"


# -- SomeOf bounds assertion (tests.py:1497-1503) ----------------------------


def test_someof_on_bounds_assertion():
    with pytest.raises(AssertionError) as exc:
        SomeOf(validators=[])
    assert ('when using "SomeOf" you should specify at least one of '
            "min_valid and max_valid") in str(exc.value)


# -- __repr__ parity (tests.py:554-574) --------------------------------------


def test_repr_golden():
    match = Match("a pattern", msg="message")
    replace = Replace("you", "I", msg="you and I")
    range_ = Range(min=0, max=42, min_included=False, max_included=False,
                   msg="number not in range")
    coerce_ = Coerce(int, msg="moo")
    all_ = All("10", Coerce(int), msg="all msg")
    maybe_int = Maybe(int)

    assert repr(match) == "Match('a pattern', msg='message')"
    assert repr(replace) == "Replace('you', 'I', msg='you and I')"
    assert repr(range_) == (
        "Range(min=0, max=42, min_included=False, max_included=False, "
        "msg='number not in range')"
    )
    assert repr(coerce_) == "Coerce(int, msg='moo')"
    assert repr(all_) == "All('10', Coerce(int, msg=None), msg='all msg')"
    assert repr(maybe_int) == "Any(None, %s, msg=None)" % str(int)


DIFFERENTIAL_REPRS = [
    ("Match", ("pat.*tern",), {"msg": None}),
    ("Replace", ("a", "b"), {}),
    ("Range", (), {"min": 1, "max": 2}),
    ("Clamp", (), {"min": 0, "max": 5}),
    ("Length", (), {"min": 2, "max": 9}),
    ("Datetime", (), {}),
    ("Date", (), {"format": "%d/%m/%Y"}),
    ("In", ([1, 2, 3],), {}),
    ("NotIn", (["a", "b"],), {}),
    ("Contains", (7,), {}),
    ("ExactSequence", ([int, str],), {}),
    ("Unique", (), {}),
    ("Equal", (42,), {}),
    ("Unordered", ([1, 2],), {}),
    ("Number", (), {"precision": 6, "scale": 2}),
    ("SomeOf", (), {"validators": [int, str], "min_valid": 1}),
    ("Coerce", (float,), {}),
    ("Maybe", (int,), {}),
    ("All", (int, float), {"msg": "m"}),
    ("Any", (int, str), {}),
]


@pytest.mark.parametrize("name,args,kwargs", DIFFERENTIAL_REPRS,
                         ids=[d[0] for d in DIFFERENTIAL_REPRS])
def test_repr_differential(ref, name, args, kwargs):
    ours = repr(getattr(vs, name)(*args, **kwargs))
    theirs = repr(getattr(ref, name)(*args, **kwargs))
    assert ours == theirs


# -- Schema.infer from concrete data (tests.py:1150-1199) --------------------


def test_schema_infer():
    schema = Schema.infer(
        {"str": "foo", "bool": True, "int": 42, "float": 3.14})
    assert schema == Schema({
        Required("str"): str,
        Required("bool"): bool,
        Required("int"): int,
        Required("float"): float,
    })


def test_schema_infer_dict():
    schema = Schema.infer({"a": {"b": {"c": "foo"}}})
    assert schema == Schema(
        {Required("a"): {Required("b"): {Required("c"): str}}})


def test_schema_infer_list():
    schema = Schema.infer({"list": ["foo", True, 42, 3.14]})
    assert schema == Schema({Required("list"): [str, bool, int, float]})


def test_schema_infer_accepts_kwargs(spark):
    schema = Schema.infer({"str": "foo", "bool": True},
                          required=False, extra=True)
    # subset acceptable thanks to required=False
    schema({"bool": False})
    # keys in schema still match required types
    with pytest.raises(Exception):
        schema({"str": 42})
    # extra fields acceptable thanks to extra=True (== ALLOW_EXTRA)
    schema({"str": "bar", "int": 42})
