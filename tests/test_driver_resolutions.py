"""Single-document driver resolutions: values a typed one-row DataFrame
cannot carry faithfully are resolved driver-side with the reference's
exact semantics (schema._resolve_driver_values):

- EXPLICIT None values — validator(None) matrix (dsl.none_verdict),
  probed case-by-case against reference validators.py/util.py.
- MIXED-type sequences — element-wise rides replicating
  _compile_sequence (schema_builder.py:578-632), _compile_set (:665-703),
  ExactSequence (validators.py:920-956), Unordered greedy
  (validators.py:1035-1113).
- Python CLASSES as data values — In/NotIn membership driver-side
  (validators.py:842-846, 874-878).
- Root NON-mapping schemas over dict documents — Equal/Literal
  deep-compare, Msg/All/Schema re-entry (_compile_scalar,
  schema_builder.py:770-818).
- Coerce(Enum) at the root yields the Enum MEMBER (validators.py:151).

These freeze the behaviors independently of the reference checkout (the
reference-corpus suites re-verify them against the reference when it is
available)."""

import enum

import pytest

import voluptuous_spark as vs
from voluptuous_spark import exceptions as er


def _err(fn, *args):
    with pytest.raises(er.MultipleInvalid) as ctx:
        fn(*args)
    return ctx.value.errors


# ---------------------------------------------------------------------------
# explicit None values


def test_none_scalar_validators(spark):
    errs = _err(vs.Schema({"email": vs.Email()}), {"email": None})
    assert str(errs[0]) == (
        "expected an email address for dictionary value @ data['email']"
    )
    assert isinstance(errs[0], er.EmailInvalid)

    errs = _err(vs.Schema({"url": vs.Url()}), {"url": None})
    assert errs[0].msg == "expected a URL"

    errs = _err(vs.Schema({"x": int}), {"x": None})
    assert errs[0].msg == "expected int"
    assert isinstance(errs[0], er.TypeInvalid)

    errs = _err(vs.Schema({"x": vs.Coerce(int)}), {"x": None})
    assert errs[0].msg == "expected int"

    errs = _err(vs.Schema({"x": vs.Range(min=1)}), {"x": None})
    assert errs[0].msg == (
        "invalid value or type (must have a partial ordering)"
    )


def test_none_accepting_validators(spark):
    s = vs.Schema({"x": vs.Maybe(int)})
    assert s({"x": None}) == {"x": None}
    s = vs.Schema({"x": vs.Boolean()})
    assert s({"x": None}) == {"x": False}
    s = vs.Schema({"x": vs.Lower})
    assert s({"x": None}) == {"x": "none"}
    s = vs.Schema({"x": vs.DefaultTo(7)})
    assert s({"x": None}) == {"x": 7}
    s = vs.Schema({"x": vs.Equal(None)})
    assert s({"x": None}) == {"x": None}
    s = vs.Schema({"x": vs.In(["a", None])})
    assert s({"x": None}) == {"x": None}
    # NotIn passes None when None is not a member (validators.py:874-878)
    s = vs.Schema({"x": vs.NotIn(["a", "b"])})
    assert s({"x": None}) == {"x": None}


def test_none_required_key_validates_value(spark):
    # a PRESENT-with-None required key is a VALUE error, not a missing key
    errs = _err(
        vs.Schema({vs.Required("x"): int}), {"x": None}
    )
    assert errs[0].msg == "expected int"
    assert not any(
        isinstance(e, er.RequiredFieldInvalid) for e in errs
    )


def test_none_accept_under_required_key(spark):
    # fuzz find: an ACCEPT resolution under a Required key — the ride
    # flags the placeholder row failed (required probe), but the merge is
    # the authority and the transformed output must still come back
    s = vs.Schema({
        "k0": float,
        vs.Required("k1", msg="need k1"): vs.NotIn(["zebra"]),
    })
    assert s({"k0": 0.5, "k1": None}) == {"k0": 0.5, "k1": None}
    s = vs.Schema({vs.Required("x"): vs.Maybe(int)})
    assert s({"x": None}) == {"x": None}


def test_someof_none_pathless_and_boundary(spark):
    # SomeOf raises PATH-LESS (validators.py:1255-1262): flat and
    # literal-dict-nested errors render with 'for dictionary value' and
    # no trailing path; inside a Schema-INSTANCE value the error attaches
    # at the boundary key and the message embeds inner-relative paths
    errs = _err(
        vs.Schema({"x": vs.SomeOf(validators=[vs.Range(2, 9)],
                                  min_valid=1)}),
        {"x": None},
    )
    assert str(errs[0]) == (
        "invalid value or type (must have a partial ordering) @ data['x'] "
        "for dictionary value"
    )
    assert errs[0].path == []
    inner = vs.Schema(
        {"n0": float, "n1": vs.SomeOf(
            validators=[vs.Clamp(0, 9), vs.Range(2, 9)], min_valid=2)},
        required=True,
    )
    errs = _err(
        vs.Schema({vs.Required("k0"): inner}),
        {"k0": {"n0": 1.0, "n1": None}},
    )
    assert errs[0].path == ["k0"]
    assert "@ data['n1']" in errs[0].msg


def test_group_level_still_recurses_nested_dicts(spark):
    # fuzz find: Exclusive/Inclusive at one level only freezes THAT
    # level's keys; None values inside nested dict values still resolve
    errs = _err(
        vs.Schema({
            "k1": {"n0": vs.Equal(2.5)},
            vs.Exclusive("g0", "grp"): vs.In(["no"]),
            vs.Exclusive("g1", "grp"): vs.In(["1"]),
        }, extra=vs.ALLOW_EXTRA),
        {"k1": {"n0": None}, "g0": "no"},
    )
    assert [str(e) for e in errs] == [
        "Values are not equal: value:None != target:2.5 "
        "for dictionary value @ data['k1']['n0']"
    ]


def test_group_violation_suppresses_resolutions(spark):
    # reference group checks run BEFORE value validation and raise
    # immediately (schema_builder.py:536-571): a nested None resolution
    # must not add errors alongside the group error
    errs = _err(
        vs.Schema({
            "k2": {"n1": vs.Length(1, 2)},
            vs.Exclusive("g0", "grp"): vs.In(["ab"]),
            vs.Exclusive("g1", "grp"): vs.In([3]),
        }),
        {"k2": {"n1": None}, "g0": "ab", "g1": 3},
    )
    assert len(errs) == 1
    assert "group of exclusion" in errs[0].msg


def test_extra_in_sequence_alternative(spark):
    # Extra inside a sequence is the identity catch-all
    # (reference Remove docstring, schema_builder.py:1227-1229)
    s = vs.Schema([int, vs.Remove(float), vs.Extra])
    assert s([1, 2, 3, 4.0, 5, 6.0, "7"]) == [1, 2, 3, 5, "7"]


def test_merged_error_order_follows_data(spark):
    # reference accumulates per-key errors in DATA-key iteration order
    errs = _err(
        vs.Schema({"a": int, "b": str, "c": float}),
        {"c": None, "b": 2, "a": None},
    )
    assert [e.path for e in errs] == [["c"], ["b"], ["a"]]


def test_none_extra_policies(spark):
    base = {"x": 1, "y": None}
    assert vs.Schema({"x": int}, extra=vs.ALLOW_EXTRA)(base) == {
        "x": 1, "y": None,
    }
    assert vs.Schema({"x": int}, extra=vs.REMOVE_EXTRA)(base) == {"x": 1}
    errs = _err(vs.Schema({"x": int}), base)
    assert str(errs[0]) == "extra keys not allowed @ data['y']"


def test_none_nested_and_groups_untouched(spark):
    errs = _err(vs.Schema({"a": {"b": int}}), {"a": {"b": None}})
    assert errs[0].path == ["a", "b"]
    # presence-counting group levels keep the NULL-is-absent rule: the
    # None value is NOT validated (the reference would raise TypeInvalid
    # here) and passes through — the documented divergence for exactly
    # these levels
    s = vs.Schema({
        vs.Exclusive("a", "g"): int, vs.Exclusive("b", "g"): int,
    })
    assert s({"a": None, "b": 1}) == {"a": None, "b": 1}


def test_none_at_root(spark):
    errs = _err(vs.Schema(vs.Email()), None)
    assert errs[0].msg == "expected an email address"
    assert vs.Schema(vs.Maybe(int))(None) is None
    errs = _err(vs.Schema(5), None)
    assert errs[0].msg == "not a valid value"


# ---------------------------------------------------------------------------
# mixed-type sequences


def test_mixed_sequence_root(spark):
    s = vs.Schema(["one", "two", int])
    assert s(["one", 1]) == ["one", 1]
    errs = _err(s, [3.5])
    assert str(errs[0]) == "expected int @ data[0]"


def test_mixed_sequence_remove(spark):
    s = vs.Schema([vs.Remove(1), int])
    assert s([1, 2, 3, 4, 1, 5, 6, 1, 1, 1]) == [2, 3, 4, 5, 6]
    s = vs.Schema([1.0, vs.Remove(float), int])
    assert s([1, 2, 1.0, 2.0, 3.0, 4]) == [1, 2, 1.0, 4]


def test_mixed_sequence_dict_value_path(spark):
    errs = _err(
        vs.Schema({"string_key": [int]}),
        {"string_key": [123, "should be int"]},
    )
    assert errs[0].path == ["string_key", 1]
    assert errs[0].msg == "expected int"
    errs = _err(
        vs.Schema({"string_key": (int,)}),
        {"string_key": (123, "should be int")},
    )
    assert errs[0].path == ["string_key", 1]


def test_mixed_set_schema(spark):
    s = vs.Schema({int, str})
    assert s({42, "abc"}) == {42, "abc"}
    errs = _err(s, {None})
    assert errs[0].msg == "invalid value in set"
    fs = vs.Schema(frozenset([int, str]))
    assert fs(frozenset([42, "abc"])) == frozenset([42, "abc"])


def test_mixed_exact_sequence(spark):
    s = vs.Schema(vs.ExactSequence([str, int, list, list]))
    assert s(["hourly_report", 10, [], []]) == ["hourly_report", 10, [], []]
    assert s(("hourly_report", 10, [], [])) == ("hourly_report", 10, [], [])


def test_mixed_unordered_greedy(spark):
    s = vs.Schema(vs.Unordered([int, str]))
    assert s([1, "2"]) == [1, "2"]
    assert s(["1", 2]) == ["1", 2]
    # greedy first-consumption: int eats the 3, literal 3 starves
    errs = _err(vs.Schema(vs.Unordered([int, 3])), [3, 2])
    assert "Element #1 (2) is not valid" in errs[0].msg
    assert vs.Schema(vs.Unordered([3, int]))([3, 2]) == [3, 2]


def test_mixed_literal_dicts(spark):
    s = vs.Schema([vs.Literal({"a": 1}), vs.Literal({"b": 1})])
    assert s([{"a": 1}, {"b": 1}]) == [{"a": 1}, {"b": 1}]
    errs = _err(s, [{"c": 1}])
    assert str(errs[0]) == "{'c': 1} not match for {'b': 1} @ data[0]"
    assert isinstance(errs[0], er.LiteralInvalid)


# ---------------------------------------------------------------------------
# classes as data values


def test_class_value_membership(spark):
    s = vs.Schema({"type": vs.In((int, str, float))})
    assert s({"type": float}) == {"type": float}
    errs = _err(s, {"type": dict})
    assert str(errs[0]) == (
        "value must be one of [<class 'float'>, <class 'int'>, "
        "<class 'str'>] for dictionary value @ data['type']"
    )
    s = vs.Schema({"type": vs.NotIn((int, str, float))})
    assert s({"type": 42}) == {"type": 42}
    errs = _err(s, {"type": str})
    assert "value must not be one of" in errs[0].msg


# ---------------------------------------------------------------------------
# root non-mapping schemas over dict documents


def test_validator_over_dict_document(spark):
    assert vs.Schema(vs.Equal({"a": 1}))({"a": 1}) == {"a": 1}
    errs = _err(vs.Schema(vs.Equal({"a": 1})), {"b": 2})
    assert errs[0].msg == (
        "Values are not equal: value:{'b': 2} != target:{'a': 1}"
    )
    assert vs.Schema(vs.Literal({"a": 1}))({"a": 1}) == {"a": 1}
    errs = _err(vs.Schema(vs.Literal({"a": 1})), {"b": 1})
    assert errs[0].msg == "{'b': 1} not match for {'a': 1}"
    assert vs.Schema(vs.All({"a": int}))({"a": 1}) == {"a": 1}
    assert vs.Schema(vs.Msg({"a": int}, "custom"))({"a": 1}) == {"a": 1}
    errs = _err(vs.Schema(vs.Msg({"a": int}, "custom")), {"a": "x"})
    assert errs[0].msg == "custom"
    # depth>1 passes through the Msg override (schema_builder.py:946-949)
    errs = _err(
        vs.Schema(vs.Msg({"a": {"b": int}}, "custom")), {"a": {"b": "x"}}
    )
    assert errs[0].path == ["a", "b"]
    assert vs.Schema(vs.Schema({"a": int}))({"a": 1}) == {"a": 1}


# ---------------------------------------------------------------------------
# driver-side mapping (non-representable dict documents)


def test_mixed_key_documents(spark):
    s = vs.Schema({"a": int, 1: str})
    assert s({"a": 5, 1: "x"}) == {"a": 5, 1: "x"}
    errs = _err(s, {"a": 5, 1: 2})
    assert str(errs[0]) == "expected str for dictionary value @ data[1]"
    # extra policies over mixed-key docs
    assert vs.Schema({"a": int}, extra=vs.ALLOW_EXTRA)(
        {"a": 5, 2: "x"}) == {"a": 5, 2: "x"}
    assert vs.Schema({"a": int}, extra=vs.REMOVE_EXTRA)(
        {"a": 5, 2: "x"}) == {"a": 5}
    errs = _err(vs.Schema({"a": int}), {"a": 5, 2: "x"})
    assert str(errs[0]) == "extra keys not allowed @ data[2]"
    # Remove wildcard claims int keys
    assert vs.Schema({vs.Remove(int): str, "a": int})(
        {"a": 5, 2: "x", 3: "y"}) == {"a": 5}
    # two wildcards route by key type
    s2 = vs.Schema({str: int, int: str})
    assert s2({"a": 1, 2: "x"}) == {"a": 1, 2: "x"}
    errs = _err(s2, {"a": "bad", 2: 3})
    assert sorted(str(e) for e in errs) == [
        "expected int for dictionary value @ data['a']",
        "expected str for dictionary value @ data[2]",
    ]


def test_tuple_and_object_keys(spark):
    s = vs.Schema({("fancy", "key"): int})
    assert s({("fancy", "key"): 5}) == {("fancy", "key"): 5}
    errs = _err(s, {("fancy", "key"): "bad"})
    assert errs[0].path == [("fancy", "key")]

    class HKey:
        def __hash__(self):
            return 1337

    h = HKey()
    s2 = vs.Schema({HKey: [int]})
    errs = _err(s2, {h: [0, 1, "bad"]})
    assert errs[0].path == [h, 2]


def test_remove_claimed_dict_with_inner_none(spark):
    # fuzz find: a Remove-claimed dict VALUE containing an explicit None
    # must decide match-or-fall-through driver-side — the ride would
    # read the None as absent and wrongly let Remove claim the key
    s = vs.Schema({
        "k1": float,
        vs.Remove("k2"): {"n0": vs.All(vs.Clamp(-1, 0), vs.Equal(5))},
    })
    errs = _err(s, {"k2": {"n0": None}})
    assert [str(e) for e in errs] == ["extra keys not allowed @ data['k2']"]
    s2 = vs.Schema({"a": int, vs.Remove("k"): {"n": vs.Maybe(int)}})
    assert s2({"a": 1, "k": {"n": None}}) == {"a": 1}


def test_non_str_key_default_injection(spark):
    s = vs.Schema({"a": int, vs.Optional(1, default="d"): str})
    assert s({"a": 5}) == {"a": 5, 1: "d"}
    assert s({"a": 5, 1: "x"}) == {"a": 5, 1: "x"}
    errs = _err(s, {"a": 5, 1: 7})
    assert str(errs[0]) == "expected str for dictionary value @ data[1]"


def test_complex_required_mixed_key_types(spark):
    s = vs.Schema({vs.Required(vs.Any("string_key", 123, 45.6)): str,
                   "other": int})
    assert s({123: "value", "other": 1}) == {123: "value", "other": 1}
    assert s({45.6: "value", "other": 1}) == {45.6: "value", "other": 1}
    errs = _err(s, {"other": 1})
    assert "at least one of ['string_key', 123, 45.6] is required" in str(
        errs[0])


# ---------------------------------------------------------------------------
# Coerce(Enum) member at the root


def test_coerce_enum_member(spark):
    class Choice(enum.Enum):
        Easy = 1
        Medium = 2
        Hard = 3

    class StringChoice(str, enum.Enum):
        Easy = "easy"
        Medium = "medium"
        Hard = "hard"

    assert vs.Schema(vs.Coerce(Choice))(1) is Choice.Easy
    assert vs.Schema(vs.Coerce(StringChoice))("easy") is StringChoice.Easy
    errs = _err(vs.Schema(vs.Coerce(Choice)), 4)
    assert errs[0].msg == "expected Choice or one of 1, 2, 3"
    errs = _err(vs.Schema(vs.Coerce(StringChoice)), "hello")
    assert errs[0].msg == (
        "expected StringChoice or one of 'easy', 'medium', 'hard'"
    )


# ---------------------------------------------------------------------------
# driver-side group enforcement + Remove reclaim (round-3 ADVICE fixes)


def test_driver_mapping_exclusive_groups(spark):
    # int keys route through _driver_validate_mapping / the MapType ride;
    # Exclusive groups must still fire BEFORE value validation
    # (reference _compile_dict, schema_builder.py:520-553)
    errs = _err(
        vs.Schema({vs.Exclusive(1, "g"): int, vs.Exclusive(2, "g"): str}),
        {1: 10, 2: "x"},
    )
    assert len(errs) == 1
    assert isinstance(errs[0], er.ExclusiveInvalid)
    assert str(errs[0]) == (
        "two or more values in the same group of exclusion 'g' @ data[<g>]"
    )


def test_driver_mapping_inclusive_groups(spark):
    errs = _err(
        vs.Schema({vs.Inclusive(1, "g"): int, vs.Inclusive(2, "g"): str}),
        {1: 10},
    )
    assert len(errs) == 1
    assert isinstance(errs[0], er.InclusiveInvalid)
    assert str(errs[0]) == (
        "some but not all values in the same group of inclusion 'g' "
        "@ data[<g>]"
    )
    # both present -> valid
    assert vs.Schema(
        {vs.Inclusive(1, "g"): int, vs.Inclusive(2, "g"): str}
    )({1: 10, 2: "x"}) == {1: 10, 2: "x"}


def test_exclusive_msg_from_triggering_member(spark):
    # the reference takes the message from the SECOND present member in
    # group order (schema_builder.py:536-548), not the first with a msg
    errs = _err(
        vs.Schema({
            vs.Exclusive("a", "g", msg="custom!"): int,
            vs.Exclusive("b", "g"): int,
        }),
        {"a": 1, "b": 2},
    )
    assert errs[0].msg == (
        "two or more values in the same group of exclusion 'g'"
    )
    errs = _err(
        vs.Schema({
            vs.Exclusive("a", "g"): int,
            vs.Exclusive("b", "g", msg="custom!"): int,
        }),
        {"a": 1, "b": 2},
    )
    assert errs[0].msg == "custom!"


def test_remove_then_later_candidate_reclaims(spark):
    # reference schema_builder.py:355-366: a successful Remove match
    # marks the key for removal but KEEPS scanning; a later candidate
    # that validates reclaims (and keeps) the key
    s = vs.Schema({
        vs.Optional(1, default=9): int,
        vs.Remove(str): int,
        str: vs.Coerce(str),
    })
    assert s({"a": 5}) == {"a": "5", 1: 9}
    # no later candidate reclaims -> dropped
    assert vs.Schema(
        {vs.Optional(1, default=9): int, vs.Remove(str): int}
    )({"a": 5}) == {1: 9}
    # later candidate ERRORS while removal pending -> silent, dropped
    assert vs.Schema({vs.Remove(str): int, str: bool})({"a": 5}) == {}


def test_nested_group_violation_suppresses_deep_resolutions(spark):
    # fuzz seed 9501: a NESTED mapping level whose Inclusive group fires
    # raises BEFORE validating that level (schema_builder.py:536-571) —
    # a driver-resolved None deeper in the same subtree must not add its
    # own error next to the group error
    errs = _err(
        vs.Schema({"k0": {
            vs.Inclusive("h0", "g"): int,
            vs.Inclusive("h1", "g"): int,
            "n0": {"m": vs.Coerce(int)},
        }}),
        {"k0": {"h0": 1, "n0": {"m": None}}},
    )
    assert [str(e) for e in errs] == [
        "some but not all values in the same group of inclusion 'g' "
        "@ data['k0'][<g>]"
    ]
    # sibling branches OUTSIDE the firing level still accumulate
    errs = _err(
        vs.Schema({
            "k0": {
                vs.Inclusive("h0", "g"): int,
                vs.Inclusive("h1", "g"): int,
            },
            "kc": {"m": vs.Coerce(int)},
        }),
        {"k0": {"h0": 1}, "kc": {"m": None}},
    )
    assert sorted(str(e) for e in errs) == [
        "expected int for dictionary value @ data['kc']['m']",
        "some but not all values in the same group of inclusion 'g' "
        "@ data['k0'][<g>]",
    ]
