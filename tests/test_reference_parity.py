"""Live differential parity vs the reference library.

Each case builds the SAME schema twice — once with this engine's DSL,
once with voluptuous itself (imported read-only from /root/reference) —
and validates the same documents through both, comparing:

- accept vs reject,
- the transformed document on accept (validation is transformation),
- the SET of rendered error strings (``str(Invalid)``) on reject.

This is the strongest form of SURVEY.md §5's "reference pytest suite
translated to DataFrame assertions": the expectation is computed by the
reference itself at test time, so any drift in message/path/semantics
surfaces immediately. Skipped when the reference checkout is absent
(e.g. on a production cluster).

Known documented divergences are excluded by construction:
- a NULL cell means "key absent" here (DataFrames cannot omit a column),
  so documents never carry explicit None values;
- ``Any`` over dict branches is validation-only (identity output), so
  those cases avoid transforming validators inside branches.
"""

from __future__ import annotations

import sys

import pytest

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    try:
        import voluptuous as v
    except ImportError:  # pragma: no cover
        pytest.skip("reference checkout not available")
    return v


import voluptuous_spark as vs  # noqa: E402
from voluptuous_spark import exceptions as vse  # noqa: E402


# case-normalizing transformers are bare FUNCTIONS in the reference
# (util.py:15-62) but zero-arg classes here
_FUNC_STYLE = {"Lower", "Upper", "Capitalize", "Title", "Strip"}


import enum


class _ChoiceEnum(enum.Enum):
    Easy = 1
    Medium = 2
    Hard = 3


def _tag_filter(val, alts):
    """The reference's canonical Union discriminant idiom: keep branches
    whose literal-valued keys all match the value (tests.py:1683-1710
    filters on ``v['type'] == value['type']``)."""
    def ok(a):
        return all(
            val.get(k) == x
            for k, x in a.items()
            if isinstance(x, (str, int, float)) and not isinstance(x, type)
        )
    return [a for a in alts if ok(a)]


def _py_callable(v, kind):
    """Module-aware bare callables ('callables are validators',
    schema_builder.py:800-811): raising Invalid must use the module's
    own class so each engine catches its own exception type."""
    if kind == "is_even":
        def is_even(value):
            if value % 2:
                raise v.Invalid("%i is not even" % value)
            return value
        return is_even
    if kind == "half":
        def half(value):
            if value % 2:
                raise ValueError
            return value // 2
        return half
    if kind == "as_int":
        def as_int(a):
            return int(a)
        return as_int
    if kind == "as_int_msg":
        def as_int_msg(a):
            try:
                return int(a)
            except ValueError:
                raise v.Invalid("expecting a number")
        return as_int_msg
    if kind == "starts_with_dot":
        def starts_with_dot(key):
            if not key.startswith("."):
                raise v.Invalid("Key does not start with .")
            return key
        return starts_with_dot
    if kind == "no_dot":
        def does_not_start_with_dot(key):
            if key.startswith("."):
                raise v.Invalid("Key starts with .")
            return key
        return does_not_start_with_dot
    raise KeyError(kind)


def _mk(v, spec):
    """Build one schema node from a module-agnostic spec tree.

    spec: (name, *args) tuples reference DSL classes by name in either
    module; dicts/lists/scalars pass through recursively.
    ("UnionDisc", b1, b2, ...) builds Union(*branches,
    discriminant=_tag_filter) in both modules; ("PyCallable", kind)
    builds a bare Python callable validator bound to the module.
    """
    import inspect

    if isinstance(spec, tuple) and spec and spec[0] == "KW":
        # ("KW", name, [args...], {kwargs...}) — keyword-only parameters
        # (msg=, cls=, min_valid=...) that the generic positional form
        # below can't reach
        _, name, args, kwargs = spec
        obj = getattr(v, name)
        return obj(*[_mk(v, a) for a in args],
                   **{k: _mk(v, kv) for k, kv in kwargs.items()})
    if isinstance(spec, tuple) and spec and spec[0] == "CLS":
        # ("CLS", name) — resolve a module attribute itself (e.g. an
        # Invalid subclass for Msg(cls=...)) without instantiating it
        return getattr(v, spec[1])
    if isinstance(spec, tuple) and spec and spec[0] == "UnionDisc":
        _, *branches = spec
        return v.Union(*[_mk(v, b) for b in branches],
                       discriminant=_tag_filter)
    if isinstance(spec, tuple) and spec and spec[0] == "PyCallable":
        return _py_callable(v, spec[1])
    if isinstance(spec, tuple) and spec and spec[0] == "SelfRef":
        return v.Self  # the sentinel class itself, never instantiated
    if isinstance(spec, tuple) and spec and spec[0] == "AnyReq":
        # Any(..., required=True): the kwarg threads into dict-branch
        # sub-schema compiles (tests.py:1607-1622)
        _, *branches = spec
        return v.Any(*[_mk(v, b) for b in branches], required=True)
    if isinstance(spec, (set, frozenset)):
        return type(spec)(_mk(v, a) for a in spec)
    if isinstance(spec, tuple) and spec and isinstance(spec[0], str):
        name, *args = spec
        obj = getattr(v, name)
        if name in _FUNC_STYLE and not inspect.isclass(obj):
            return obj  # reference: pass the function itself
        return obj(*[_mk(v, a) for a in args])
    if isinstance(spec, dict):
        return {_mk(v, k): _mk(v, val) for k, val in spec.items()}
    if isinstance(spec, list):
        return [_mk(v, a) for a in spec]
    return spec


# (schema spec, docs...) — every doc is validated through both engines
CASES = [
    # scalar validators
    ({"q": ("Range", 1, 49)}, {"q": 25}, {"q": 0}, {"q": 50}),
    ({"q": ("Range",)}, {"q": float("nan")}),
    ({"s": ("In", ["A", "N", "R"])}, {"s": "A"}, {"s": "X"}),
    ({"s": ("NotIn", ["bad"])}, {"s": "ok"}, {"s": "bad"}),
    ({"t": ("Length", 2, 5)}, {"t": "abc"}, {"t": "a"}, {"t": "abcdef"}),
    ({"t": ("Match", r"^ab")}, {"t": "abc"}, {"t": "zzz"}),
    ({"e": ("Email",)}, {"e": "u@example.com"}, {"e": "nope"}),
    ({"u": ("Url",)}, {"u": "https://x.org/p"}, {"u": "no scheme"}),
    ({"u": ("FqdnUrl",)}, {"u": "https://a.b.c/p"}, {"u": "https://localhost/x"}),
    ({"d": ("Date",)}, {"d": "2024-02-29"}, {"d": "2024-13-01"}),
    (
        {"d": ("Datetime", "%Y-%m-%d %H:%M:%S")},
        {"d": "2024-01-02 03:04:05"},
        {"d": "nope"},
    ),
    ({"b": ("Boolean",)}, {"b": "yes"}, {"b": "off"}, {"b": "maybe"}),
    ({"x": ("IsTrue",)}, {"x": True}, {"x": False}),
    ({"x": ("IsFalse",)}, {"x": False}, {"x": True}),
    ({"x": ("Equal", 7)}, {"x": 7}, {"x": 8}),
    ({"x": ("Literal", "hi")}, {"x": "hi"}, {"x": "no"}),
    ({"x": ("Contains", "a")}, {"x": ["a", "b"]}, {"x": ["b", "c"]}),
    ({"x": ("Unique",)}, {"x": [1, 2, 3]}, {"x": [1, 1, 2]}),
    (
        {"x": ("ExactSequence", [("Range", 0, 5), ("Range", 10, 20)])},
        {"x": [3, 15]},
        {"x": [7, 15]},
    ),
    (
        {"x": ("Unordered", [("Range", 0, 10), ("Range", 2, 10)])},
        {"x": [3.0, 1.0]},  # greedy rejects (perfect matching would pass)
        {"x": [1.0, 3.0]},
        {"x": [11.0, 1.0]},
    ),
    ({"x": ("SomeOf", [("Range", 0, None), ("Range", None, 100)], 2)},
     {"x": 50}),
    # Maybe over composite inners == Any(None, composite): the inner
    # dict/element errors sit deeper than the None branch's and win the
    # deepest-error selection (validators.py:622-635 + 330-336)
    ({"m": ("Maybe", {"x": int})},
     {"m": None}, {"m": {"x": 3}}, {"m": {"x": "bad"}}),
    ({"m": ("Maybe", [int])},
     {"m": None}, {"m": [1, 2]}, {"m": ["x"]}),
    ({"m": ("Maybe", [("Range", 0, 5)])}, {"m": [3, 9]}),
    ({"m": ("KW", "Maybe", [{"x": int}], {"msg": "custom maybe"})},
     {"m": {"x": "bad"}}),
    ({"m": ("KW", "Maybe", [[int]], {"msg": "custom maybe"})},
     {"m": ["x"]}),
    ({"o": {"m": ("Maybe", {"x": int})}}, {"o": {"m": {"x": "bad"}}}),
    ({"o": {"m": ("Maybe", [int])}}, {"o": {"m": ["x"]}}),
    ({("Remove", "r"): ("Maybe", {"x": int}), "a": int},
     {"r": {"x": "bad"}, "a": 1}, {"r": {"x": 2}, "a": 1}),
    # Maybe over a transforming sequence threads the transform
    ({"m": ("Maybe", [("Boolean",)])}, {"m": ["yes", "no"]}),
    # Maybe over a transforming DICT threads the branch's transforms
    # (fuzz seed 249: Coerce+Clamp inside Maybe inside Msg)
    ({"m": ("Maybe", {"x": ("Clamp", 0, 5)})}, {"m": {"x": 9}}),
    ({"k0": ("Msg", {"n0": ("Maybe", {"n0": ("All", ("Coerce", float),
                                             ("Clamp", 0, 49))}),
                     "n1": float}, "fuzz dict message")},
     {"k0": {"n0": {"n0": 50}, "n1": 49.5}}),
    # Any(dict, dict, msg=...) stamps the mapping ctx at the key path
    ({"m": ("KW", "Any", [{"x": int}, {"y": str}], {"msg": "pick one"})},
     {"m": {"x": "bad", "y": 1}}),
    # Any over SEQUENCE branches: element errors carry runtime index
    # paths and win the deepest-error selection; same-depth element
    # errors keep the earliest branch (validators.py:330-336)
    ({"m": ("Any", [int], ("Length", 5, None))}, {"m": ["x"]}, {"m": [1]}),
    ({"m": ("Any", [("Range", 0, 5)], [("Range", 10, 20)])},
     {"m": [7]}, {"m": [3]}, {"m": [15]}),
    ({"m": ("Any", [("Range", 0, 5)], ("Length", 0, 1))}, {"m": [9, 9]}),
    ({"m": ("Any", [int], {"x": int})}, {"m": [1, 2]}),
    ({"o": {"m": ("Any", [("Range", 0, 5)], [("Range", 10, 20)])}},
     {"o": {"m": [7]}}),
    ({("Remove", "r"): ("Any", [int], ("Length", 5, None)), "a": int},
     {"r": ["x"], "a": 1}, {"r": [1], "a": 1}),
    ({"m": ("KW", "Any", [[int], ("Length", 5, None)], {"msg": "no good"})},
     {"m": ["x"]}),
    # Unordered beyond the old n<=4 cap: greedy fold over 6 validators
    (
        {"x": ("Unordered", [("Range", 0, 10), ("Range", 10, 20),
                             ("Range", 20, 30), ("Range", 30, 40),
                             ("Range", 40, 50), ("Range", 50, 60)])},
        {"x": [55.0, 45.0, 35.0, 25.0, 15.0, 5.0]},
        {"x": [5.0, 5.0, 5.0, 25.0, 15.0, 45.0]},  # greedy starves
        {"x": [5.0, 15.0, 25.0, 35.0, 45.0, 99.0]},
    ),
    # Clamp substitutes the BOUND OBJECT (validators.py:740-744): a
    # downstream int/float TYPE check decides per row — the clamped-to-
    # int-bound value IS an int, the in-range float stays float
    # (fuzz seed 537)
    ({"k": ("All", ("Clamp", 2, 49), int)},
     {"k": 0.5}, {"k": 3.5}, {"k": 60.0}),
    ({"k": ("All", ("Clamp", 2, 49), float)}, {"k": 0.5}, {"k": 3.5}),
    ({"k": ("All", ("Clamp", 2, 49), int, ("Range", 0, 10))}, {"k": 0.5}),
    # transformers (validation is transformation)
    ({"t": ("Lower",)}, {"t": "MiXeD"}),
    ({"t": ("Upper",)}, {"t": "MiXeD"}),
    ({"t": ("Capitalize",)}, {"t": "hello world"}),
    ({"t": ("Strip",)}, {"t": "  pad  "}),
    ({"t": ("DefaultTo", "dflt")}, {"t": "have"}),
    ({"t": ("SetTo", 42)}, {"t": 7}),
    ({"q": ("Clamp", 2, 4)}, {"q": 1}, {"q": 3}, {"q": 9}),
    ({"q": ("Coerce", int)}, {"q": "17"}, {"q": "x"}),
    ({"t": ("Replace", "a", "b")}, {"t": "banana"}),
    # combinators
    ({"q": ("All", ("Coerce", int), ("Range", 1, 9))}, {"q": "5"}, {"q": "77"}),
    ({"s": ("Any", ("In", ["a"]), ("Match", "^z"))},
     {"s": "a"}, {"s": "zz"}, {"s": "q"}),
    ({"s": ("Maybe", ("In", ["a"]))}, {"s": "a"}, {"s": "x"}),
    ({"s": ("Msg", ("Range", 1, 5), "boom")}, {"s": 9}),
    # markers / structure
    ({("Required", "k"): str}, {"k": "v"}, {}),
    ({("Optional", "k"): str, ("Required", "j"): int}, {"j": 3}),
    ({"k": {"n": ("Range", 0, 5)}}, {"k": {"n": 3}}, {"k": {"n": 9}}),
    ({"x": [("Range", 0, 5)]}, {"x": [1, 2]}, {"x": [1, 9]}),
    ({"x": {1, 2, 3}}, {"x": {1, 2}}, {"x": {1, 7}}),
    # batch 2: bounds/edges, multi-error, groups, policies
    ({"q": ("Range", 1, 49, False, False)}, {"q": 1}, {"q": 25}, {"q": 49}),
    ({"q": ("Range", None, 10)}, {"q": 11}),
    ({"q": ("Clamp", None, 4)}, {"q": 9}),
    ({"q": ("Clamp", 2, None)}, {"q": 0}),
    ({"t": ("Length", None, 2)}, {"t": [1, 2, 3]}),
    ({"t": ("Length", 2, None)}, {"t": "a"}),
    ({"b": ("Boolean",)}, {"b": "TRUE"}, {"b": "No"}, {"b": "enable"}),
    ({"s": ("In", [])}, {"s": "x"}),
    ({"q": ("Msg", ("Range", 1, 5), "boom")}, {"q": 3}),
    ({"t": ("Title",)}, {"t": "hello world"}),
    # str.title() uppercases after ANY non-letter, not just whitespace
    # (fuzz seed 201): 'x@y.com' -> 'X@Y.Com', 'a1b' -> 'A1B'
    ({"t": ("Title",)}, {"t": "x@y.com"}, {"t": "a1b"}, {"t": "they're"},
     {"t": "ABC dEF"}, {"t": ""}, {"t": " pad "}),
    ({"t": ("Set",)}, {"t": [1, 1, 2]}),
    # multiple failing fields accumulate (error SET compare)
    (
        {"a": ("Range", 0, 5), "b": ("In", ["x"]), "c": ("Length", 1, 2)},
        {"a": 9, "b": "z", "c": "toolong"},
        {"a": 3, "b": "x", "c": "ok"},
    ),
    # nested dict two levels + error deep path
    (
        {"o": {"p": {"q": ("Range", 0, 1)}}},
        {"o": {"p": {"q": 1}}},
        {"o": {"p": {"q": 5}}},
    ),
    # sequence of scalar literal alternatives (homogeneous element type:
    # Spark arrays are single-typed)
    ({"x": ["one", "two"]}, {"x": ["one", "two", "one"]},
     {"x": ["three"]}),
    # All threading transformed values
    ({"q": ("All", ("Clamp", 0, 10), ("Range", 0, 5))}, {"q": 7}),
    # SomeOf failures
    (
        {"q": ("SomeOf", [("Range", 0, 5), ("Range", 3, 9)], 2)},
        {"q": 4},
        {"q": 8},
    ),
    # Coerce float
    ({"q": ("Coerce", float)}, {"q": "3.5"}, {"q": "zz"}),
    # Replace regex groups
    ({"t": ("Replace", "(a+)", "<")}, {"t": "baaad"}),
    # Equal on strings, Literal on ints
    ({"x": ("Equal", "s")}, {"x": "s"}, {"x": "t"}),
    ({"x": ("Literal", 5)}, {"x": 5}, {"x": 6}),
    # batch 3: msg overrides, Unique rendering, groups
    ({"q": ("Range", 1, 5, True, True, "custom range msg")}, {"q": 9}),
    ({"s": ("In", ["a"], "pick a")}, {"s": "b"}),
    ({"s": ("Match", "^a", "must start with a")}, {"s": "b"}),
    ({"q": ("All", ("Coerce", int), ("Range", 1, 5))}, {"q": "0"}),
    # single duplicate only: the reference renders ``list(set(dupes))``
    # whose order is hash-randomized for >1 distinct string dupes
    ({"x": ("Unique",)}, {"x": ["b", "a", "b", "c"]}),
    ({"x": ("Unique",)}, {"x": [2.5, 2.5]}),
    # batch 4: Number precision/scale, Union, NotIn
    ({"n": ("Number", 6, 2)}, {"n": "1234.56"}, {"n": "1.2"}),
    ({"n": ("Number", None, 2)}, {"n": "7.25"}, {"n": "7.125"}),
    ({"s": ("Union", ("In", ["a"]), ("Match", "^z"))},
     {"s": "a"}, {"s": "zebra"}, {"s": "q"}),
    ({"s": ("NotIn", ["x", "y"])}, {"s": "x"}),
    # Any over dict branches: deepest-error bookkeeping
    # (validators.py:322-336)
    ({"k": ("Any", {"a": int}, {"a": str})},
     {"k": {"a": 5}}, {"k": {"a": 2.5}}),
    ({"k": ("Any", {"a": {"b": int}}, {"a": int})},
     {"k": {"a": {"b": "s"}}}, {"k": {"a": {"b": 4}}}),
    # Msg depth rule (schema_builder.py:941-949): override applies to
    # errors whose path depth is <=1 below the Msg; deeper errors keep
    # their own message and path
    ({"k": ("Msg", ("Range", 1, 5), "custom msg")}, {"k": 9}, {"k": 3}),
    ({"k": ("Msg", [int], "want ints")}, {"k": ["x"]}, {"k": [7]}),
    ({"k": ("Msg", {"a": ("Range", 1, 5)}, "boom")}, {"k": {"a": 9}}),
    ({"k": ("Msg", {"a": {"b": int}}, "depth2")}, {"k": {"a": {"b": "s"}}},
     {"k": {"a": {"b": 2}}}),
    (
        {
            ("Exclusive", "x", "grp"): object,
            ("Exclusive", "y", "grp"): object,
        },
        {"x": 1, "y": 2},
        {"x": 1},
    ),
    (
        {
            ("Inclusive", "a", "pair"): object,
            ("Inclusive", "b", "pair"): object,
        },
        {"a": 1, "b": 2},
        {"a": 1},
    ),
    # batch 5: SomeOf max_valid (TooManyValid), exclusive-bound Range,
    # default-format Datetime, Boolean over ints, sequence-of-dict
    # element schemas, Equal on arrays, Maybe transform threading,
    # Unordered msg override repeated per missing element, exact Length
    (
        {"x": ("SomeOf", [("Range", 0, 5), ("Range", 3, 9),
                          ("Range", 8, 12)], None, 1)},
        {"x": 4},
        {"x": 10},
    ),
    ({"q": ("Range", 1, None, False)}, {"q": 1}, {"q": 2}),
    ({"d": ("Datetime",)}, {"d": "2024-01-02T03:04:05.000Z"},
     {"d": "nope"}),
    ({"b": ("Boolean",)}, {"b": 1}, {"b": 0}),
    ({"x": [{"a": ("Range", 0, 5)}]}, {"x": [{"a": 3}]},
     {"x": [{"a": 9}]}),
    # sequence-of-dict: multi-key elements, extra keys, dict/array nesting
    ({"x": [{"a": ("Range", 0, 5), "b": str}]},
     {"x": [{"a": 3, "b": "s"}, {"a": 9, "b": "t"}]}),
    ({"x": [{"a": {"b": ("Range", 0, 5)}}]},
     {"x": [{"a": {"b": 2}}]}, {"x": [{"a": {"b": 9}}]}),
    ({"x": [{"a": [("Range", 0, 5)]}]},
     {"x": [{"a": [1, 2]}]}, {"x": [{"a": [1, 9]}]}),
    ({"x": ("Equal", [1, 2])}, {"x": [1, 2]}, {"x": [1, 3]}),
    ({"s": ("Maybe", ("Coerce", int))}, {"s": "5"}),
    ({"x": ("Unordered", [("Range", 0, 10), ("Range", 10, 20)],
            "custom")},
     {"x": [55.0, 66.0]}),
    ({"t": ("Length", 3, 3)}, {"t": "abc"}, {"t": "ab"}),
    # Union discriminant routing (tests.py:1683-1710): the tag filter
    # selects the candidate branch; its error surfaces, not the deepest
    # across all branches; no matching tag -> 'no valid value found'
    (
        {"impl": ("UnionDisc",
                  {"type": "A", "a_val": str},
                  {"type": "B", "b_val": int})},
        {"impl": {"type": "A", "a_val": "x"}},
        {"impl": {"type": "A", "a_val": 5}},
        {"impl": {"type": "D", "a_val": "x"}},
    ),
    # Inclusive group defaults (tests.py:1644-1660): whole group absent
    # -> defaults injected; partially present -> group error (defaults
    # do not rescue it)
    (
        {
            ("Inclusive", "x", "stuff", None, None, 3): int,
            ("Inclusive", "y", "stuff", None, None, 4): int,
        },
        {},
        {"x": 1},
        {"x": 1, "y": 2},
    ),
    # bare Python callables are validators (schema_builder.py:800-811):
    # raised Invalid keeps its message; ValueError -> 'not a valid
    # value'; return value is the transform
    ({"n": ("PyCallable", "is_even")}, {"n": 4}, {"n": 3}),
    ({"n": ("PyCallable", "half")}, {"n": 4}, {"n": 3}),
    # callable KEY schemas (tests.py:1712-1752): the candidate runs on
    # the key; a failing key surfaces the callable's error instead of
    # 'extra keys not allowed' (key transforms don't rename columns —
    # names are static; documented validation-only divergence)
    ({("PyCallable", "as_int"): str}, {"1": "one", "two": "2"}),
    ({("PyCallable", "as_int_msg"): str}, {"1": "one", "two": "2"}),
    # Maybe with msg (tests.py:799-803)
    ({"s": ("Maybe", int, "int or None expected")}, {"s": "foo"}),
    # Coerce(Enum) lists allowed values (tests.py:1844-1869); invalid
    # doc only — the engine keeps the raw value (a Row cannot hold Enum
    # members), so the accept-side transform diverges by design
    ({"c": ("Coerce", _ChoiceEnum)}, {"c": 4}),
    # batch 7: reference tests.py behaviors not yet differentially
    # covered — error paths under combinator msg kwargs (issue #347,
    # tests.py:1334-1383), Remove variants (tests.py:190-248), empty
    # dict schemas (tests.py:841-872), Self inside Any (tests.py:1454),
    # complex Required keys w/ message + multiple groups
    # (tests.py:2067-2135), Date custom format (tests.py:1105), email
    # edge cases (tests.py:311-348)
    ({("Optional", "q"): int, ("Required", "q2"): ("Match", "^a")},
     {"q2": "abc"}, {"q2": "zzz"}),
    # Remove named keys are dropped from output (tests.py:192-195)
    ({"weight": int, ("Remove", "color"): str, ("Remove", "amount"): int},
     {"weight": 10, "color": "red", "amount": 1}),
    # Remove by key TYPE with value-type routing (tests.py:197-213):
    # str keys with int values are removed, str keys with str values
    # kept — the wildcard must consider the VALUE schema against the
    # column's static type, not just the key
    ({"weight": float, "amount": int, ("Remove", str): int, str: str},
     {"weight": 73.4, "condition": "new", "amount": 5, "left": 2}),
    # Remove values from a list (tests.py:215-223)
    ({"x": [("Remove", 1), int]}, {"x": [1, 2, 3, 4, 1, 5, 6, 1, 1, 1]}),
    ({"x": [1.0, ("Remove", float)]}, {"x": [1.0, 2.0, 3.0, 1.0]}),
    # Remove fall-through (fuzz seeds 5012/5032): the key is removed only
    # when its VALUE schema passes; a failing value routes to the extra
    # policy — kept raw under ALLOW_EXTRA, 'extra keys not allowed' under
    # PREVENT (schema_builder.py:350-368,385-396)
    ({("Remove", "k"): ("Range", 0, 10), "w": int},
     {"k": 5, "w": 1}, {"k": 99, "w": 1}),
    # nested Msg over a dict schema one level down (fuzz seed 5019):
    # depth<=1 override applies at any nesting level
    ({"k": {"n0": ("Msg", {"m": int}, "inner dict msg"),
            "n1": int}},
     {"k": {"n0": {"m": 1}, "n1": 2}},
     {"k": {"n0": {"m": "x"}, "n1": 2}},
     {"k": {"n0": 5, "n1": 2}}),
    # transforms str()-cast ANY input first (util.py:15-62, fuzz seed
    # 5422): str(['a']).lower() is "['a']" (len 5), Python rendering
    ({"k0": ("All", ("Lower",), ("Length", 5, 6)), "k1": float},
     {"k0": ["a"], "k1": 0.5}, {"k0": [1, 22], "k1": 1.0}),
    # Remove with a PASSING list value removes per-row (fuzz seed 5557)
    ({("Remove", "k1"): [str], "k2": int},
     {"k1": ["red", "", "17"], "k2": 1}, {"k1": [], "k2": 1}),
    # Unordered's per-element errors survive a wrapping Msg when the
    # FIRST error is deep (fuzz seed 5717) — the multi-error channel
    # participates in the all-or-nothing computation at its key position
    ({("Required", "k0"): ("Msg", {"n0": {"n0": ("Boolean",),
                                          "n1": ("Range", 0.0, 10.0)},
                                   "n1": ("Unordered", [("In", [10]),
                                                        ("In", [5, 49, 9, 7]),
                                                        ("Equal", 1)])},
      "fuzz dict message")},
     {"k0": {"n0": {"n0": "zebra", "n1": 2.5}, "n1": [2.0, 7.0, -5.0]}},
     {"k0": {"n0": {"n0": "1", "n1": 2.5}, "n1": [10.0, 7.0, 1.0]}}),
    # Msg is all-or-nothing on the FIRST error (fuzz seed 5257): a deep
    # first error passes the WHOLE set through (shallow errors included);
    # a shallow first error collapses everything to Invalid(msg)
    ({"k1": ("Msg", {"n0": {"n0": ("Range", -2.5, 5.0)},
                     "n1": ("ExactSequence", [("Equal", 10)])}, "fuzz m")},
     {"k1": {"n0": {"n0": 100.0}, "n1": [0]}},
     {"k1": {"n0": {"n0": 1.0}, "n1": [0]}}),
    ({"k1": ("Msg", {"n1": ("ExactSequence", [("Equal", 10)]),
                     "n0": {"n0": ("Range", -2.5, 5.0)}}, "fuzz m")},
     {"k1": {"n1": [0], "n0": {"n0": 100.0}}}),
    # missing-required inside a Msg dict orders AFTER value errors
    # (schema_builder.py:399-405): the deep value error is first
    ({"k1": ("Msg", {("Required", "r"): int,
                     "n0": {"n0": ("Range", 0, 1)}}, "m!")},
     {"k1": {"n0": {"n0": 5.0}}}, {"k1": {"n0": {"n0": 0.5}}}),
    # Number on a FLOAT feeds Decimal(float) — exact binary, so dyadic
    # 10.0 is Decimal('10'): scale 0 matches, only precision message
    # (fuzz seed 5089)
    ({"x": ("Number", 4, 0)}, {"x": 10.0}, {"x": 0.5}, {"x": 100.0}),
    ({"x": ("Number", 4, 1)}, {"x": 10.0}),
    # SomeOf raises with an EMPTY own path through the default-injection
    # route too (fuzz seed 5232)
    ({("Optional", "k", None, -1): ("SomeOf", [("Range", 0, 5),
                                               ("Range", 2, 25)], 1)}, {}),
    # Remove inside a NESTED dict schema: removed when the value passes,
    # extra policy when it fails; never subject to required=True
    ({"k": {("Remove", "r"): int, "n": int}},
     {"k": {"r": 1, "n": 2}}),
    ({"k": {("Remove", "r"): ("Range", 0, 1), "n": int}},
     {"k": {"r": 5, "n": 2}}, {"k": {"r": 0, "n": 2}}),
    # Remove with callable key + callable wildcard (tests.py:226-247)
    ({("Remove", ("All", str, ("PyCallable", "starts_with_dot"))): object,
      ("PyCallable", "no_dot"): object},
     {".remove": "x", "ok": "y"}),
    # empty dict schema: everything is extra (tests.py:841-852)
    ({}, {"var": 123}),
    # empty list value schema (tests.py:860-872)
    ({"var": []}, {"var": [123]}),
    # callable raising Invalid inside a list element, index in path
    # (tests.py:576-594: '3 is not even @ data[even_numbers][0]')
    ({"even_numbers": [("All", int, ("PyCallable", "is_even"))]},
     {"even_numbers": [3]}, {"even_numbers": [2, 4]}),
    # Self as an Any branch (tests.py:1454-1466); depth bounded by the
    # doc's own struct depth
    ({"number": int, "follow": ("Any", ("SelfRef",), "stop")},
     {"follow": "stop"}),
    # complex Required(Any(...)) with custom message (tests.py:2067)
    ({("Required", ("Any", "color", "temperature"),
       "Please specify a lighting attribute"): str, "device_id": str},
     {"color": "red", "device_id": "light1"},
     {"device_id": "light1"}),
    # two independent complex Required groups (tests.py:2114-2135)
    ({("Required", ("Any", "color", "hue")): str,
      ("Required", ("Any", "brightness", "intensity")): str,
      "device": str},
     {"color": "red", "brightness": "high", "device": "light"},
     {"brightness": "high", "device": "light"}),
    # complex Required key value validation (tests.py:2136-2151)
    ({("Required", ("Any", "color", "temperature")): str, "device": str},
     {"color": 123, "device": "light"}),
    # Date with custom format (tests.py:1105-1109)
    ({"d": ("Date", "%d/%m/%Y")}, {"d": "02/01/2024"}, {"d": "2024-01-02"}),
    # email edge cases (tests.py:311-348)
    ({"e": ("Email",)}, {"e": ""}, {"e": "a@"}, {"e": "a@b com"}),
    # batch 8: In/NotIn with frozenset containers — the message sorts
    # the container (tests.py:116-127, 145-159)
    ({"color": ("In", frozenset(["red", "blue", "yellow"]))},
     {"color": "blue"}, {"color": "orange"}),
    ({"color": ("NotIn", frozenset(["red", "blue", "yellow"]))},
     {"color": "orange"}, {"color": "blue"}),
    # All with a sequence stage: element errors keep index paths, later
    # scalar stages (Length) see the threaded output, first failing
    # stage wins (tests.py:596-614 nested_multiple_validation_errors)
    ({"even_numbers": ("All", [("All", int, ("PyCallable", "is_even"))],
                       ("Length", 1))},
     {"even_numbers": [3]}, {"even_numbers": [2, 4]},
     {"even_numbers": []}),
    # fix #157: All([Any(literals)], Length) (tests.py:627-632)
    ({"x": ("All", [("Any", "one", "two", "three")], ("Length", 1))},
     {"x": ["one"]}, {"x": ["four"]}, {"x": []}),
    # per-element index paths on static type mismatch (tests.py:1393)
    ({"k": [int]}, {"k": ["a", "b"]}, {"k": [1, 2]}),
    # Maybe returns the default error (tests.py:805-821)
    ({"m": ("Maybe", ("Range", 1, 2))}, {"m": 1}, {"m": 3}),
    # set / frozenset value schemas (tests.py:1509-1569); the engine's
    # set carrier is an array column, __call__ round-trips a list
    ({"x": {int}}, {"x": {1, 2}}),
    ({"x": frozenset({int})}, {"x": frozenset({1, 2})}),
    # container-class gate (schema_builder.py:672-678): a set schema only
    # accepts its OWN set class — a list or the sibling set type fails
    # with 'expected a set'/'expected a frozenset' (reinstated Python-side
    # by schema._reinstate_set_gates; the array carrier erases the class)
    ({"x": frozenset({int})}, {"x": [1, 2]}),
    ({"x": frozenset({int})}, {"x": 7}),
    ({"x": {int}}, {"x": frozenset({5})}),
    ({"x": frozenset({int})}, {"x": frozenset({"a"})}),
    ({"x": frozenset({1, 2, 3})}, {"x": frozenset({4})}, {"x": frozenset({3, 1})}),
    # fuzz seed 4042: an empty FIRST inner list must not collapse the
    # element type to the string fallback (_has_type_content scan) — the
    # 50 in the second inner list must still hit NotIn, and a failing
    # Remove value falls through to the extra policy
    ({("Remove", "k2"): [[("NotIn", [0, 50, 7])]]},
     {"k2": [[], [-5, 50, 10]]}, {"k2": [[1, 2]]}),
    ({"k2": [[("NotIn", [0, 50, 7])]]}, {"k2": [[], [-5, 50, 10]]}),
    ({"k2": [[int]]}, {"k2": [[], [3]]}, {"k2": []}),
    # fuzz seeds 4300/4328: a REQUIRED wildcard key ({str: v} under
    # required=True) must claim >=1 data key — an empty nested map errors
    # with the key schema as the final path component
    # (schema_builder.py:398-405: required_keys leftovers)
    ({"k1": {"n0": ("Equal", 0.0), "n1": {str: ("Length", 2, 6)}}},
     {"k1": {"n0": 100.0, "n1": {}}}, {"k1": {"n0": 0.0, "n1": {"ab": "abc"}}}),
    # Number precision/scale matrix (tests.py:985-1081)
    ({"n": ("Number", 6, 2)},
     {"n": "1234.01"}, {"n": "123456.712"}, {"n": "abc"}),
    ({"n": ("Number", None, 2)}, {"n": "123456.71"}, {"n": "123456.712"}),
    ({"n": ("Number", 6, None)}, {"n": "123456"}, {"n": "1234567.8"}),
    # complex Required with mixed-type candidates (tests.py:2090-2113):
    # only str candidates can exist as columns; all appear in the message
    ({("Required", ("Any", "string_key", 123, 45.6)): str, "other": int},
     {"string_key": "value", "other": 1}, {"other": 1}),
    # All(Self, {...}) re-entering the root schema (tests.py:1469-1494)
    ({"number": int, "follow": ("All", ("SelfRef",), {"extra_number": int})},
     {"number": 6}, {"follow": {"number": 6}}),
    # root-level Any over mapping branches with required=True
    # (tests.py:1607-1622): the whole row must match >=1 branch
    (("AnyReq", {"a": int}, {"b": str}), {}, {"a": 3}, {"b": "x"}),
    (("AnyReq", {"a": ("Any", float, int)}, {"b": int},
      {"c": {"aa": int}}), {}, {"c": {"aa": 5}}),
    # fuzz regressions (tools/fuzz_parity.py seeds 47/85): cross-type
    # literals degrade to plain violations under Python equality
    # semantics — Spark's implicit cast (or AnalysisException) must not
    # leak through
    ({"x": ("Contains", 50)}, {"x": []}, {"x": ["a", "b"]}),
    ({"x": ("Contains", "a")}, {"x": "cat"}, {"x": "xyz"}),  # substring
    ({"k": {"n": [("Clamp", 11, 100)]}},
     {"k": {"n": []}}, {"k": {"n": ["s", "t"]}}),
    ({"x": ("Clamp", 2.5, 7.5)}, {"x": "abc"}),
    ({"x": ("In", [1, 2])}, {"x": "red"}),
    ({"x": ("NotIn", ["red", "blue"])}, {"x": 5.0}),
    ({"x": ("Equal", 5)}, {"x": "5"}),
    ({"x": 5}, {"x": "5"}),  # literal value schema, cross-type
    # len() has no meaning for numbers: TypeError -> RangeInvalid
    # 'invalid value or type' (validators.py:779-781); Spark's length()
    # would implicitly cast (len(5) == 1)
    ({"x": ("Length", 1, 3)}, {"x": 5}, {"x": 2.5}),
    # Coerce(int) on a list raises TypeError -> 'expected int'
    ({"x": ("Coerce", int)}, {"x": [1, 2]}),
    ({"x": ("Coerce", float)}, {"x": ["a"]}),
    # ExactSequence shape errors raise ExactSequenceInvalid(None) which
    # str()-renders as the literal 'None' (validators.py:947-948)
    ({"x": ("ExactSequence", [("In", [99]), int])},
     {"x": 5}, {"x": [99]}, {"x": [99, 1, 2]}),
    # nested dict gate carries the enclosing mapping's 'dictionary
    # value' context; the root gate renders bare
    ({"k": {"n": int}}, {"k": "no"}),
    ({"k": {"n": {"m": int}}}, {"k": {"n": 5}}),
    # Unique on a non-iterable scalar: the reference wraps the Python
    # TypeError text (validators.py:978-983)
    ({"x": ("Unique",)}, {"x": 5.0}, {"x": 3}),
    # Equal renders containers as Python str(list)
    ({"x": ("Equal", -1)}, {"x": ["yes", " pad "]}, {"x": [1, 2]}),
    # Number on a list: Decimal(list) raises ValueError -> the callable
    # wrapper's 'not a valid value', NOT the enclosed-number message
    ({"x": ("Number", 4, 0)}, {"x": []}, {"x": ["17"]}),
    # cross-family marker default cannot live in the column: no
    # injection (and no analysis crash); present values still validate
    ({("Optional", "k", None, 5.0): ("Range", 49.5, 100.0)},
     {"k": ["zebra"]}, {"k": 50.0}),
    # same-family default casts to the COLUMN's type so present values
    # keep their renderings (value:25, not value:25.0)
    ({("Optional", "k", None, 10.0): ("Equal", 7.5)}, {"k": 25}),
    # a default injected for an ABSENT key is validated like any present
    # value (schema_builder.py:299-307)
    ({("Optional", "k", None, 10): ("In", [25, 7, 11, 1])}, {}, {"k": 7}),
    ({("Optional", "k", None, 3): ("Range", 1, 5)}, {}),
    # Number understands scientific notation via Decimal.as_tuple()
    # (precision=1, scale=-3 for '1e3') and drops leading zeros across
    # the whole digit string ('0.05' -> precision 1)
    ({"x": ("Number", 4, 2)}, {"x": "1e3"}, {"x": "0.05"}, {"x": "1.5e-2"}),
    ({"x": ("Number", 1, None)}, {"x": "1e3"}, {"x": "0.05"}),
    ({"x": ("Number", None, 3)}, {"x": "1e-3"}, {"x": "1.5e2"}),
    # strptime of a non-string -> the format message, not a cast crash
    ({"x": ("Date",)}, {"x": 100.0}, {"x": 5}),
    # Clamp substitutes the BOUND OBJECT itself (validators.py:740-744):
    # int bounds over a float value change downstream str(v) — Equal must
    # render 'value:4', not 'value:4.0' (fuzz seed 677). Covers max-
    # substitution, min-substitution, pass-through, and Msg forwarding.
    ({"k": ("All", ("Clamp", 0, 4), ("Equal", 100))},
     {"k": 5.0}, {"k": -2.5}, {"k": 2.5}),
    ({"k": ("All", ("Msg", ("Clamp", 0, 4), "mm"), ("Equal", 100))},
     {"k": 7.5}),
    # mixed bounds: the float bound renders identically either way
    ({"k": ("All", ("Clamp", 0, 4.5), ("Equal", 100))}, {"k": 7.5}),
    # the threaded str survives intermediate pure-predicate stages
    ({"k": ("All", ("Clamp", 0, 4), ("Range", -100, 100), ("Equal", 99))},
     {"k": 5.0}),
    # TRANSFORMING sequence alternatives: matched elements are replaced
    # by the alternative's output, so the array's element type changes
    # (fuzz seed 1204: [Boolean] over ints crashed type unification)
    ({"k0": float, ("Optional", "k1"): [("Boolean",)]},
     {"k0": -0.5, "k1": [9, 10, 50]}),
    ({"k": [("Boolean",)]}, {"k": ["yes", "0", "true"]},
     {"k": ["yes", "maybe"]}),
    ({"k": [("Coerce", float)]}, {"k": [1, 2]}, {"k": []}),
    # Msg(dict) is a Schema RE-ENTRY (schema_builder.py:937): SomeOf's
    # embedded sub-error paths freeze RELATIVE to it, and its empty-path
    # error prepends only the boundary key (fuzz seed 1693)
    ({"k2": ("Msg", {"n0": {"n0": ("Number", 8, 0)},
                     "n1": ("SomeOf", [("Range", -5, -1), ("Range", 11, 99),
                                       ("Range", 3, 9)], 1)},
             "fuzz dict message")},
     {"k2": {"n0": {"n0": "abc"}, "n1": 2}},
     {"k2": {"n0": {"n0": "123"}, "n1": 5}}),
    # the threaded str reaches an Any's surfaced first-branch error
    ({"k": ("All", ("Clamp", 0, 4),
            ("Any", ("Equal", 100), ("Range", 50, 60)))},
     {"k": 5.0}),
    # Schema instances as dict values: callable re-entry with the
    # sub-schema's OWN flags and boundary-key path prepend
    ({"a": ("Schema", {"b": int})}, {"a": {"b": "x"}}, {"a": {"b": 3}}),
    ({"a": ("Schema", int)}, {"a": 3}, {"a": "x"}),
    ({"a": ("Schema", {"b": int}, True)}, {"a": {}}),
    ({"a": ("Schema", {"n": ("SomeOf", [("Range", 11, 99), ("Range", 3, 9)],
                            2)})},
     {"a": {"n": 2}}),
    # Msg first-error ordering: a DEEP sequence-element error for an
    # earlier key beats a later shallow error -> everything passes
    # through, no collapse (fuzz seed 2325)
    ({"k0": ("Msg", {"n0": [("Equal", 3)], "n1": "red"},
             "fuzz dict message")},
     {"k0": {"n0": [49, 49], "n1": "no"}},
     {"k0": {"n0": [3, 3], "n1": "no"}}),
    # NESTED sequence schemas: a deeper-than-index error aborts the whole
    # validation with the INNER errors (schema_builder.py:616-620) —
    # earlier shallow accumulation is discarded; Msg's depth<=1 rule sees
    # the deep path and passes everything through
    ({"x": [["one", "two", int]]},
     {"x": [["three"]]}, {"x": [["one"], ["three"]]},
     {"x": [[]]}, {"x": [["one"], ["two"]]}),
    ({"x": ("Msg", [["one", int]], "no!")},
     {"x": [["three"]]}, {"x": ["flat"]}, {"x": [["one"]]}),
    ({"x": [[[int]]]}, {"x": [[["a"]]]}, {"x": [[[1, 2]], [[3]]]}),
    # Msg over a dict whose sequence value TRANSFORMS elements ([Boolean]
    # over strings): the collapse condition must see the ORIGINAL column,
    # not the stage-2 replaced one (fuzz seed 2638)
    ({"k0": ("In", [10]),
      "k1": ("Msg", {"n0": [("Boolean",)], "n1": ("Match", "^a")},
             "fuzz dict message")},
     {"k0": 5, "k1": {"n0": ["abc"], "n1": "blue"}},
     {"k0": 10, "k1": {"n0": ["yes", "off"], "n1": "abc"}}),
    # wildcard keys in NESTED dict schemas resolve against the struct's
    # static field names (literal keys claim first; unmatched keys
    # surface the recorded key error under PREVENT)
    ({"k": {str: int}}, {"k": {"a": 3, "b": 4}}, {"k": {"a": "x"}}),
    ({"k": ("Msg", {str: int}, "mm")}, {"k": {"a": 3}}, {"k": {"a": "x"}}),
    ({"k": {("Match", "^a"): int}}, {"k": {"ab": 3}}, {"k": {"zb": 3}}),
    ({"k": {("Remove", str): int, "keep": int}},
     {"k": {"drop": 5, "keep": 7}}),
    ({"k": {"lit": str, str: int}}, {"k": {"lit": "v", "other": 7}}),
    # Remove key whose value is a Schema instance: the fall-through fail
    # condition evaluates with the sub-schema's own flags (seeds 3748/3815)
    ({("Remove", "k0"): ("Schema", {"n0": ("Length", 1, 4)}, False),
      "k1": int},
     {"k0": {"n0": "abcdef"}, "k1": 9}, {"k0": {"n0": "ab"}, "k1": 9}),
    # nested Union(discriminant=...) BELOW the top level (fuzz seed 6048):
    # candidate routing + deepest-error selection inside a struct field
    ({"k0": {"n0": ("UnionDisc", {"tag": "a", "val": "zebra"},
                    {"tag": "b", "val": 0})}},
     {"k0": {"n0": {"tag": "b", "val": 0}}},
     {"k0": {"n0": {"tag": "b", "val": 4}}},
     {"k0": {"n0": {"tag": "zz", "val": 0}}}),
    # nested Any over dict branches below the top level
    ({"k0": {"n0": ("Any", {"b0": ("Range", 0, 5)},
                    {"b0": ("In", ["x", "y"])})}},
     {"k0": {"n0": {"b0": 3}}}, {"k0": {"n0": {"b0": 99}}}),
    # Any-over-dicts dict type gate carries the enclosing mapping ctx
    # (fuzz seed 6058): 'expected a dictionary for dictionary value'
    ({"k1": ("Any", {"b0": "abcdef"}, {"b0": 10})}, {"k1": []}),
    # NESTED Exclusive/Inclusive groups: group checks run at every
    # mapping level and suppress only THAT level's other errors
    ({"k": {("Exclusive", "x", "g"): int, ("Exclusive", "y", "g"): int,
            "s": ("In", ["a"])},
      "top": int},
     {"k": {"x": 1, "y": 2, "s": "z"}, "top": "bad"},
     {"k": {"x": 1, "s": "a"}, "top": 3},
     {"k": {"x": 1, "s": "z"}, "top": 3}),
    ({"k": {("Inclusive", "a0", "ga"): int, ("Inclusive", "a1", "ga"): int,
            ("Inclusive", "b0", "gb"): int, ("Inclusive", "b1", "gb"): int}},
     {"k": {"a0": 1, "b0": 2}}, {"k": {"a0": 1, "a1": 2}}),
    # Union candidacy with a CROSS-TYPE literal tag value: Python
    # equality is False; an ANSI Spark == would throw CAST_INVALID_INPUT
    # (fuzz seed 7009)
    ({"k0": ("UnionDisc", {"tag": "a", "val": "no"},
             {"tag": "b", "val": int})},
     {"k0": {"tag": "a", "val": 25}}, {"k0": {"tag": "b", "val": 25}}),
    # strptime-EXACT Datetime/Date semantics (CPython _strptime.TimeRE):
    # IGNORECASE literals (lowercase t/z in ISO strings), 1-2 digit
    # numeric fields, year-0000 reject, whitespace runs match \s+,
    # %j overflow into the next year, leap-second reject, month names
    # case-insensitive, adjacent digit runs fixed-width
    ({"d": ("Datetime",)}, {"d": "2024-01-02t03:04:05.000006z"},
     {"d": "2024-1-2T3:4:5.6Z"}, {"d": "0000-01-02T03:04:05.000006Z"}),
    ({"d": ("Datetime", "%Y %j")}, {"d": "2023 366"}, {"d": "2023 367"},
     {"d": "2023 000"}),
    ({"d": ("Datetime", "%H:%M:%S")}, {"d": "3:4:5"}, {"d": "03:04:60"},
     {"d": "24:00:00"}),
    ({"d": ("Datetime", "%Y-%m-%d  %H:%M")}, {"d": "2023-03-29 12:30"},
     {"d": "2023-02-29 12:30"}),
    ({"d": ("Datetime", "%Y%m%d")}, {"d": "20240102"}, {"d": "20240230"}),
    ({"d": ("Datetime", "%d %b %Y")}, {"d": "02 jan 2024"},
     {"d": "02 JAN 2024"}, {"d": "02 January 2024"},
     {"d": "30 feb 2024"}),
    ({"d": ("Datetime", "%d %B %Y")}, {"d": "02 january 2024"},
     {"d": "02 Jan 2024"}),
    ({"d": ("Datetime", "%b%Y")}, {"d": "jan2024"}),
    ({"d": ("Datetime", "%I:%M %p")}, {"d": "11:30 pm"},
     {"d": "13:30 PM"}),
    ({"d": ("Date", "%d.%m.%Y")}, {"d": "2.1.2024"}, {"d": "30.02.2024"}),
    ({"d": ("Date",)}, {"d": "2024-1-2"}, {"d": "2024-02-30"}),
    # %z offsets: case-SENSITIVE Z (CPython compiles (?-i:Z) inside its
    # IGNORECASE matcher), colon/seconds forms, |offset| < 24h (java's
    # ZoneOffset caps at 18h — the engine strips the regex-validated
    # offset before the JVM parse), colon-consistency converter rule
    ({"d": ("Datetime", "%Y-%m-%dT%H:%M:%S%z")},
     {"d": "2024-01-02T03:04:05+0000"}, {"d": "2024-01-02T03:04:05Z"},
     {"d": "2024-01-02T03:04:05z"}, {"d": "2024-01-02T03:04:05+05:30"},
     {"d": "2024-01-02T03:04:05-23:59"},
     {"d": "2024-01-02T03:04:05+2400"},
     {"d": "2024-01-02T03:04:05+00:00:30"},
     {"d": "2024-01-02T03:04:05+00"}),
    ({"d": ("Datetime", "%H:%M%z")}, {"d": "03:04+00:00"},
     {"d": "03:04Z"}, {"d": "03:04z"}, {"d": "03:04+00:0059"},
     {"d": "03:04+0060"}),
    # fuzz seed 7880: SomeOf's path-less NotEnoughValid inside a
    # Maybe(dict) branch keeps its EMPTY path through the mapping loop
    # (schema_builder.py:365-371 adjusts only error_type), so the dict
    # branch loses the Any(None, ...) deepest-path selection and the
    # whole branch collapses to the None branch's 'not a valid value'
    ({"k0": {"n0": ("Maybe", {"n0": ("SomeOf",
                                     [("Range", 10, 50), ("Range", 5, 99),
                                      ("Range", 10, 49)], 2)})},
      ("Remove", "k1"): ("Any", {"b0": ("In", [" pad "])},
                         {"b0": ("Match", "^[a-z]{2,4}$"), "b1": ""}),
      "k2": ("Unordered", [("NotIn", [9, -5]),
                           ("KW", "In", [[5, 100, 50]], {"msg": "fz in"}),
                           ("Clamp", 10, 25)])},
     {"k0": {"n0": {"n0": 4}}, "k1": {"b1": "a"}, "k2": "x@y.com"},
     {"k0": {"n0": {"n0": 25}}, "k2": "x@y.com"}),
    # fuzz seed 8341: set container-class gates ('expected a frozenset')
    # must be reinstated through Schema-INSTANCE values too — the
    # single-document pre-walk recurses into their inner dicts
    ({"k0": {"n0": [("NotIn", ["zebra", "yes"])],
             "n1": ("Schema", {"n0": frozenset({str}),
                               "n1": ("Equal", "0")}, True)},
      "k1": ("Length", 0, 1),
      "k2": [[("Range", 1, 3, False, False)]],
      ("Exclusive", "g0", "grp", "fz group msg"): str,
      ("Exclusive", "g1", "grp", "fz group msg"): "blue"},
     {"k0": {"n0": ["Hello World", "off"],
             "n1": {"n0": {"Hello World", "no", "a"}, "n1": "x@y.com"}},
      "k1": [" pad ", "abcdef"], "k2": [[3], [49]], "g0": "ab"}),
]

# (schema spec, schema kwargs, docs...) — policy/flag cases
KW_CASES = [
    # Maybe's inner dict sub-compiles with required=False even when the
    # outer schema is required=True (validators.py:259-267: the
    # combinator overwrites schema.required with its OWN default)
    ({"m": ("Maybe", {"x": int})}, {"required": True},
     {"m": {}}, {"m": {"x": 1}}),
    # fuzz seed 9407: set container-class gates reinstate through Maybe
    # inners too ('expected a set' on a list under Maybe({...{str}...}))
    ({"k0": ("Maybe", {"n0": ("Equal", "abcdef"), "n1": {str}}),
      "k1": ("Email",),
      ("Optional", "k2", None, "x@y.com"): str},
     {"extra": 1},
     {"k0": {"n0": "", "n1": ["off", "zebra"]}, "k1": "x@",
      "zz_extra": "Hello World"},
     {"k0": {"n0": "abcdef", "n1": {"off", "zebra"}}, "k1": "x@y.com"}),
    # fuzz seeds 4300/4328: required=True makes a WILDCARD key ({str: v})
    # itself required — an empty nested map errors with the key schema as
    # the final path component (schema_builder.py:398-405)
    ({"k1": {"n0": ("Equal", 0.0), "n1": {str: ("Length", 2, 6)}}},
     {"required": True},
     {"k1": {"n0": 100.0, "n1": {}}}, {"k1": {"n0": 0.0, "n1": {"ab": "abc"}}}),
    ({"k0": {str: int}}, {"required": True}, {"k0": {}}, {"k0": {"a": 1}}),
    # marker-wrapped wildcards: Required(str) demands a match even without
    # required=True; Optional(str) never does; path renders the INNER
    # schema (reference Marker repr)
    ({("Required", str): int}, {}, {}, {"a": 1}),
    ({("Optional", str): int}, {}, {}),
    ({"k": {("Required", str): int}}, {}, {"k": {}}, {"k": {"a": 2}}),
    ({"a": int}, {"extra": 1}, {"a": 3, "zzz": "keep"}),
    # Remove fall-through under ALLOW_EXTRA (fuzz seed 5032): a failing
    # value keeps the key with its RAW value; a passing value removes it
    ({("Remove", "k"): ("Range", 0, 10), "a": int}, {"extra": 1},
     {"k": 5, "a": 3}, {"k": 99, "a": 3}),
    ({("Remove", "k"): {"n": ("Range", 0, 10)}, "a": int}, {"extra": 1},
     {"k": {"n": 99}, "a": 3}, {"k": {"n": 3}, "a": 3}),
    ({"a": int}, {"extra": 0}, {"a": 3, "zzz": "nope"}),
    ({"a": int, "b": str}, {"required": True}, {"a": 3}),
    ({"a": int}, {"extra": 2}, {"a": 3, "zzz": "drop"}),
    ({"a": int, ("Optional", "b"): str}, {"required": True}, {"a": 3}),
    # Any over key NAMES combined with each extra policy
    # (tests.py:1754-1843): matching keys validate; non-matching keys
    # follow the policy ('not a valid value' under PREVENT)
    ({("Any", "name", "area"): str, "domain": str}, {"extra": 1},
     {"name": "one", "domain": "two", "additional_key": "extra"}),
    ({("Any", "name", "area"): str, "domain": str}, {"extra": 2},
     {"name": "one", "domain": "two", "additional_key": "extra"}),
    ({("Any", "name", "area"): str, "domain": str}, {"extra": 0},
     {"name": "one", "domain": "two", "additional_key": "extra"}),
    # group-check precedence (fuzz seeds 6015/6025/6037/6050): a failing
    # Exclusive/Inclusive group suppresses ALL mapping errors — the
    # reference raises them BEFORE mapping validation runs
    # (schema_builder.py:530-571)
    ({"k0": ("Equal", 10),
      ("Exclusive", "g0", "grp"): ("Length", 1, 4),
      ("Exclusive", "g1", "grp"): ("Equal", 1)}, {},
     {"k0": 0, "g0": "no", "g1": 10},
     {"k0": 0, "g0": "toolongvalue"},
     {"k0": 10, "g0": "ab"}),
    # inclusive reports only the FIRST failing group (the loop breaks
    # after one error, schema_builder.py:556-567)
    ({"k0": ("Equal", 10),
      ("Inclusive", "a0", "ga"): int, ("Inclusive", "a1", "ga"): int,
      ("Inclusive", "b0", "gb"): int, ("Inclusive", "b1", "gb"): int},
     {},
     {"k0": 0, "a0": 1, "b0": 2},
     {"k0": 0, "a0": 1, "a1": 2, "b0": 3}),
    # outer required=True does NOT thread into Any dict branches: the
    # combinator's OWN required kwarg governs sub-compiles
    # (validators.py:259-267; fuzz seed 6101)
    ({"k0": ("IsTrue",),
      ("Optional", "k1"): ("Any", {"b0": str, "b1": ("Match", "^ab")},
                           {"b0": ("In", [-5, 4, 99]), "b1": 100})},
     {"required": True},
     {"k0": 4, "k1": {"b1": "blue"}}, {"k1": {"b0": 3}}),
    # Remove-keyed combinator-over-dict value (fuzz seed 6117): passing
    # value removes the key, failing value falls through to extra policy
    ({("Remove", "k1"): ("UnionDisc",
                         {"tag": "a", "val": ("Match", "[0-9]+$")},
                         {"tag": "b", "val": ("In", ["no", "abcdef"])}),
      "k0": float}, {"extra": 0, "required": True},
     {"k0": 49.5, "k1": {"tag": "b", "val": "no"}},
     {"k0": 0.0, "k1": {"tag": "b", "val": "ab"}}),
]


def _run_ref(ref, spec, doc, **kw):
    schema = ref.Schema(_mk(ref, spec), **kw)
    try:
        return ("ok", schema(dict(doc)))
    except ref.MultipleInvalid as e:
        return ("err", sorted(str(x) for x in e.errors))
    except ref.Invalid as e:
        return ("err", [str(e)])


def _run_engine(spark, spec, doc, **kw):
    schema = vs.Schema(_mk(vs, spec), **kw)
    try:
        return ("ok", schema(dict(doc), spark=spark))
    except vse.MultipleInvalid as e:
        return ("err", sorted(str(x) for x in e.errors))
    except vse.Invalid as e:
        return ("err", [str(e)])


@pytest.mark.parametrize("case", CASES, ids=lambda c: repr(c[0])[:60])
def test_differential_parity(spark, ref, case):
    spec, *docs = case
    for doc in docs:
        expected = _run_ref(ref, spec, doc)
        got = _run_engine(spark, spec, doc)
        if expected[0] == "ok":
            assert got[0] == "ok", (doc, got)
            assert _eq(got[1], expected[1]), (doc, got[1], expected[1])
        else:
            assert got == expected, (doc, got, expected)


@pytest.mark.parametrize(
    "case", KW_CASES, ids=lambda c: repr((c[0], c[1]))[:60]
)
def test_differential_parity_flags(spark, ref, case):
    spec, kw, *docs = case
    for doc in docs:
        expected = _run_ref(ref, spec, doc, **kw)
        got = _run_engine(spark, spec, doc, **kw)
        if expected[0] == "ok":
            assert got[0] == "ok", (doc, got)
            assert _eq(got[1], expected[1]), (doc, got[1], expected[1])
        else:
            assert got == expected, (doc, got, expected)


def test_someof_custom_msg(spark, ref):
    """SomeOf(msg=...) overrides the joined sub-error message
    (validators.py:1256-1262); regression: the kwarg was silently dropped
    by a class-attribute mask."""
    rs = ref.Schema({"x": ref.SomeOf(
        [ref.Range(0, 2), ref.Range(50, 100)], min_valid=2, msg="need both")})
    es = vs.Schema({"x": vs.SomeOf(
        [vs.Range(0, 2), vs.Range(50, 100)], min_valid=2, msg="need both")})
    try:
        rs({"x": 1})
        expected = None
    except ref.MultipleInvalid as exc:
        expected = sorted(str(x) for x in exc.errors)
    try:
        es({"x": 1}, spark=spark)
        got = None
    except vse.MultipleInvalid as exc:
        got = sorted(str(x) for x in exc.errors)
    assert expected is not None and got == expected


def _eq(a, b):
    """Structural equality where NaN == NaN and set==list-of-same (a Row
    round-trip returns lists for the set carrier)."""
    import math

    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple, set, frozenset)) and isinstance(
        b, (list, tuple, set, frozenset)
    ):
        la, lb = sorted(a, key=repr), sorted(b, key=repr)
        return len(la) == len(lb) and all(
            _eq(x, y) for x, y in zip(la, lb)
        )
    return a == b
