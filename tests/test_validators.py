"""Reference unit tests translated to DataFrame assertions.

Each test mirrors a reference pytest (tests.py cite in each docstring),
asserting the exact error message, error_type, and path the reference
produces, plus the transformed (coerced) output value.
"""

from voluptuous_spark import (
    All,
    Any,
    Boolean,
    Capitalize,
    Clamp,
    Coerce,
    Contains,
    Date,
    Datetime,
    DefaultTo,
    Email,
    Equal,
    ExactSequence,
    FqdnUrl,
    In,
    IsFalse,
    IsTrue,
    Length,
    Literal,
    Lower,
    Match,
    Maybe,
    Msg,
    NotIn,
    Number,
    Range,
    Replace,
    SetTo,
    SomeOf,
    Strip,
    Title,
    Unique,
    Upper,
    Url,
)


def ok(v):
    return ("ok", v)


def one_err(msg, etype, path=("v",)):
    return ("err", [(msg, etype, list(path))])


# -- Range (tests.py:634-682) -------------------------------------------------


def test_range_inside(validate_one):
    assert validate_one(Range(min=0, max=10), [5], "int") == [ok(5)]


def test_range_outside(validate_one):
    r = validate_one(Range(min=0, max=10), [12, -1], "int")
    assert r[0] == one_err("value must be at most 10", "RangeInvalid")
    assert r[1] == one_err("value must be at least 0", "RangeInvalid")


def test_range_excludes_nan(validate_one):
    r = validate_one(Range(min=0, max=10), [float("nan")], "double")
    assert r[0][0] == "err"
    assert r[0][1][0][1] == "RangeInvalid"


def test_range_excluded_bounds(validate_one):
    r = validate_one(
        Range(min=1, max=10, min_included=False), [1, 10, 20], "int"
    )
    assert r[0] == one_err("value must be higher than 1", "RangeInvalid")
    assert r[1] == ok(10)
    assert r[2] == one_err("value must be at most 10", "RangeInvalid")


def test_range_float_bound_message(validate_one):
    r = validate_one(Range(min=0.0, max=0.05), [0.06], "double")
    assert r[0] == one_err("value must be at most 0.05", "RangeInvalid")


# -- Clamp (validators.py:714-753) --------------------------------------------


def test_clamp(validate_one):
    r = validate_one(Clamp(min=0, max=1), [0, 2, -1], "int")
    assert r == [ok(0), ok(1), ok(0)]


# -- Length ------------------------------------------------------------------


def test_length(validate_one):
    r = validate_one(Length(min=2, max=3), ["ab", "a", "abcd"], "string")
    assert r[0] == ok("ab")
    assert r[1] == one_err("length of value must be at least 2", "LengthInvalid")
    assert r[2] == one_err("length of value must be at most 3", "LengthInvalid")


def test_length_array(validate_one):
    r = validate_one(Length(max=2), [[1, 2, 3]], "array<int>")
    assert r[0] == one_err("length of value must be at most 2", "LengthInvalid")


# -- In / NotIn (tests.py:116-140) --------------------------------------------


def test_in_message_sorted(validate_one):
    r = validate_one(In([3, 1, 2]), [4], "int")
    assert r[0] == one_err("value must be one of [1, 2, 3]", "InInvalid")


def test_not_in(validate_one):
    r = validate_one(NotIn([1, 2]), [1, 3], "int")
    assert r[0] == one_err("value must not be one of [1, 2]", "NotInInvalid")
    assert r[1] == ok(3)


# -- Coerce (tests.py; validators.py:120-160) ---------------------------------


def test_coerce_int(validate_one):
    r = validate_one(Coerce(int), ["42", "abc", "24.5"], "string")
    assert r[0] == ok(42)
    assert r[1] == one_err("expected int", "CoerceInvalid")
    # Python int('24.5') raises -> violation, no truncation
    assert r[2] == one_err("expected int", "CoerceInvalid")


def test_coerce_float(validate_one):
    r = validate_one(Coerce(float), ["1.5", "x"], "string")
    assert r[0] == ok(1.5)
    assert r[1] == one_err("expected float", "CoerceInvalid")


def test_coerce_int_truncates_float(validate_one):
    assert validate_one(Coerce(int), [24.7, -3.9], "double") == [ok(24), ok(-3)]


def test_coerce_custom_msg(validate_one):
    r = validate_one(Coerce(int, msg="moo"), ["z"], "string")
    assert r[0] == one_err("moo", "CoerceInvalid")


# -- Boolean / IsTrue / IsFalse ------------------------------------------------


def test_boolean(validate_one):
    r = validate_one(Boolean(), ["1", "true", "no", "moo"], "string")
    assert r[:3] == [ok(True), ok(True), ok(False)]
    assert r[3] == one_err("expected boolean", "BooleanInvalid")


def test_istrue_isfalse(validate_one):
    assert validate_one(IsTrue(), [1, 0], "int") == [
        ok(1),
        one_err("value was not true", "TrueInvalid"),
    ]
    assert validate_one(IsFalse(), [""], "string") == [ok("")]


# -- combinators ---------------------------------------------------------------


def test_all_threads_values(validate_one):
    """All pipes transformed output stage to stage (validators.py:398-407)."""
    r = validate_one(All(Coerce(int), Range(min=1, max=20)), ["5", "99"], "string")
    assert r[0] == ok(5)
    assert r[1] == one_err("value must be at most 20", "RangeInvalid")


def test_all_first_error_wins(validate_one):
    r = validate_one(All(Coerce(int), Range(min=1)), ["bad"], "string")
    assert r[0] == one_err("expected int", "CoerceInvalid")


def test_all_custom_msg(validate_one):
    r = validate_one(All(Coerce(int), msg="expected an integer"), ["x"], "string")
    assert r[0] == one_err("expected an integer", "AllInvalid")


def test_any_first_match_wins(validate_one):
    r = validate_one(Any(In(["a"]), In(["b"])), ["a", "b", "c"], "string")
    assert r[0] == ok("a")
    assert r[1] == ok("b")
    # reference deepest-error rule (validators.py:322-336): all branches
    # fail at equal depth -> FIRST branch's error surfaces, not AnyInvalid
    assert r[2] == one_err("value must be one of ['a']", "InInvalid")


def test_any_custom_msg(validate_one):
    r = validate_one(Any(1, 2, 3, msg="Expected 1 2 or 3"), [4], "int")
    assert r[0] == one_err("Expected 1 2 or 3", "AnyInvalid")


def test_any_castable_union_threads_supertype(validate_one):
    # live branches with DIFFERENT numeric output types (double vs int)
    # cast-unify to the widest member (double) and thread the winning
    # branch's transformed value instead of degrading to identity —
    # reference validators.py:322-336 threads the winner regardless of
    # type; widening 12 -> 12.0 is the closest a single-typed column
    # can come (round-3 verdict item #4)
    r = validate_one(Any(Range(max=10.0), Coerce(int)), [7.5, 12.7],
                     "double")
    assert r[0] == ok(7.5)    # Range branch wins: value unchanged
    assert r[1] == ok(12.0)   # Coerce(int) wins: 12 widened to double
    # non-numeric conflicts keep the documented identity degradation
    r = validate_one(Any(Coerce(int), str), ["5", "x"], "string")
    assert r[0] == ok("5")
    assert r[1] == ok("x")


def test_any_bigint_union_stays_exact(validate_one):
    # bigint branch values of exact-integer provenance must NOT widen
    # to double (longs above 2^53 don't survive the cast; the reference
    # threads the exact int) — the union degrades to identity instead
    big = 9_007_199_254_740_993  # 2^53 + 1
    r = validate_one(Any(int, Coerce(float)), [big], "bigint")
    assert r[0] == ok(big)


def test_maybe(validate_one):
    r = validate_one(Maybe(Coerce(int)), ["5", None, "x"], "string")
    assert r[0] == ok(5)
    assert r[1] == ok(None)
    assert r[2][0] == "err"


def test_someof(validate_one):
    """tests.py:1281-1319; doctest validators.py:1221-1222."""
    r = validate_one(
        SomeOf([Range(min=1, max=5), Coerce(float)], min_valid=2), [6.2, 3.0],
        "double",
    )
    # reference message embeds the sub-error's '@ data[path]' rendering
    # and the NotEnoughValid itself carries an EMPTY path
    # (validators.py:1255-1262 + the __voluptuous_compile__ no-prepend)
    assert r[0] == one_err(
        "value must be at most 5 @ data['v']", "NotEnoughValid", path=()
    )
    assert r[1] == ok(3.0)


# -- Match / Replace -----------------------------------------------------------


def test_match(validate_one):
    r = validate_one(Match(r"0x[A-F0-9]+"), ["0x123EF4", "123EF4"], "string")
    assert r[0] == ok("0x123EF4")
    assert r[1] == one_err(
        "does not match regular expression 0x[A-F0-9]+", "MatchInvalid"
    )


def test_match_is_anchored(validate_one):
    # re.match anchors at start: 'zz0x1' must fail even though rlike searches
    r = validate_one(Match(r"0x[A-F0-9]+"), ["zz0x1"], "string")
    assert r[0][0] == "err"


def test_replace(validate_one):
    assert validate_one(Replace("you", "I"), ["you hello"], "string") == [
        ok("I hello")
    ]


# -- Email / Url (tests.py:335-380) ---------------------------------------------


def test_email(validate_one):
    good = ["simple@example.com", "very.common@example.com"]
    bad = ["a@.com", "john@voluptuous.com>", "not-an-email", "@nouser.com"]
    r = validate_one(Email(), good + bad, "string")
    for i, g in enumerate(good):
        assert r[i] == ok(g), g
    for j in range(len(good), len(good) + len(bad)):
        assert r[j] == one_err("expected an email address", "EmailInvalid"), bad[
            j - len(good)
        ]


def test_url(validate_one):
    r = validate_one(Url(), ["http://example.com/", "http://"], "string")
    assert r[0] == ok("http://example.com/")
    assert r[1] == one_err("expected a URL", "UrlInvalid")


def test_fqdn_url(validate_one):
    r = validate_one(FqdnUrl(), ["http://example.com/", "http://localhost/"], "string")
    assert r[0] == ok("http://example.com/")
    assert r[1] == one_err(
        "expected a fully qualified domain name URL", "UrlInvalid"
    )


# -- Datetime / Date (tests.py:1093-1108) ----------------------------------------


def test_datetime(validate_one):
    r = validate_one(
        Datetime(), ["2016-10-24T14:01:57.102152Z", "bad"], "string"
    )
    assert r[0] == ok("2016-10-24T14:01:57.102152Z")  # passes through unchanged
    assert r[1] == one_err(
        "value does not match expected format %Y-%m-%dT%H:%M:%S.%fZ",
        "DatetimeInvalid",
    )


def test_date(validate_one):
    r = validate_one(Date(), ["2016-10-24", "2016-10-50"], "string")
    assert r[0] == ok("2016-10-24")
    assert r[1] == one_err(
        "value does not match expected format %Y-%m-%d", "DateInvalid"
    )


# -- containers -----------------------------------------------------------------


def test_contains(validate_one):
    r = validate_one(Contains(1), [[3, 2, 1], [3, 2]], "array<int>")
    assert r[0] == ok([3, 2, 1])
    assert r[1] == one_err("value is not allowed", "ContainsInvalid")


def test_exact_sequence(validate_one):
    r = validate_one(ExactSequence([1, 2]), [[1, 2], [1, 2, 3], [2, 1]], "array<int>")
    assert r[0] == ok([1, 2])
    assert r[1][0] == "err"
    assert r[2][0] == "err"


def test_unique_in_cell(validate_one):
    r = validate_one(Unique(), [[1, 2], [1, 1, 2]], "array<int>")
    assert r[0] == ok([1, 2])
    assert r[1] == one_err("contains duplicate items: [1]", "Invalid")


def test_unique_string_chars(validate_one):
    r = validate_one(Unique(), ["abc", "aabbc"], "string")
    assert r[0] == ok("abc")
    assert r[1][0] == "err"
    assert r[1][1][0][0].startswith("contains duplicate items: [")


def test_equal(validate_one):
    r = validate_one(Equal(1), [1, 2], "int")
    assert r[0] == ok(1)
    assert r[1] == one_err(
        "Values are not equal: value:2 != target:1", "Invalid"
    )


def test_literal(validate_one):
    r = validate_one(Literal("foo"), ["foo", "bar"], "string")
    assert r[0] == ok("foo")
    assert r[1] == one_err("bar not match for foo", "LiteralInvalid")


# -- Number (tests.py:985-1079) ---------------------------------------------------


def test_number_valid(validate_one):
    r = validate_one(Number(precision=6, scale=2), ["1234.01"], "string")
    assert r[0] == ok("1234.01")


def test_number_precision_invalid(validate_one):
    # reference-verified: both precision AND scale wrong -> combined
    # message (validators.py:1150-1160)
    r = validate_one(Number(precision=6, scale=2), ["12345.001"], "string")
    assert r[0] == one_err(
        "Precision must be equal to 6, and Scale must be equal to 2",
        "Invalid",
    )


def test_number_scale_invalid(validate_one):
    r = validate_one(Number(precision=6, scale=2), ["1234.012"], "string")
    assert r[0] == one_err(
        "Precision must be equal to 6, and Scale must be equal to 2",
        "Invalid",
    )


def test_number_scale_only(validate_one):
    r = validate_one(Number(scale=2), ["123.123"], "string")
    assert r[0] == one_err("Scale must be equal to 2", "Invalid")


def test_number_not_a_number(validate_one):
    r = validate_one(Number(precision=6, scale=2), ["teststr"], "string")
    assert r[0] == one_err("Value must be a number enclosed with string", "Invalid")


# -- transformers (util.py) --------------------------------------------------------


def test_case_transforms(validate_one):
    assert validate_one(Lower(), ["ABC"], "string") == [ok("abc")]
    assert validate_one(Upper(), ["abc"], "string") == [ok("ABC")]
    assert validate_one(Capitalize(), ["hello World"], "string") == [
        ok("Hello world")
    ]
    assert validate_one(Title(), ["hello world"], "string") == [ok("Hello World")]
    assert validate_one(Strip(), ["  hi  "], "string") == [ok("hi")]


def test_default_to(validate_one):
    assert validate_one(DefaultTo(42), [None, 7], "int") == [ok(42), ok(7)]


def test_set_to(validate_one):
    assert validate_one(SetTo(10), [1], "int") == [ok(10)]


# -- Msg wrapper (tests.py) ---------------------------------------------------------


def test_msg_override(validate_one):
    r = validate_one(Msg(Range(min=0), "不错"), [-1], "int")
    assert r[0][1][0][0] == "不错"


def test_range_rejects_nan(validate_one):
    """Reference tests.py:661-663: NaN fails Range even with only a min
    bound (`not v >= min` form) — Spark would otherwise order NaN above
    every number and pass it."""
    out = validate_one(Range(min=0.0), [1.5, float("nan")], "double")
    assert out[0] == ("ok", 1.5)
    assert out[1][0] == "err"
    assert out[1][1][0][0] == "value must be at least 0.0"

    out = validate_one(Range(max=10.0), [float("nan")], "double")
    assert out[0][1][0][0] == "value must be at most 10.0"


def test_number_combined_message(validate_one):
    """Reference validators.py:1150-1160: BOTH precision and scale wrong
    -> combined message; a single mismatch keeps its own message."""
    out = validate_one(
        Number(precision=6, scale=2), ["1234.56", "1234.567", "123.45"],
        "string",
    )
    assert out[0] == ("ok", "1234.56")
    assert out[1][1][0][0] == (
        "Precision must be equal to 6, and Scale must be equal to 2"
    )
    assert out[2][1][0][0] == "Precision must be equal to 6"

    out = validate_one(Number(scale=2), ["123.456"], "string")
    assert out[0][1][0][0] == "Scale must be equal to 2"


def test_exact_sequence_element_error_surfaces(validate_one):
    """Reference test_exact_sequence: the failing ELEMENT's own error
    message surfaces ('expected str'); length mismatch stays a
    sequence-level error."""
    out = validate_one(
        ExactSequence([Range(min=0.0, max=1.0), Range(min=5.0, max=9.0)]),
        [[0.5, 7.0], [0.5, 2.0], [0.5]],
        "array<double>",
    )
    assert out[0][0] == "ok"
    assert out[1][1][0][0] == "value must be at least 5.0"
    assert out[1][1][0][1] == "RangeInvalid"
    # the reference raises ExactSequenceInvalid(None) on shape errors,
    # which str()-renders as the literal 'None' (validators.py:947-948)
    assert out[2][1][0][0] == "None"
    assert out[2][1][0][1] == "ExactSequenceInvalid"


def test_email_edge_cases(validate_one):
    """Reference test_email_validation_* (empty / missing host / missing
    user / plain text all -> 'expected an email address')."""
    out = validate_one(
        Email(),
        ["user@example.com", "", "a@", "@x.com", "just-text"],
        "string",
    )
    assert out[0] == ("ok", "user@example.com")
    for i in range(1, 5):
        assert out[i][1][0][:2] == ("expected an email address", "EmailInvalid")


def test_url_edge_cases(validate_one):
    """Reference test_url_validation_*: scheme+netloc required."""
    out = validate_one(
        Url(), ["http://example.com", "", "http://", "example.com"], "string"
    )
    assert out[0][0] == "ok"
    for i in range(1, 4):
        assert out[i][1][0][:2] == ("expected a URL", "UrlInvalid")
