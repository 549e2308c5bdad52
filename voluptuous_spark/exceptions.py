"""Driver-side exception API mirroring the reference error surface.

The engine represents violations as *data* (rows; see ``errors.py``) because
at 10^12 rows exceptions cannot cross executor boundaries. But a user of the
reference (``/root/reference/voluptuous/error.py:15-219``) also interacts
with real exception classes — ``try/except MultipleInvalid``, typed
subclasses, ``humanize_error`` — so this module provides the same hierarchy
driver-side, plus bridges that convert a violations DataFrame into
exceptions (``raise_if_invalid``) and render humanized reports
(``humanize_error``).

Class set and semantics match ``error.py``:
- ``Invalid(message, path, error_message, error_type)`` with ``msg``,
  ``path``, ``error_message`` properties, ``prepend``, and
  ``__str__ = "<msg>[ for <error_type>] @ data['k'][0]"`` (error.py:49-54)
- ``MultipleInvalid`` — a collection surfacing its first error
  (error.py:60-87)
- the ~30 typed subclasses (error.py:90-219), names preserved exactly so
  ``type(e).__name__`` round-trips through the ``error_type`` column.

Attribution: the class hierarchy in the first half of this module
deliberately reproduces the public exception API of voluptuous
(https://github.com/alecthomas/voluptuous, BSD 3-Clause license,
Copyright (c) Alec Thomas) — class names, docstrings, and
``Invalid.__str__``/``MultipleInvalid`` behavior — so ``error_type``
strings and ``str(exc)`` round-trip exactly for users migrating from the
reference. The second half (``invalid_from_row``, ``raise_if_invalid``,
``humanize_error_rows``, ``raises``) is original Spark bridging.
"""

from __future__ import annotations

import typing
from contextlib import contextmanager

MAX_VALIDATION_ERROR_ITEM_LENGTH = 500  # humanize.py:10


class Error(Exception):
    """Base validation exception (error.py:7-8)."""


class SchemaError(Error):
    """An error was encountered in the schema (error.py:11-12)."""


class Invalid(Error):
    """The data was invalid (error.py:15-57)."""

    def __init__(
        self,
        message: str,
        path: typing.Optional[list] = None,
        error_message: typing.Optional[str] = None,
        error_type: typing.Optional[str] = None,
    ) -> None:
        Error.__init__(self, message)
        self._path = path or []
        self._error_message = error_message or message
        self.error_type = error_type

    @property
    def msg(self) -> str:
        return self.args[0]

    @property
    def path(self) -> list:
        return self._path

    @property
    def error_message(self) -> str:
        return self._error_message

    def __str__(self) -> str:
        path = (
            ' @ data[%s]' % ']['.join(map(repr, self.path))
            if self.path
            else ''
        )
        output = Exception.__str__(self)
        if self.error_type:
            output += ' for ' + self.error_type
        return output + path

    def prepend(self, path: list) -> None:
        self._path = path + self.path


class MultipleInvalid(Invalid):
    """Flat collection of Invalids; surfaces the first (error.py:60-87)."""

    def __init__(self, errors: typing.Optional[list] = None) -> None:
        self.errors = errors[:] if errors else []

    def __repr__(self) -> str:
        return 'MultipleInvalid(%r)' % self.errors

    @property
    def msg(self) -> str:
        return self.errors[0].msg

    @property
    def path(self) -> list:
        return self.errors[0].path

    @property
    def error_message(self) -> str:
        return self.errors[0].error_message

    def add(self, error: Invalid) -> None:
        self.errors.append(error)

    def __str__(self) -> str:
        return str(self.errors[0])

    def prepend(self, path: list) -> None:
        for error in self.errors:
            error.prepend(path)


# Typed subclasses (error.py:90-219) — names are the error_type enum.
class RequiredFieldInvalid(Invalid):
    """Required field was missing."""


class ObjectInvalid(Invalid):
    """The value we found was not an object."""


class DictInvalid(Invalid):
    """The value found was not a dict."""


class ExclusiveInvalid(Invalid):
    """More than one value found in exclusion group."""


class InclusiveInvalid(Invalid):
    """Not all values found in inclusion group."""


class SequenceTypeInvalid(Invalid):
    """The type found is not a sequence type."""


class TypeInvalid(Invalid):
    """The value was not of required type."""


class ValueInvalid(Invalid):
    """The value was found invalid by evaluation function."""


class ContainsInvalid(Invalid):
    """List does not contain item."""


class ScalarInvalid(Invalid):
    """Scalars did not match."""


class CoerceInvalid(Invalid):
    """Impossible to coerce value to type."""


class AnyInvalid(Invalid):
    """The value did not pass any validator."""


class AllInvalid(Invalid):
    """The value did not pass all validators."""


class MatchInvalid(Invalid):
    """The value does not match the given regular expression."""


class RangeInvalid(Invalid):
    """The value is not in given range."""


class TrueInvalid(Invalid):
    """The value is not True."""


class FalseInvalid(Invalid):
    """The value is not False."""


class BooleanInvalid(Invalid):
    """The value is not a boolean."""


class UrlInvalid(Invalid):
    """The value is not a URL."""


class EmailInvalid(Invalid):
    """The value is not an email address."""


class FileInvalid(Invalid):
    """The value is not a file."""


class DirInvalid(Invalid):
    """The value is not a directory."""


class PathInvalid(Invalid):
    """The value is not a path."""


class LiteralInvalid(Invalid):
    """The literal values do not match."""


class LengthInvalid(Invalid):
    pass


class DatetimeInvalid(Invalid):
    """The value is not a formatted datetime string."""


class DateInvalid(Invalid):
    """The value is not a formatted date string."""


class InInvalid(Invalid):
    pass


class NotInInvalid(Invalid):
    pass


class ExactSequenceInvalid(Invalid):
    pass


class NotEnoughValid(Invalid):
    """The value did not pass enough validations."""

    pass


class TooManyValid(Invalid):
    """The value passed more than expected validations."""

    pass


_BY_NAME = {
    c.__name__: c
    for c in list(globals().values())
    if isinstance(c, type) and issubclass(c, Invalid)
}


def _register_invalid_subclass(cls):
    """User-defined Invalid subclasses (tests.md: 'subclasses of Invalid
    are raised as is' — a custom callable raising SpecialInvalid must
    surface as SpecialInvalid from the driver bridge) register by name so
    ``invalid_from_row`` reconstructs the exact class."""
    _BY_NAME.setdefault(cls.__name__, cls)


Invalid.__init_subclass__ = classmethod(
    lambda cls, **kw: _register_invalid_subclass(cls)
)


class VirtualPathComponent(str):
    """Group-check path component (reference schema_builder.py:963-968):
    renders WITHOUT quotes — str(e) gives "... @ data[<group>]"."""

    def __repr__(self):  # pragma: no cover - trivial
        return str(self)


def invalid_from_row(row) -> Invalid:
    """Build a typed Invalid from one violations-DataFrame row
    (columns path/message/error_type as produced by
    ``ValidationResult.violations``). Path components that look like ints
    are restored to ints so ``repr`` in ``__str__`` matches the reference."""
    cls = _BY_NAME.get(row["error_type"], Invalid)

    def _component(p):
        if isinstance(p, str) and p.lstrip('-').isdigit():
            return int(p)
        if isinstance(p, str) and p.startswith('<') and p.endswith('>'):
            return VirtualPathComponent(p)  # group marker: repr is bare
        if isinstance(p, str) and p.startswith('Any(') and p.endswith(')'):
            return VirtualPathComponent(p)  # complex-Required marker
        return p

    path = [_component(p) for p in (row["path"] or [])]
    if cls is MultipleInvalid:  # never stored, but stay safe
        cls = Invalid
    e = cls(row["message"], path=path)
    # ``Invalid.error_type`` is the mapping CONTEXT ('dictionary value'),
    # set by the dict compiler in the reference (schema_builder.py:370) —
    # NOT the class name; the violations DataFrame carries it as ``ctx``
    try:
        e.error_type = row["ctx"]
    except (KeyError, ValueError):
        e.error_type = None
    return e


def raise_if_invalid(result, limit: int = 1000) -> None:
    """Bridge: collect up to ``limit`` violation rows from a
    ``ValidationResult`` (or violations DataFrame) and raise
    ``MultipleInvalid`` exactly as ``Schema.__call__`` does in the
    reference (schema_builder.py:406-409). No-op when everything passed.

    The limit keeps the driver safe at 10^12-row scale — a full collect of
    violations belongs in a sink, not an exception.
    """
    df = getattr(result, "violations", result)
    if not hasattr(df, "limit"):  # ValidationResult.violations is a property
        df = result.violations
    rows = df.limit(limit).collect()
    if rows:
        raise MultipleInvalid([invalid_from_row(r) for r in rows])


def humanize_error_rows(rows, max_sub_error_length: int = MAX_VALIDATION_ERROR_ITEM_LENGTH) -> str:
    """Driver-side ``humanize_error`` (humanize.py:26-48) over collected
    violation rows: one sorted line per error, ``"<rendered>. Got <repr>"``
    with the offending repr truncated to ``max_sub_error_length``."""
    lines = []
    for r in rows:
        off = r["offending"] if r["offending"] is not None else "None"
        if len(off) > max_sub_error_length:
            off = off[: max_sub_error_length - 3] + '...'
        lines.append('%s. Got %s' % (invalid_from_row(r), off))
    return '\n'.join(sorted(lines))


@contextmanager
def raises(exc, msg: typing.Optional[str] = None, regex=None):
    """Assert-raising context manager (schema_builder.py:54-67) so tests
    written against the reference API run unchanged."""
    def _check(e):
        if msg is not None:
            assert str(e) == msg, '%r != %r' % (str(e), msg)
        if regex is not None:
            import re

            assert re.search(regex, str(e)), '%r does not match %r' % (
                str(e),
                regex,
            )

    try:
        yield
    except exc as e:
        _check(e)
    except MultipleInvalid as e:
        # the engine's document paths always wrap errors in
        # MultipleInvalid (schema_builder.py:206-209 does the same at the
        # Schema level); a raises(TypedInvalid, ...) against a single
        # wrapped error of that type matches the reference's direct-
        # validator-call behavior (e.g. SomeOf raising TooManyValid,
        # validators.py:1244-1247)
        if not (len(e.errors) == 1 and isinstance(e.errors[0], exc)):
            raise
        _check(e)
    else:
        raise AssertionError('%s not raised' % getattr(exc, "__name__", exc))
