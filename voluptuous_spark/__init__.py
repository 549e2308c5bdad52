"""voluptuous_spark — a PySpark-native schema + constraint validation engine.

Brand-new engine with the query/data-processing capabilities of the
reference library alecthomas/voluptuous (``/root/reference``), re-expressed
Spark-first: declarative voluptuous-style Schema DSL compiled into
vectorized Catalyst Column predicates, Arrow-batch (pandas UDF) content
validators, plus the table-level checks a 10^12-row audio+transcript
pipeline needs (column stats, uniqueness, referential integrity,
distribution drift, per-partition pass/fail reports, checkpoint/resume).
"""

from .dsl import (  # noqa: F401
    ALLOW_EXTRA,
    PREVENT_EXTRA,
    REMOVE_EXTRA,
    UNDEFINED,
    All,
    And,
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
    Exclusive,
    Extra,
    FqdnUrl,
    In,
    Inclusive,
    IsFalse,
    IsTrue,
    Length,
    Literal,
    Lower,
    Marker,
    Match,
    Maybe,
    Msg,
    NotIn,
    Number,
    Optional,
    Or,
    PandasValidator,
    Range,
    Remove,
    Replace,
    Required,
    Set,
    SetTo,
    SomeOf,
    Strip,
    Switch,
    Title,
    Union,
    Unique,
    Unordered,
    UnsupportedSchema,
    Upper,
    Url,
    Validator,
    compile_validator,
)
from .dsl import (  # noqa: F401
    CallableValidator,
    IsDir,
    IsFile,
    Object,
    PathExists,
    Self,
    message,
    truth,
)
from .errors import ERROR_TYPES, VIOLATION_SCHEMA  # noqa: F401
from .exceptions import (  # noqa: F401
    AllInvalid,
    AnyInvalid,
    BooleanInvalid,
    CoerceInvalid,
    ContainsInvalid,
    DateInvalid,
    DatetimeInvalid,
    DictInvalid,
    DirInvalid,
    EmailInvalid,
    Error,
    ExactSequenceInvalid,
    ExclusiveInvalid,
    FalseInvalid,
    FileInvalid,
    InInvalid,
    InclusiveInvalid,
    Invalid,
    LengthInvalid,
    LiteralInvalid,
    MatchInvalid,
    MultipleInvalid,
    NotEnoughValid,
    NotInInvalid,
    ObjectInvalid,
    PathInvalid,
    RangeInvalid,
    RequiredFieldInvalid,
    ScalarInvalid,
    SchemaError,
    SequenceTypeInvalid,
    TooManyValid,
    TrueInvalid,
    TypeInvalid,
    UrlInvalid,
    ValueInvalid,
    humanize_error_rows,
    raise_if_invalid,
    raises,
)
from .schema import Schema, ValidationResult, validate  # noqa: F401

# reference-compat aliases (voluptuous/__init__.py exports these names)
import re as _re
import typing as _typing

Undefined = UNDEFINED
basestring = str
primitive_types = (bool, bytes, int, str, float)

# validators.py:65-91 — the exact reference email regexes (Python form; the
# Email validator uses a Java-regex-safe translation for rlike)
USER_REGEX = _re.compile(
    # start anchor  dot-atom
    r"^(?P<dot_atom>[-!#$%&'*+/=?^_`{}|~0-9A-Z]+(\.[-!#$%&'*+/=?^_`{}|~0-9A-Z]+)*"
    # quoted-string
    r"""|(?P<quoted_string>"([\001-\010\013\014\016-\037!#-\[\]-\177]|\\[\011\013\014\016-\177])*"))"""
    r"$",  # end anchor
    _re.IGNORECASE,
)
DOMAIN_REGEX = _re.compile(
    # start anchor  domain
    r"(?P<domain>^(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)$)"
    # literal form, ipv4 address (SMTP 4.1.3)
    r"|(?P<literal>^\[(25[0-5]|2[0-4]\d|[0-1]?\d?\d)(\.(25[0-5]|2[0-4]\d|[0-1]?\d?\d)){3}\]$)",
    _re.IGNORECASE,
)

DefaultFactory = _typing.Union[type(UNDEFINED), _typing.Callable[[], _typing.Any]]
Schemable = _typing.Any  # schema_builder.py:80-87 (any schema tree node)


class VirtualPathComponent(str):
    """Group-label path component (schema_builder.py:963-968)."""

    def __str__(self):
        return '<' + self + '>'

    def __repr__(self):
        return self.__str__()


def default_factory(value):
    """Normalize a default into a factory (schema_builder.py:44-50)."""
    if value is UNDEFINED or callable(value):
        return value
    return lambda: value


__version__ = "0.1.0"
