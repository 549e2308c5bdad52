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
from .errors import ERROR_TYPES, VIOLATION_SCHEMA  # noqa: F401
from .schema import Schema, ValidationResult  # noqa: F401

__version__ = "0.1.0"
