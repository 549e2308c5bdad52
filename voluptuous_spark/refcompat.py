"""Drop-in ``import voluptuous`` compatibility shim.

``install()`` registers module aliases so code written against the
reference library — including the reference's OWN test-suite
(`voluptuous/tests/tests.py`) — imports this engine instead:

    from voluptuous_spark.refcompat import install
    install()                       # registers 'voluptuous', 'voluptuous.util', ...
    from voluptuous import Schema   # -> voluptuous_spark.Schema

The single-document path (``Schema.__call__``) rides a one-row DataFrame
through the full column-compiled engine, so every reference call-site
exercises the same plan the table-scale ``validate(df)`` runs; an active
SparkSession is required. ``tests/test_reference_suite.py`` uses this to
run the reference's own pytest suite against the engine.
"""

from __future__ import annotations

import sys
import types

import voluptuous_spark as _vs

from . import exceptions as _exc
from . import humanize as _humanize

def _iterate_mapping_candidates(schema: dict) -> list:
    """Iterate schema items in candidate-priority order (reference
    schema_builder.py:821-871): literal values first, then ``Remove``
    markers (their failures fall through instead of erroring), other
    ``Marker``s, bare callables, types, and ``Extra`` last (catch-all).

    Reimplemented here for API parity — the engine itself orders
    candidates at compile time inside ``schema._bind_fields``.
    """
    Extra = _vs.Extra
    Remove = _vs.Remove
    Marker = _vs.Marker

    def prio(item):
        key = item[0]
        if key is Extra:
            return 5
        if isinstance(key, Remove):
            return 1
        if isinstance(key, Marker):
            return 2
        if isinstance(key, type):
            return 4
        if callable(key):
            return 3
        return 0  # literal values claim keys first

    return sorted(schema.items(), key=prio)


def _compile_scalar(schema):
    """API-parity twin of the reference's scalar compiler
    (schema_builder.py:770-818): returns a ``(path, value) -> value``
    closure. Bare callables run driver-side exactly like the reference
    (they may change the value's type, which a typed column cannot);
    everything else rides the engine's single-document path."""
    if callable(schema) and not isinstance(schema, type) and not isinstance(
        schema, _vs.dsl.Validator
    ):
        def validate_callable(path, value):
            try:
                return schema(value)
            except _exc.Invalid:
                raise
            except (ValueError, TypeError):
                raise _exc.ValueInvalid("not a valid value", list(path))

        return validate_callable

    def validate(path, value):
        return _vs.Schema(schema)(value)

    return validate


def _submodule(name: str, names: dict) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in names.items():
        setattr(mod, k, v)
    return mod


def install(name: str = "voluptuous") -> types.ModuleType:
    """Register ``name`` (+ ``.humanize .util .schema_builder .error
    .validators``) in ``sys.modules`` backed by this engine. Returns the
    root module. Idempotent."""
    if name in sys.modules and getattr(
        sys.modules[name], "__voluptuous_spark_shim__", False
    ):
        return sys.modules[name]

    public = {
        k: v for k, v in vars(_vs).items() if not k.startswith("__")
    }

    root = _submodule(name, public)
    root.__voluptuous_spark_shim__ = True

    hum = _submodule(
        name + ".humanize",
        {
            "MAX_VALIDATION_ERROR_ITEM_LENGTH":
                _humanize.MAX_VALIDATION_ERROR_ITEM_LENGTH,
            "_nested_getitem": _humanize._nested_getitem,
            "humanize_error": _humanize.humanize_error,
            "validate_with_humanized_errors":
                _humanize.validate_with_humanized_errors,
            "Error": _exc.Error,
        },
    )

    util = _submodule(
        name + ".util",
        {
            k: public[k]
            for k in (
                "Capitalize", "Lower", "Strip", "Title", "Upper",
                "DefaultTo", "SetTo", "Set", "Literal",
            )
            if k in public
        },
    )

    sb_names = {
        k: public[k]
        for k in (
            "Schema", "Required", "Optional", "Marker", "Extra",
            "Remove", "Msg", "Self", "Undefined", "Exclusive",
            "Inclusive", "Object", "ALLOW_EXTRA", "PREVENT_EXTRA",
            "REMOVE_EXTRA", "message", "validate", "raises",
        )
        if k in public
    }
    sb_names["_iterate_mapping_candidates"] = _iterate_mapping_candidates
    sb_names["_compile_scalar"] = _compile_scalar
    sb = _submodule(name + ".schema_builder", sb_names)

    err = _submodule(
        name + ".error",
        {
            k: v
            for k, v in vars(_exc).items()
            if isinstance(v, type) and issubclass(v, Exception)
        },
    )

    val = _submodule(name + ".validators", public)

    root.humanize = hum
    root.util = util
    root.schema_builder = sb
    root.error = err
    root.validators = val

    sys.modules[name] = root
    sys.modules[name + ".humanize"] = hum
    sys.modules[name + ".util"] = util
    sys.modules[name + ".schema_builder"] = sb
    sys.modules[name + ".error"] = err
    sys.modules[name + ".validators"] = val
    return root
