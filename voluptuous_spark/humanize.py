"""Driver-side humanized error rendering (reference ``humanize.py``).

The column-side renderer lives in :mod:`voluptuous_spark.errors`
(``humanized`` column on violation rows); this module is the driver-side
twin operating on :class:`voluptuous_spark.exceptions.Invalid` trees, so
reference callers of ``humanize_error(data, exc)`` /
``validate_with_humanized_errors(data, schema)`` can switch without code
changes (reference humanize.py:10-57).
"""

from __future__ import annotations

import typing

from .exceptions import Error, Invalid, MultipleInvalid

MAX_VALIDATION_ERROR_ITEM_LENGTH = 500  # humanize.py:10


def _nested_getitem(
    data: typing.Any, path: typing.List[typing.Hashable]
) -> typing.Optional[typing.Any]:
    """Walk ``path`` into ``data``; None when any hop is missing or the
    value is not subscriptable (humanize.py:13-23)."""
    for item_index in path:
        try:
            data = data[item_index]
        except (KeyError, IndexError, TypeError):
            return None
    return data


def humanize_error(
    data,
    validation_error: Invalid,
    max_sub_error_length: int = MAX_VALIDATION_ERROR_ITEM_LENGTH,
) -> str:
    """Sorted multi-line rendering with the offending value appended:
    ``"<str(err)>. Got <repr>"`` truncated at ``max_sub_error_length``
    with the reference's ``'...'`` marker (humanize.py:26-48)."""
    if isinstance(validation_error, MultipleInvalid):
        return '\n'.join(
            sorted(
                humanize_error(data, sub_error, max_sub_error_length)
                for sub_error in validation_error.errors
            )
        )
    offending_item_summary = repr(_nested_getitem(data, validation_error.path))
    if len(offending_item_summary) > max_sub_error_length:
        offending_item_summary = (
            offending_item_summary[: max_sub_error_length - 3] + '...'
        )
    return '%s. Got %s' % (validation_error, offending_item_summary)


def validate_with_humanized_errors(
    data,
    schema,
    max_sub_error_length: int = MAX_VALIDATION_ERROR_ITEM_LENGTH,
) -> typing.Any:
    """``schema(data)`` re-raising any Invalid as a generic ``Error``
    carrying the humanized rendering (humanize.py:51-57)."""
    try:
        return schema(data)
    except (Invalid, MultipleInvalid) as e:
        raise Error(humanize_error(data, e, max_sub_error_length))
