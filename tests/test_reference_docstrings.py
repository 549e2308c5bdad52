"""Run the doctests embedded in the reference's MODULE DOCSTRINGS.

Third parity corpus (after tests.py and tests.md): the reference's
`schema_builder.py / validators.py / util.py / error.py / humanize.py`
docstrings carry ~232 doctest examples. They are harvested from the real
modules, then executed against THIS engine via the
:mod:`voluptuous_spark.refcompat` import shim.

230/232 pass. The 2 entries in ``EXPECTED_DIVERGENCES`` are the
engine's documented divergences ((group, example lineno) pairs — one
cosmetic numeric-path rendering and one stale upstream docstring the
reference itself fails live); the comparison is exact in both
directions — an entry that starts passing fails the test so the list
stays honest.

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import doctest
import os
import sys

import pytest

REF_PKG = "/root/reference/voluptuous"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG), reason="reference checkout not available"
)

_SHIM_NAMES = (
    "voluptuous", "voluptuous.humanize", "voluptuous.util",
    "voluptuous.schema_builder", "voluptuous.error", "voluptuous.validators",
)

# (doctest group, example.lineno) -> documented reason
EXPECTED_DIVERGENCES = {
    ("voluptuous.schema_builder.Remove", 5):
        "STALE reference docstring: the docstring expects 'extra keys "
        "not allowed @ data[1]' but the reference library itself raises "
        "TypeInvalid 'expected str @ data[1]' here (verified live); the "
        "engine matches the reference's live behavior",
    ("voluptuous.schema_builder.Schema._compile_dict", 36):
        "digit-string key '10' renders data[10] (engine restores numeric "
        "path components for list indexes / numeric map keys)",
}


def _harvest():
    """Load the REAL reference modules and collect their doctests."""
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "voluptuous" or k.startswith("voluptuous.")}
    sys.path.insert(0, "/root/reference")
    try:
        import voluptuous.error as real_err
        import voluptuous.humanize as real_hum
        import voluptuous.schema_builder as real_sb
        import voluptuous.util as real_util
        import voluptuous.validators as real_val

        finder = doctest.DocTestFinder()
        tests = []
        for m in (real_sb, real_val, real_util, real_err, real_hum):
            tests.extend(t for t in finder.find(m) if t.examples)
        return tests
    finally:
        sys.path.remove("/root/reference")
        for k in list(sys.modules):
            if k == "voluptuous" or k.startswith("voluptuous."):
                del sys.modules[k]
        sys.modules.update(saved)


class _Collector(doctest.DocTestRunner):
    def __init__(self):
        super().__init__(optionflags=doctest.ELLIPSIS
                         | doctest.IGNORE_EXCEPTION_DETAIL)
        self.failed: dict = {}
        self.group = None

    def _key(self, example):
        return (self.group, example.lineno)

    def report_failure(self, out, test, example, got):
        self.failed[self._key(example)] = "expected %r got %r" % (
            example.want.strip()[:120], got.strip()[:200])

    def report_unexpected_exception(self, out, test, example, exc_info):
        import traceback

        self.failed[self._key(example)] = "raised " + "".join(
            traceback.format_exception_only(*exc_info[:2])
        ).strip()[:250]


def test_reference_docstring_doctests(spark):
    tests = _harvest()
    assert sum(len(t.examples) for t in tests) >= 225  # corpus intact

    from voluptuous_spark import exceptions as vse
    from voluptuous_spark.refcompat import install

    saved = {k: sys.modules.get(k) for k in _SHIM_NAMES}
    for k in _SHIM_NAMES:
        sys.modules.pop(k, None)
    shim = install()
    try:
        base = dict(vars(shim))
        base["er"] = shim.error
        base["raises"] = vse.raises
        base["_compile_scalar"] = shim.schema_builder._compile_scalar
        base["os"] = os
        import re as _re
        base["re"] = _re
        # NOT an importable module name: functions/classes defined inside
        # doctests must cloudpickle BY VALUE into Spark workers
        base["__name__"] = "__vs_ref_doctests__"

        runner = _Collector()
        for t in tests:
            globs = dict(base)
            globs["__file__"] = t.filename
            runner.group = t.name
            t2 = doctest.DocTest(
                t.examples, globs, t.name, t.filename, t.lineno, t.docstring
            )
            runner.run(t2, out=lambda s: None)

        unexpected = {
            k: v for k, v in runner.failed.items()
            if k not in EXPECTED_DIVERGENCES
        }
        fixed = [
            k for k in EXPECTED_DIVERGENCES if k not in runner.failed
        ]
        assert not unexpected, (
            "unexpected doctest divergences:\n"
            + "\n".join(f"{k}: {v}" for k, v in unexpected.items())
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
