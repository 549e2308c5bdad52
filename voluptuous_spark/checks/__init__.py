"""Table-level checks: column stats, uniqueness, referential, drift.

The reference validates one value at a time and has no cross-row checks;
these operators are the north-star additions (BASELINE.json north_rule)
for dataset-scale validation. All are built from Spark's built-in
partial-aggregating primitives: one narrow shuffle each, no Python.
"""

from .stats import column_stats  # noqa: F401
from .uniqueness import duplicate_keys, uniqueness_report  # noqa: F401
from .referential import orphans, referential_report  # noqa: F401
from .drift import psi_report, ks_statistic, category_histogram  # noqa: F401
from .skew import salted_agg, salted_join  # noqa: F401
from .sketches import (  # noqa: F401
    column_sketches,
    merge_sketches,
    sketch_psi,
)
