"""Table-level uniqueness (north star: clip_id over 10^12 rows).

The reference's ``Unique`` (validators.py:959-1000) checks ONE iterable
cell; at table scale uniqueness is a hash aggregation on the key — one
shuffle, map-side partial counts, AQE-coalesced reducers. No window
function (a global window would sort; hash-agg doesn't).
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: typing.Sequence[str]) -> DataFrame:
    """Keys appearing more than once: (key..., dup_count).

    Violation message mirrors the reference's
    'contains duplicate items: [...]' (validators.py:996).
    """
    keys = list(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_report(df: DataFrame, keys: typing.Sequence[str]) -> DataFrame:
    """Single-row summary: n_rows, n_distinct, n_dup_keys, n_dup_rows.

    Computed from one groupBy (re-aggregated counts), not two scans.
    """
    keys = list(keys)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("cnt") > 1).cast("long")).alias("n_dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "n_dup_rows"
        ),
    )
