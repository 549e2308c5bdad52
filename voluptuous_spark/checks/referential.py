"""Referential-integrity checks (north star: clip <-> transcript sides).

Reference analog: cross-field validation via custom callables
(reference README.md:649-688); at table scale this is an anti-join.

Scale strategy:
- ``broadcast_parent=True`` hash-broadcasts the parent key set (only the
  join key column is shipped thanks to column pruning) — zero shuffle of
  the fact side. Use when the dim side fits in executor memory.
- otherwise a shuffled left-anti join; AQE skew-join splitting handles
  hot keys (spark.sql.adaptive.skewJoin.enabled).
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(
    child: DataFrame,
    parent: DataFrame,
    on: typing.Sequence[str] | str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Child rows whose key has no match in parent (left_anti)."""
    on = [on] if isinstance(on, str) else list(on)
    p = parent.select(*on).dropDuplicates(on)
    if broadcast_parent:
        p = F.broadcast(p)
    return child.join(p, on=on, how="left_anti")


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    on: typing.Sequence[str] | str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Single row: n_child, n_orphans, orphan_rate."""
    on = [on] if isinstance(on, str) else list(on)
    p = parent.select(*on).dropDuplicates(on).withColumn("__hit", F.lit(1))
    if broadcast_parent:
        p = F.broadcast(p)
    joined = child.select(*on).join(p, on=on, how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col("__hit").isNull().cast("long")).alias("n_orphans"),
        (F.sum(F.col("__hit").isNull().cast("long")) / F.count(F.lit(1))).alias(
            "orphan_rate"
        ),
    )
