"""Explicit key-salting for skewed shuffles (north rule: "salting for
skewed codec values").

When AQE already covers you — and when it doesn't:

- Aggregations (counts, stats): hash partial aggregation combines a hot
  key map-side, so one reducer receives at most ``n_mappers`` partial
  rows per key regardless of row count. No salting needed; every
  ``groupBy().agg()`` in this package relies on that.
- Sort-merge joins: ``spark.sql.adaptive.skewJoin.enabled`` (on in
  ``session.get_spark``) splits oversized post-shuffle partitions, and
  can split a SINGLE hot key's partition because the other side's
  matching partition is replicated per split.
- The gap AQE does not close: (a) shuffle-hash joins and aggregations
  whose DISTINCT-like reducer state explodes on one key (e.g.
  ``collect_set`` over a skewed codec), and (b) pre-3.x-style fixed
  plans where runtime re-optimization is disabled. There, spreading the
  hot key over ``n_salts`` synthetic sub-keys is the classic fix — these
  helpers make that explicit and testable.

Both helpers are pure DataFrame transformations: deterministic synthetic
salt (no ``rand()`` — resumable plans must replay identically), one
extra narrow column, no driver-side collection.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__vs_salt"


def salted_agg(
    df: DataFrame,
    keys: typing.Sequence[str] | str,
    aggs: dict[str, str],
    n_salts: int = 16,
    salt_on: typing.Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation spreading each key over ``n_salts`` reducers.

    ``aggs`` maps output column -> one of 'count' | 'sum:<col>' |
    'min:<col>' | 'max:<col>' — the decomposable aggregates whose
    partials re-combine exactly (count re-combines via sum). Stage 1
    groups on ``(keys..., salt)``; stage 2 re-combines per key. The salt
    is a deterministic hash of ``salt_on`` (default: all non-key
    columns' first, else the partition id), NOT ``rand()``, so
    checkpoint-resumed plans replay identically.

    >>> salted_agg(clips, "codec", {"n": "count", "ms": "sum:dur_ms"})
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if salt_on:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]),
                      F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(F.spark_partition_id(),
                                 F.monotonically_increasing_id()),
                      F.lit(n_salts))

    stage1_aggs, stage2_aggs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition(":")
        if fn == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(out))
            stage2_aggs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_aggs.append(getattr(F, fn)(col).alias(out))
            stage2_aggs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(
                f"salted_agg supports count/sum/min/max, got {spec!r}"
            )
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*stage1_aggs)
    )
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: typing.Sequence[str] | str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: the big side appends a deterministic salt
    to its key; the small side is replicated ``n_salts`` times (one copy
    per salt value) so every ``(key, salt)`` bucket finds its match. A
    hot key's rows land on ``n_salts`` reducers instead of one, at the
    cost of an ``n_salts``x blow-up of the SMALL side only — use when
    the small side is modest but too big (or the join type unsupported)
    for a broadcast, and AQE's skew-join split is unavailable.

    Supports 'inner', 'left', and 'left_anti' (the referential-orphans
    shape) — join types where per-(key, salt) results union back to the
    unsalted answer.
    """
    if how not in ("inner", "left", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_anti, got {how!r}"
        )
    on = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    joined = b.join(s, on=on + [_SALT], how=how)
    return joined.drop(_SALT)
