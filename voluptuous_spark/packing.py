"""Token-budget sequence packing for LLM training batches.

Training consumes fixed-length token windows; feeding one short
document per window wastes the tail. Packing concatenates documents
into ~``budget``-token packs. The exact first-fit-decreasing bin
packing is inherently sequential, so the distributed form used here is
**bucketed streaming fill**: spread documents over ``n_buckets``
independent lanes by a salted hash, order each lane deterministically
(hash order — effectively random, which keeps packs topic-mixed), and
cut a new pack whenever the running token total passes the budget.
Each lane packs in parallel; a pack never spans lanes.

Guarantees:
- deterministic (id+salt hash order; no RNG, no partition dependence),
- every document lands in exactly one pack,
- a pack's pre-overflow total is < budget and each pack overflows at
  most once (the straddling document stays whole — truncation/splitting
  is the trainer's decision, not the packer's),
- waste (unused budget) only where a lane runs dry.

Shape: ONE shuffle (the per-lane ordering window). Lane count trades
parallelism against packing efficiency: more lanes = more part-full
final packs (one per lane) but window state stays per-lane. At 10^12
docs use n_buckets ~ cluster cores x 4.

Oracle: the whole construction is a SQL window function chain (md5
basis) — DuckDB replays pack ids byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _unit_hex, _unit_long


def pack_assign(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    salt: str = "",
    basis: str = "hashed",
    out_prefix: str = "pack",
) -> DataFrame:
    """Assign (``pack_bucket``, ``pack_id``, ``pack_pos``): documents
    with the same (bucket, id) pair concatenate in ``pack_pos`` order
    into one training window. ``pack_id`` = floor(exclusive running
    token sum / budget) within the bucket — a new pack starts at the
    first document whose predecessors fill the budget."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = (_unit_hex(F.col(id_col), salt) if basis == "md5"
         else _unit_long(F.col(id_col), salt))
    bucket = (
        F.abs(F.xxhash64(F.col(id_col).cast("string"), F.lit(salt + "#b")))
        % n_buckets
        if basis != "md5"
        else (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(":" + salt + "#b"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % n_buckets
        )
    )
    b = df.withColumn(f"{out_prefix}_bucket", bucket.cast("int"))
    w = Window.partitionBy(f"{out_prefix}_bucket").orderBy(h, F.col(id_col))
    prev = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        b.withColumn(
            f"{out_prefix}_id", F.floor(prev / budget).cast("int")
        )
        .withColumn(f"{out_prefix}_pos", F.row_number().over(w))
    )


def pack_stats(
    packed: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    out_prefix: str = "pack",
) -> DataFrame:
    """One row per pack: doc count, token total, fill ratio, overflow.
    Partial-aggregated on the (bucket, pack) key."""
    return (
        packed.groupBy(f"{out_prefix}_bucket", f"{out_prefix}_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("tokens"),
        )
        .withColumn("fill", F.col("tokens") / budget)
        .withColumn(
            "overflow",
            F.greatest(F.col("tokens") - budget, F.lit(0)),
        )
    )


def packing_efficiency(
    packed: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    out_prefix: str = "pack",
) -> DataFrame:
    """Single-row rollup: packs, mean fill, token-weighted utilization
    (tokens / (packs * budget), clipping overflow — what fraction of
    the training windows' budget carries real tokens)."""
    s = pack_stats(packed, budget, token_col, out_prefix)
    return s.agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg("fill"), 4).alias("mean_fill"),
        F.round(
            F.sum(F.least(F.col("tokens"), F.lit(budget)))
            / (F.count("*") * budget),
            4,
        ).alias("utilization"),
    )
