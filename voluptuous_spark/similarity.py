"""Similarity search over embedding columns (embeddings table).

- brute-force cosine top-k: the exact baseline — cross join queries x
  corpus with the query side broadcast (queries are small by definition),
  dot product via F.zip_with/F.aggregate (JVM-side, no UDF), window top-k.
- LSH-bucketed (random hyperplane / SRP) variant: the scale path — sign
  bits of fixed pseudo-random hyperplanes bucket the corpus; candidates
  share a bucket, exact re-rank inside buckets only. Hyperplanes are
  derived from deterministic rank-free constants so both Spark and an
  oracle compute identical buckets.
- embedding-cosine near-duplicate detection: all pairs above a cosine
  threshold within LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRP_COEFS = [
    (1_500_450_271, 97), (179_424_673, 257), (982_451_653, 991),
    (32_452_843, 1_031), (2_038_074_743, 8_191), (492_876_847, 131_071),
]
_P = 2_147_483_647


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    """Cosine similarity between two array<double> columns (JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — zero shuffle of the corpus; per-query top-k via window over
    the scored rows (shuffle keyed by query_id, k rows kept per key).
    Returns (query_id, vec_id, score, rank)."""
    c = _as_double(corpus, vec_col)
    q = _as_double(queries, vec_col).select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_bucket_expr(vec_col, dim: int, n_bits: int = 6):
    """Signed-random-projection bucket id: bit i = sign of <v, h_i> where
    h_i[j] = ((a_i*(j+1)+b_i) % P)/P - 0.5 — a deterministic pseudo-random
    hyperplane both engines can compute exactly."""
    acc = F.lit(0).cast("long")
    for i, (a, b) in enumerate(_SRP_COEFS[:n_bits]):
        comp = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(1), F.lit(dim)),
                lambda v, j: v
                * (
                    (
                        (j.cast("long") * F.lit(a).cast("long") + F.lit(b))
                        % F.lit(_P)
                    )
                    / F.lit(_P)
                    - 0.5
                ),
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        acc = acc + F.when(comp > 0, F.lit(1 << i)).otherwise(0)
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: SRP-bucket corpus and queries, exact cosine only
    within the query's bucket. At scale the bucket column is a partition /
    cluster key so a query touches 1/2^bits of the corpus."""
    c = _as_double(corpus, vec_col).withColumn(
        "__bucket", srp_bucket_expr(F.col(vec_col), dim, n_bits)
    )
    q = _as_double(queries, vec_col).select(
        query_id_col,
        F.col(vec_col).alias("__qv"),
        srp_bucket_expr(F.col(vec_col), dim, n_bits).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: SRP bucket (near-identical vectors share
    all sign bits with high probability), exact cosine within buckets.
    Returns (id_a, id_b, score) with id_a < id_b, score >= threshold."""
    v = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        srp_bucket_expr(F.col(vec_col).cast("array<double>"), dim, n_bits).alias(
            "__bucket"
        ),
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "__bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "__bucket")
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
