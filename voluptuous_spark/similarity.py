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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (a_i, b_i) per hyperplane: h_i[j] = ((a_i*(j+1)+b_i) % P)/P - 0.5.
# Large well-known primes. These 22 entries are FROZEN (oracle parity
# with earlier rounds' frozen DuckDB replays); planes beyond index 21
# are hash-derived from the plane index by ``srp_coef`` — the plane
# supply is unbounded, so band_bits can grow with the corpus
# (band_bits ~ log2(N / target_bucket_rows) needs ~17 bits per band at
# 10^9 vectors and the old fixed table capped n_bands*band_bits at 22).
_SRP_COEFS = [
    (1_500_450_271, 97), (179_424_673, 257), (982_451_653, 991),
    (32_452_843, 1_031), (2_038_074_743, 8_191), (492_876_847, 131_071),
    (2_147_483_629, 3), (1_000_000_007, 17), (998_244_353, 31),
    (1_073_741_789, 61), (167_772_161, 127), (469_762_049, 251),
    (754_974_721, 509), (15_485_863, 1_021), (32_452_867, 2_039),
    (49_979_687, 4_093), (67_867_967, 8_117), (86_028_121, 16_381),
    (104_395_301, 32_749), (122_949_823, 65_521), (141_650_939, 131_063),
    (160_481_183, 262_139),
]
_P = 2_147_483_647


def srp_coef(i: int) -> tuple[int, int]:
    """(a_i, b_i) for hyperplane ``i``: the frozen table for i < 22,
    hash-derived (deterministic affine mix of the plane index, mod P)
    beyond — an unbounded plane supply with no table to ship. An
    external oracle replays any plane from this same two-line formula."""
    if i < len(_SRP_COEFS):
        return _SRP_COEFS[i]
    a = (1_500_450_271 * (i + 1) + 982_451_653) % _P
    b = (179_424_673 * (i + 1) + 32_452_843) % _P
    return (a or 1_500_450_271, b)


def auto_band_bits(
    n_rows: int, target_bucket_rows: int = 64, floor: int = 2
) -> int:
    """Per-band code width that bounds LSH bucket population at any
    corpus size: band_bits = ceil(log2(N / target_bucket_rows)), so a
    (band_id, band_val) bucket holds ~``target_bucket_rows`` rows and
    within-bucket pair work is N * target_bucket_rows * n_bands / 2 —
    LINEAR in N (at fixed band_bits it is quadratic: pairs grow as
    N^2 * n_bands / 2^band_bits, the round-3 measured scale-killer)."""
    if n_rows <= target_bucket_rows:
        return floor
    return max(floor, math.ceil(math.log2(n_rows / target_bucket_rows)))


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


def _rebalance_pairs(pairs: DataFrame) -> DataFrame:
    """Spread the candidate-pair set across the session's default
    parallelism before the exact-cosine verify stage. Two reasons, both
    real at opposite ends of the scale: locally, a small corpus arrives
    as one parquet partition, the pair join broadcasts the tiny vector
    side, and ALL per-pair dot folds land in a single task; at corpus
    scale, pairs inherit the bucket-keyed partitioning of the band/
    cluster join, so a fat bucket's pairs sit in one task — an explicit
    exchange of the NARROW (id_a, id_b) rows (16 bytes/row) rebalances
    the compute-bound fold stage either way, and AQE never coalesces a
    user-specified repartition."""
    sc = pairs.sparkSession.sparkContext
    return pairs.repartition(sc.defaultParallelism)


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


def srp_bucket_expr(vec_col, dim: int, n_bits: int = 6, first_bit: int = 0):
    """Signed-random-projection bucket id from bits [first_bit,
    first_bit+n_bits): bit i = sign of <v, h_i> where
    h_i[j] = ((a_i*(j+1)+b_i) % P)/P - 0.5 — a deterministic pseudo-random
    hyperplane both engines can compute exactly. ``first_bit`` selects a
    band of a longer code (multi-table LSH). Plane supply is unbounded
    (``srp_coef``): any first_bit/n_bits combination is valid."""
    acc = F.lit(0).cast("long")
    for i, (a, b) in enumerate(
        srp_coef(first_bit + k) for k in range(n_bits)
    ):
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


def _banded(df: DataFrame, vec_col, dim: int, band_bits: int,
            n_bands: int) -> DataFrame:
    """Explode each vector into ``n_bands`` rows keyed (band_id,
    band_val): band b holds SRP bits [b*band_bits, (b+1)*band_bits).
    Multi-table (OR-amplified) LSH: two vectors are candidates when ANY
    band matches. Bucket population per (band_id, band_val) is
    ~N / 2**band_bits — pick ``band_bits ≈ log2(N / target_bucket_rows)``
    so within-bucket work is bounded at any corpus size (the fix for the
    round-1 16-bucket quadratic blowup)."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            srp_bucket_expr(
                vec_col, dim, band_bits, first_bit=b * band_bits
            ).alias("band_val"),
        )
        for b in range(n_bands)
    ])
    return (
        df.withColumn("__band", F.explode(bands))
        .withColumn("__band_id", F.col("__band")["band_id"])
        .withColumn("__band_val", F.col("__band")["band_val"])
        .drop("__band")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int | None = 8,
    n_bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_count: int | None = None,
    target_bucket_rows: int = 64,
) -> DataFrame:
    """Approximate top-k: banded SRP codes (``n_bits`` total, split into
    ``n_bands`` tables of n_bits/n_bands bits). A corpus vector is a
    candidate when ANY band matches the query's band — multi-table LSH
    recall amplification — then exact cosine re-ranks candidates only.
    At scale the (band_id, band_val) pair is the partition / cluster key;
    a query touches n_bands/2**(n_bits/n_bands) of the corpus.
    ``n_bits=None`` derives the band width from the corpus size
    (``auto_band_bits``, same policy as ``cosine_near_duplicates``) so
    per-query candidate count stays ~n_bands * target_bucket_rows at any
    N; the default stays the oracle-replayable fixed 8-bit code."""
    if n_bits is None:
        n = corpus_count if corpus_count is not None else corpus.count()
        n_bits = auto_band_bits(n, target_bucket_rows) * n_bands
    assert n_bits % n_bands == 0, "n_bits must split evenly into bands"
    band_bits = n_bits // n_bands
    c = _banded(_as_double(corpus, vec_col), F.col(vec_col), dim,
                band_bits, n_bands)
    q = _banded(
        _as_double(queries, vec_col).select(
            query_id_col, F.col(vec_col).alias("__qv")
        ),
        F.col("__qv"), dim, band_bits, n_bands,
    )
    cand = (
        c.join(F.broadcast(q), ["__band_id", "__band_val"])
        # a pair matching several bands appears once per band: keep one
        .dropDuplicates([query_id_col, id_col])
        .select(
            query_id_col,
            id_col,
            F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def default_n_clusters(n_rows: int) -> int:
    """IVF coarse-quantizer size policy as CODE (not prose):
    n_clusters ~ sqrt(N), which balances inverted-list length
    (N/n_clusters rows re-ranked per probed list) against quantizer cost
    (n_clusters centroid comparisons per assignment/probe) — both grow
    as sqrt(N), the standard billion-scale IVF shape (at 10^9 vectors:
    ~31.6k lists of ~31.6k vectors). Used whenever ``n_clusters`` is
    omitted; pass ``corpus_count`` (table stats) to skip the count
    job."""
    return max(1, math.isqrt(max(n_rows, 1)))


def _resolve_n_clusters(
    df: DataFrame, n_clusters: int | None, corpus_count: int | None
) -> int:
    if n_clusters is not None:
        return n_clusters
    n = corpus_count if corpus_count is not None else df.count()
    return default_n_clusters(n)


def _centroid_struct(vec_col, centroids):
    """array<struct<s: rounded cosine vs centroid, nid: -cid>> — struct
    ordering makes max = (best similarity, then LOWEST centroid id)."""
    return F.array(*[
        F.struct(
            F.round(
                cosine_expr(vec_col, F.array(*[F.lit(x) for x in comp])), 6
            ).alias("s"),
            F.lit(-cid).cast("int").alias("nid"),
        )
        for cid, comp in centroids
    ])


def ivf_assign_expr(vec_col, centroids):
    """Cluster id of the nearest (cosine) centroid; ties go to the lowest
    centroid id. Pure Column expression over literal centroids — zero
    shuffle, evaluated in the same stage as the scan."""
    return (-F.array_max(_centroid_struct(vec_col, centroids))["nid"]).cast(
        "int"
    )


def ivf_probe_expr(vec_col, centroids, n_probe: int):
    """Array of the ``n_probe`` nearest centroid ids, best first."""
    return F.transform(
        F.slice(
            F.sort_array(_centroid_struct(vec_col, centroids), asc=False),
            1, n_probe,
        ),
        lambda st: (-st["nid"]).cast("int"),
    )


def ivf_centroids(
    df: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """IVF coarse quantizer: deterministic k-means over the corpus.
    Init = the ``k`` lowest-id vectors (cid = dense index in id order);
    each Lloyd round assigns by argmax of the 6dp-rounded cosine
    (ties -> lowest cid) and recomputes centroids as the 6dp-rounded
    per-component mean, keeping the previous centroid when a cluster
    goes empty. The rounding makes the fixpoint reproducible bit-for-bit
    by an external engine (the DuckDB oracle replays identical rounds).

    Scale shape: each round is ONE corpus scan + a k-row aggregate
    collected to the driver (k x dim doubles); the corpus itself never
    shuffles — assignment is a broadcast-literal Column expression.
    Returns [(cid, [double]*dim)] sorted by cid."""
    e = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    # round via Spark (HALF_UP, same as the oracle's round()) — Python's
    # round() is banker's and could diverge on exact .5e-6 boundaries
    init = (
        e.orderBy("id").limit(k)
        .select("id", F.transform("v", lambda x: F.round(x, 6)).alias("v"))
        .collect()
    )
    cents = [
        (i, [float(x) for x in r["v"]])
        for i, r in enumerate(sorted(init, key=lambda r: r["id"]))
    ]
    for _ in range(iters):
        rows = (
            e.withColumn("cid", ivf_assign_expr(F.col("v"), cents))
            .groupBy("cid")
            .agg(*[
                F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}")
                for i in range(dim)
            ])
            .collect()
        )
        new = {r["cid"]: [r[f"m{i}"] for i in range(dim)] for r in rows}
        cents = [(cid, new.get(cid, comp)) for cid, comp in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int | None = None,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_count: int | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """IVF-flat ANN: k-means coarse quantizer partitions the corpus into
    ``n_clusters`` inverted lists; each query exactly re-ranks only the
    ``n_probe`` nearest lists. The complement of the SRP path: LSH bounds
    bucket population obliviously, IVF adapts the partitions to the data
    distribution (the standard shape for billion-vector corpora — at
    scale the corpus would be written partitioned/bucketed BY the
    assigned cluster id so a probe is a partition-pruned scan).
    ``n_clusters`` defaults to the sqrt(N) policy
    (``default_n_clusters``); pass ``corpus_count`` from table stats to
    skip the derivation's count job, or pin ``n_clusters`` explicitly
    (the oracle-replayed gate query does).

    Plan shape here: assignment is a zero-shuffle Column expression over
    the scan; the (tiny) query x probe set broadcasts into the join, so
    the corpus never shuffles; the only exchange is the per-query top-k
    window on candidates. Returns (query_id, vec_id, score, rank).
    ``centroids``: reuse an already-trained quantizer (skips the
    k-means pass entirely)."""
    if centroids is not None:
        cents = centroids
    else:
        n_clusters = _resolve_n_clusters(corpus, n_clusters, corpus_count)
        cents = ivf_centroids(
            corpus, dim, k=n_clusters, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    c = _as_double(corpus, vec_col).withColumn(
        "__cid", ivf_assign_expr(F.col(vec_col), cents)
    )
    qp = (
        _as_double(queries, vec_col)
        .select(query_id_col, F.col(vec_col).alias("__qv"))
        .withColumn(
            "__cid",
            F.explode(ivf_probe_expr(F.col("__qv"), cents, n_probe)),
        )
    )
    cand = c.join(F.broadcast(qp), "__cid").select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_clusters: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
) -> list:
    """Materialize the IVF index the ``ivf_topk`` docstring promises:
    the corpus written PARTITIONED BY the assigned cluster id
    (``partitionBy('__cid')`` — the sandbox analog of an Iceberg
    partition spec on the cluster column). A probe then reads only the
    ``n_probe`` matching directories: scan cost is
    ``n_probe / n_clusters`` of the corpus, enforced by static partition
    pruning, not a post-scan filter. Returns the centroid list for
    probe-time reuse (persist it next to the index at scale).
    ``n_clusters`` defaults to the sqrt(N) policy
    (``default_n_clusters``)."""
    n_clusters = _resolve_n_clusters(corpus, n_clusters, corpus_count)
    cents = ivf_centroids(
        corpus, dim, k=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    (
        _as_double(corpus, vec_col)
        .withColumn("__cid", ivf_assign_expr(F.col(vec_col), cents))
        .write.mode("overwrite")
        .partitionBy("__cid")
        .parquet(path)
    )
    return cents


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k over a cluster-partitioned IVF index
    (``ivf_write_index``). The probe set is computed driver-side from
    the (small, by definition) query batch — n_queries x n_probe ints —
    and pushed as a LITERAL ``__cid IN (...)`` predicate, so the scan
    prunes to whole partition directories (``PartitionFilters`` in the
    plan; see tests/test_plans.py). Join/probe shape matches
    ``ivf_topk``: broadcast query side, corpus never shuffles."""
    qp = (
        _as_double(queries, vec_col)
        .select(query_id_col, F.col(vec_col).alias("__qv"))
        .withColumn(
            "__cid",
            F.explode(ivf_probe_expr(F.col("__qv"), centroids, n_probe)),
        )
    )
    probe_ids = sorted(
        r["__cid"] for r in qp.select("__cid").distinct().collect()
    )
    corpus = spark.read.parquet(index_path).filter(
        F.col("__cid").isin(probe_ids)
    )
    cand = corpus.join(F.broadcast(qp), "__cid").select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semantic_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_clusters: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicates (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters the embedding space, then exact
    cosine pairs are computed WITHIN clusters only — the data-ADAPTIVE
    complement of ``cosine_near_duplicates``'s oblivious SRP buckets
    (semantically equivalent documents concentrate inside one cluster,
    where an oblivious hyperplane code may split borderline pairs
    across buckets). Returns (id_a, id_b, score) with id_a < id_b,
    score >= threshold.

    Scale shape mirrors the IVF path: assignment is a zero-shuffle
    Column expression over broadcast-literal centroids
    (``ivf_assign_expr``); the self-join is keyed on the cluster id, so
    pair work is sum over clusters of size² with ~sqrt(N) clusters of
    ~sqrt(N) rows by ``default_n_clusters`` — at 10^12 vectors write
    the assigned corpus ``partitionBy(cluster_id)`` (the
    ``ivf_write_index`` layout) and run per-cluster joins against a
    partition-pruned scan. The join carries (id, cluster) only; vectors
    re-attach after the pair set is formed, exactly like the SRP
    path. ``centroids``: reuse a quantizer already trained elsewhere
    (e.g. the one an ``ivf_topk``/``ivf_write_index`` call produced) —
    dedup and ANN then share ONE k-means pass."""
    if centroids is not None:
        cents = centroids
    else:
        n_clusters = _resolve_n_clusters(df, n_clusters, corpus_count)
        cents = ivf_centroids(
            df, dim, k=n_clusters, iters=iters, id_col=id_col,
            vec_col=vec_col,
        )
    base = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    assigned = base.select(
        "id", ivf_assign_expr(F.col("v"), cents).alias("__cid")
    )
    a = assigned.select(F.col("id").alias("id_a"), "__cid")
    b = assigned.select(F.col("id").alias("id_b"), "__cid")
    pairs = _rebalance_pairs(
        a.join(b, "__cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # norms precomputed ONCE per vector (N folds), so each of the
    # O(N * bucket) candidate pairs pays only the dot fold — 3x less
    # per-pair lambda work than cosine_expr's dot + two norms, and
    # bit-identical: same fold over the same vector, same division
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     _norm(F.col("v")).alias("__na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     _norm(F.col("v")).alias("__nb"))
    return (
        va.join(pairs, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def cosine_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int | None = None,
    n_bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    target_bucket_rows: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs: banded SRP codes (near-identical vectors
    agree on all sign bits of at least one band with high probability),
    within-band self-join, pair dedup, exact cosine verify. Returns
    (id_a, id_b, score) with id_a < id_b, score >= threshold.

    Scale shape: the self-join is keyed on (band_id, band_val), so the
    quadratic term is sum over buckets of pop² with pop ~ N/2**band_bits.
    By default band_bits is DERIVED from the corpus size
    (``auto_band_bits``: band_bits = ceil(log2(N/target_bucket_rows))),
    which pins bucket population at ~target_bucket_rows and makes
    candidate-pair count LINEAR in N — at a fixed band_bits (the round-3
    default of 4) pairs grow as N², the measured 5.46x-wall-at-4x-data
    scale-killer. Pass ``corpus_count`` (e.g. from table stats) to skip
    the one count job the derivation otherwise runs, or pin ``n_bits``
    explicitly for oracle-replayable fixed codes. The plane supply is
    unbounded (``srp_coef``), so n_bands >= 2 stays affordable at any
    band_bits — recall amplification survives the scale-up.

    The band explode and self-join carry ONLY (id, band_id, band_val) —
    3 narrow columns — never the embedding payload: candidate pairs are
    deduped first, then the vectors re-attach through two id-keyed joins
    for the exact-cosine verify (2 x N vector rows through an exchange
    instead of n_bands x N both sides of the band shuffle)."""
    if n_bits is None:
        n = corpus_count if corpus_count is not None else df.count()
        band_bits = auto_band_bits(n, target_bucket_rows)
        n_bits = band_bits * n_bands
    assert n_bits % n_bands == 0, "n_bits must split evenly into bands"
    band_bits = n_bits // n_bands
    base = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    v = _banded(base, F.col("v"), dim, band_bits, n_bands).select(
        "id", "__band_id", "__band_val"
    )
    a = v.select(F.col("id").alias("id_a"), "__band_id", "__band_val")
    b = v.select(F.col("id").alias("id_b"), "__band_id", "__band_val")
    pairs = _rebalance_pairs(
        a.join(b, ["__band_id", "__band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify joins stream the vector table against the (narrow,
    # LSH-pruned) pair set. No broadcast() hint: Spark never demotes an
    # explicit hint, and on a duplicate-heavy corpus the pair set is
    # ~N * target_bucket_rows * n_bands / 2 rows — far past driver
    # memory at 10^9 vectors. The pair set sits downstream of a shuffle
    # (dropDuplicates), so AQE sees its TRUE runtime size and converts
    # to broadcast-hash exactly when it fits autoBroadcastJoinThreshold.
    # norms precomputed once per vector: each candidate pair pays only
    # the dot fold (bit-identical to cosine_expr — same fold, same
    # division — at a third of the per-pair lambda work)
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     _norm(F.col("v")).alias("__na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     _norm(F.col("v")).alias("__nb"))
    return (
        va.join(pairs, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
