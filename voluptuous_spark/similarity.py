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


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN.
#
# IVF prunes WHICH rows a query reads; PQ shrinks WHAT each row costs.
# A dim-d float64 vector (8d bytes) becomes m uint8 codes (m bytes):
# split the vector into m orthogonal subspaces, k-means each subspace to
# ksub centroids, store the per-subspace centroid ids. At dim=64, m=8
# that is 512 -> 8 bytes — a 64x smaller scan/shuffle/cache footprint,
# which is the difference between an in-memory corpus and a disk-bound
# one at 10^9 rows. Scoring is ADC (asymmetric distance computation):
# the query stays exact; per query ONE m x ksub lookup table of
# subspace dot products is built (O(ksub*d) — once, on the tiny query
# side, BEFORE the join), then every candidate costs m array lookups +
# adds instead of a d-element fold. Composes with the IVF index:
# ivf_pq_topk probes partitions first, ADC-scores only the probed
# fraction.
# ---------------------------------------------------------------------------


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2_assign_expr(vec_col, centroids):
    """Nearest-centroid id by squared L2 (6dp-rounded; ties -> lowest
    cid). Same broadcast-literal Column shape as ``ivf_assign_expr`` —
    zero shuffle — but L2, which is the right metric for PQ
    reconstruction (argmin ||x_j - c||, not max cosine)."""
    arr = F.array(*[
        F.struct(
            F.round(
                -_l2sq(vec_col, F.array(*[F.lit(x) for x in comp])), 6
            ).alias("s"),
            F.lit(-cid).cast("int").alias("nid"),
        )
        for cid, comp in centroids
    ])
    return (-F.array_max(arr)["nid"]).cast("int")


def _sub(vec_col, j: int, d_sub: int):
    return F.slice(vec_col, j * d_sub + 1, d_sub)


def pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train the m per-subspace codebooks: deterministic L2 Lloyd
    rounds with the same reproducibility discipline as
    ``ivf_centroids`` (init = ksub lowest-id subvectors, 6dp HALF_UP
    rounding on assignments and means, empty cluster keeps its previous
    centroid). ALL m subspaces train in the same jobs — each Lloyd
    round is ONE corpus scan computing every subspace's assignment and
    a (m*ksub)-row aggregate to the driver; the corpus never shuffles.
    Returns [codebook_0..codebook_{m-1}], each [(cid, [double]*d_sub)].
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    e = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    init = (
        e.orderBy("id").limit(ksub)
        .select("id", F.transform("v", lambda x: F.round(x, 6)).alias("v"))
        .collect()
    )
    init = sorted(init, key=lambda r: r["id"])
    books = [
        [(i, [float(x) for x in r["v"][j * d_sub:(j + 1) * d_sub]])
         for i, r in enumerate(init)]
        for j in range(m)
    ]
    for _ in range(iters):
        # one scan: every subspace's assignment + subvector, exploded to
        # (j, cid, sv) rows — narrow (d_sub doubles) — then ONE shuffle
        # into a (m*ksub)-group mean. This stays flat as m/ksub/dim grow
        # (the alternative, m*ksub*d_sub conditional aggregates in a
        # single projection, blows up the plan on wide embeddings).
        subs = F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                _l2_assign_expr(
                    _sub(F.col("v"), j, d_sub), books[j]
                ).alias("cid"),
                _sub(F.col("v"), j, d_sub).alias("sv"),
            )
            for j in range(m)
        ])
        rows = (
            e.select(F.explode(subs).alias("s"))
            .groupBy(F.col("s.j").alias("j"), F.col("s.cid").alias("cid"))
            .agg(*[
                F.round(F.avg(F.col("s.sv")[i]), 6).alias(f"m{i}")
                for i in range(d_sub)
            ])
            .collect()
        )
        new = {
            (r["j"], r["cid"]): [r[f"m{i}"] for i in range(d_sub)]
            for r in rows
        }
        books = [
            [(c, new.get((j, c), comp)) for c, comp in book]
            for j, book in enumerate(books)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, code: array<int> of length m, rnorm) — the compressed
    corpus. ``rnorm`` is the norm of the RECONSTRUCTED vector, exact
    from codes alone (subspaces are orthogonal, so ||x_hat||^2 =
    sum_j ||c_{j,code_j}||^2) — precomputed here so ADC can return
    cosine-style scores without ever touching the raw vectors again.
    Encoding is a pure Column expression: zero shuffles."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0][1])
    e = _as_double(df, vec_col)
    codes = F.array(*[
        _l2_assign_expr(_sub(F.col(vec_col), j, d_sub), codebooks[j])
        for j in range(m)
    ])
    sqn = [
        F.array(*[
            F.lit(sum(x * x for x in comp)) for _, comp in codebooks[j]
        ])
        for j in range(m)
    ]
    out = e.select(
        F.col(id_col),
        *keep_cols,
        codes.alias("code"),
    )
    rnorm2 = None
    for j in range(m):
        term = F.element_at(sqn[j], F.col("code")[j] + 1)
        rnorm2 = term if rnorm2 is None else rnorm2 + term
    return out.withColumn("rnorm", F.sqrt(rnorm2))


def pq_query_table(qvec_col, codebooks: list):
    """array<array<double>> (m x ksub) of subspace dot products between
    the exact query and every codebook centroid — the ADC lookup table,
    built ONCE per query row on the (tiny) query side."""
    d_sub = len(codebooks[0][0][1])
    return F.array(*[
        F.array(*[
            _dot(
                _sub(qvec_col, j, d_sub),
                F.array(*[F.lit(x) for x in comp]),
            )
            for _, comp in codebooks[j]
        ])
        for j in range(len(codebooks))
    ])


def _adc_score(qtab_col, qnorm_col, code_col, rnorm_col, m: int):
    num = None
    for j in range(m):
        term = F.element_at(qtab_col[j], code_col[j] + 1)
        num = term if num is None else num + term
    return F.round(num / (qnorm_col * rnorm_col), 6)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k over the COMPRESSED corpus (``pq_encode`` output —
    the raw vectors are not read). Approximate cosine =
    sum_j qtab[j][code_j] / (||q|| * rnorm). The query side (with its
    ADC tables) broadcasts; each candidate costs m lookups + adds; the
    only exchange is the per-query top-k window. Returns
    (query_id, vec_id, score, rank) — same shape as the other *_topk."""
    m = len(codebooks)
    q = (
        _as_double(queries, vec_col)
        .select(
            query_id_col,
            pq_query_table(F.col(vec_col), codebooks).alias("__qtab"),
            _norm(F.col(vec_col)).alias("__qn"),
        )
    )
    cand = codes.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        _adc_score(
            F.col("__qtab"), F.col("__qn"), F.col("code"),
            F.col("rnorm"), m,
        ).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cent_lit(centroids):
    """array<array<double>> literal of centroid components, indexed by
    dense cid (``ivf_centroids`` returns dense 0..k-1 cids)."""
    return F.array(*[
        F.array(*[F.lit(x) for x in comp])
        for _cid, comp in sorted(centroids)
    ])


def _book_concat(codebooks, code_col):
    """Reconstructed vector from codes: concat of each subspace's
    looked-up centroid — pure element_at over codebook literals."""
    return F.concat(*[
        F.element_at(
            F.array(*[
                F.array(*[F.lit(x) for x in comp]) for _c, comp in book
            ]),
            code_col[j] + 1,
        )
        for j, book in enumerate(codebooks)
    ])


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int | None = None,
    n_probe: int = 2,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_count: int | None = None,
    centroids: list | None = None,
    codebooks: list | None = None,
) -> DataFrame:
    """IVF x PQ composed — the billion-scale shape: the coarse
    quantizer prunes to ``n_probe/n_clusters`` of the corpus, ADC
    scores the survivors in the compressed domain (m bytes/row through
    the scan instead of 8*dim).

    Codes quantize the RESIDUAL ``x - centroid(x)`` (classic IVF-PQ):
    same-list vectors differ only by their residual, so global
    raw-vector codebooks would collapse a tight cluster onto one code
    and ranking inside the list would be noise — residual codebooks
    spend all ksub^m resolution on exactly those within-list offsets
    (measured, clustered bench fixture: recall@5 0.28 raw-code ->
    0.73 residual at m=8/ksub=16, 0.85 at m=8/ksub=64, 0.92 at
    m=16/ksub=32 — recall buys with code bits, the PQ trade). Still
    pure Column expressions: the residual is a zip_with against an
    element_at centroid lookup.

    Score decomposition keeps ADC cost at m lookups per candidate:
    dot(q, x_hat) = dot(q, c_cid) + sum_j qtab[j][code_j], where
    dot(q, c_cid) is computed once per (query, probed list) on the tiny
    exploded query side, and qtab is the per-query residual-codebook
    table. ||x_hat|| is exact from the codes and stored at encode time.
    Train once, pass ``centroids``/``codebooks`` to reuse."""
    if centroids is None:
        n_clusters = _resolve_n_clusters(corpus, n_clusters, corpus_count)
        centroids = ivf_centroids(
            corpus, dim, k=n_clusters, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    cl = _cent_lit(centroids)
    base = _as_double(corpus, vec_col).withColumn(
        "__cid", ivf_assign_expr(F.col(vec_col), centroids)
    )
    resid = F.zip_with(
        F.col(vec_col),
        F.element_at(cl, F.col("__cid") + 1),
        lambda x, c: x - c,
    )
    if codebooks is None:
        codebooks = pq_codebooks(
            base.select(id_col, resid.alias("__resid"), "__cid"),
            dim, m=m, ksub=ksub, iters=iters,
            id_col=id_col, vec_col="__resid",
        )
    mlen = len(codebooks)
    enc = pq_encode(
        base.select(id_col, resid.alias("__resid"), "__cid"),
        codebooks, id_col=id_col, vec_col="__resid", keep_cols=("__cid",),
    ).drop("rnorm")
    # rnorm from pq_encode is the RESIDUAL reconstruction norm; the
    # score needs ||c_cid + r_hat|| — recompute from codes + centroid
    enc = enc.withColumn(
        "rnorm",
        _norm(
            F.zip_with(
                F.element_at(cl, F.col("__cid") + 1),
                _book_concat(codebooks, F.col("code")),
                lambda c, r: c + r,
            )
        ),
    )
    q = (
        _as_double(queries, vec_col)
        .select(
            query_id_col,
            F.col(vec_col).alias("__qv"),
            pq_query_table(F.col(vec_col), codebooks).alias("__qtab"),
            _norm(F.col(vec_col)).alias("__qn"),
        )
        .withColumn(
            "__cid",
            F.explode(ivf_probe_expr(F.col("__qv"), centroids, n_probe)),
        )
        .withColumn(
            "__qc", _dot(F.col("__qv"), F.element_at(cl, F.col("__cid") + 1))
        )
        .drop("__qv")
    )
    num = F.col("__qc")
    for j in range(mlen):
        num = num + F.element_at(F.col("__qtab")[j], F.col("code")[j] + 1)
    cand = enc.join(F.broadcast(q), "__cid").select(
        query_id_col,
        id_col,
        F.round(num / (F.col("__qn") * F.col("rnorm")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
