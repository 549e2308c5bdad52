"""Scale policy for SRP LSH: unbounded hash-derived plane supply and
corpus-size-derived band width (round-3 verdict item #1 — fixed
band_bits makes candidate pairs quadratic in N; auto_band_bits pins
bucket population so they stay linear)."""

import math
import random

from pyspark.sql import functions as F

from voluptuous_spark.similarity import (
    _P,
    _SRP_COEFS,
    auto_band_bits,
    cosine_near_duplicates,
    srp_bucket_expr,
    srp_coef,
)


def test_srp_coef_table_frozen_and_formula_beyond():
    # the first 22 planes stay byte-identical to the frozen oracle table
    for i in range(len(_SRP_COEFS)):
        assert srp_coef(i) == _SRP_COEFS[i]
    # beyond the table: deterministic, in-range, and pairwise distinct
    seen = set()
    for i in range(len(_SRP_COEFS), 200):
        a, b = srp_coef(i)
        assert 0 < a < _P and 0 <= b < _P
        assert srp_coef(i) == (a, b)
        seen.add((a, b))
    assert len(seen) == 200 - len(_SRP_COEFS)


def test_auto_band_bits_policy():
    assert auto_band_bits(0) == 2
    assert auto_band_bits(64) == 2
    assert auto_band_bits(1 << 16) == 10          # 65536/64 -> 2^10
    assert auto_band_bits(10**9, target_bucket_rows=128) == math.ceil(
        math.log2(10**9 / 128)
    )
    # doubling the corpus adds exactly one bit once past the floor
    assert auto_band_bits(1 << 17) == auto_band_bits(1 << 16) + 1


def test_srp_deep_planes_bucket(spark):
    # planes past the frozen 22-entry table (first_bit=40) must produce
    # a working bucket code: identical vectors collide, output in range
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(32)]
    rows.append((100, list(rows[0][1])))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = emb.select(
        "vec_id",
        srp_bucket_expr(
            F.col("embedding").cast("array<double>"), 8, n_bits=6,
            first_bit=40,
        ).alias("b"),
    ).collect()
    m = {r["vec_id"]: r["b"] for r in got}
    assert m[100] == m[0]
    assert all(0 <= v < 64 for v in m.values())
    assert len(set(m.values())) > 1  # the code actually discriminates


def test_auto_band_bits_bounds_candidates(spark):
    # auto-derived band width: the planted exact dup survives while the
    # candidate set stays well under all-pairs
    rng = random.Random(11)
    n = 256
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
    rows.append((n, list(rows[0][1])))  # planted exact duplicate of id 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cand = cosine_near_duplicates(
        emb, dim=8, threshold=-1.0, target_bucket_rows=32
    )
    n_cand = cand.count()
    all_pairs = (n + 1) * n // 2
    assert n_cand < all_pairs // 2
    found = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_duplicates(
            emb, dim=8, threshold=0.999, target_bucket_rows=32
        ).collect()
    }
    assert (0, n) in found
    # corpus_count short-circuits the derivation count job and matches
    via_count = cosine_near_duplicates(
        emb, dim=8, threshold=-1.0, corpus_count=n + 1,
        target_bucket_rows=32,
    ).count()
    assert via_count == n_cand


def test_ivf_sqrt_n_policy(spark):
    import math

    from voluptuous_spark.similarity import default_n_clusters, ivf_topk

    assert default_n_clusters(0) == 1
    assert default_n_clusters(100) == 10
    assert default_n_clusters(10**9) == math.isqrt(10**9)
    # n_clusters omitted -> sqrt(N) derivation; n=16 -> 4 clusters, and
    # probing all 4 degenerates to exact search (recall of the planted
    # near-identical pair)
    rng = random.Random(5)
    base = [rng.uniform(-1, 1) for _ in range(8)]
    rows = [(0, base), (1, [x * 1.001 for x in base])] + [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(2, 16)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ivf_topk(emb, q, dim=8, k=2, n_probe=4).orderBy("rank").collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    # corpus_count short-circuit matches the derived path
    top2 = ivf_topk(
        emb, q, dim=8, k=2, n_probe=4, corpus_count=16
    ).orderBy("rank").collect()
    assert [(r["vec_id"], r["score"]) for r in top] == [
        (r["vec_id"], r["score"]) for r in top2
    ]


def test_lsh_topk_auto_band_width(spark):
    # n_bits=None derives the band width from the corpus size (same
    # policy as cosine_near_duplicates); the planted exact duplicate of
    # the query must rank first either way
    from voluptuous_spark.similarity import lsh_topk

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(128)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    auto = lsh_topk(
        emb, q, dim=8, k=3, n_bits=None, target_bucket_rows=16
    ).orderBy("rank").collect()
    assert auto[0]["vec_id"] == 7 and auto[0]["score"] == 1.0
    via_count = lsh_topk(
        emb, q, dim=8, k=3, n_bits=None, corpus_count=128,
        target_bucket_rows=16,
    ).orderBy("rank").collect()
    assert [(r["vec_id"], r["score"]) for r in auto] == [
        (r["vec_id"], r["score"]) for r in via_count
    ]


def test_semantic_duplicates(spark):
    # SemDeDup-style: cluster assignment buckets the self-join; the
    # planted near-identical pair concentrates in one cluster and
    # surfaces, while the pair set stays far below all-pairs
    from voluptuous_spark.similarity import semantic_duplicates

    rng = random.Random(23)
    centers = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [x + rng.gauss(0, 0.1) for x in centers[i % 4]])
        for i in range(64)
    ]
    rows.append((100, [x * 1.0001 for x in rows[0][1]]))  # planted dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in semantic_duplicates(emb, dim=8, threshold=0.999).collect()
    }
    assert (0, 100) in got and got[(0, 100)] >= 0.999
    # candidate work is bounded by within-cluster pairs, not all-pairs
    n_cand = semantic_duplicates(emb, dim=8, threshold=-1.0).count()
    assert n_cand < 65 * 64 // 2
    # corpus_count short-circuit is equivalent
    got2 = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in semantic_duplicates(
            emb, dim=8, threshold=0.999, corpus_count=65
        ).collect()
    }
    assert got2 == got
