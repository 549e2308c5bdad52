"""Boilerplate-line removal, source rebalancing, sequence packing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from voluptuous_spark.packing import (
    pack_assign,
    pack_stats,
    packing_efficiency,
)
from voluptuous_spark.sampling import rebalance_sources
from voluptuous_spark.textops import line_doc_frequency, remove_boilerplate

BP = "COOKIE BANNER: accept all"
NAV = "home | about | contact"


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (0, "a", f"{BP}\nunique zero\n{NAV}"),
        (1, "a", f"{BP}\nunique one"),
        (2, "a", f"{BP}\n{NAV}\nunique two\nunique two b"),
        (3, "a", f"{BP}\n{NAV}"),  # all boilerplate
        (4, "b", f"{BP}\nother-source unique"),  # BP rare in source b
        (5, "b", "plain document\nsecond line"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_line_doc_frequency(pages):
    dfreq = {
        (r["source"], r["line"]): r["df_docs"]
        for r in line_doc_frequency(pages).collect()
    }
    assert dfreq[("a", BP)] == 4
    assert dfreq[("a", NAV)] == 3
    assert dfreq[("b", BP)] == 1
    assert dfreq[("a", "unique zero")] == 1


def test_remove_boilerplate_per_source(pages):
    out = {r["doc_id"]: r for r in
           remove_boilerplate(pages, min_docs=3).collect()}
    assert out[0]["text"] == "unique zero"
    assert out[0]["lines_removed"] == 2
    assert out[1]["text"] == "unique one"
    assert out[2]["text"] == "unique two\nunique two b"  # order kept
    assert out[3]["text"] == "" and out[3]["lines_removed"] == 2
    # source b never crossed min_docs: its BP copy survives
    assert out[4]["text"] == f"{BP}\nother-source unique"
    assert out[5]["lines_removed"] == 0
    assert set(out[0].asDict()) == {
        "doc_id", "source", "text", "lines_removed"
    }


def test_remove_boilerplate_min_frac(pages):
    # min_frac=0.8: BP hits 4/4 docs of source a, NAV only 3/4 (0.75)
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate(pages, min_frac=0.8).collect()}
    assert out[3] == NAV  # NAV stays, BP removed
    assert out[0] == f"unique zero\n{NAV}"


def test_remove_boilerplate_duckdb_oracle(pages):
    """The whole pipeline replays in SQL: per-source line DF, flag,
    filter, ordered string_agg."""
    got = {r["doc_id"]: (r["text"], r["lines_removed"]) for r in
           remove_boilerplate(pages, min_docs=3).collect()}
    con = duckdb.connect()
    con.register("pages_pd", pages.toPandas())
    oracle = con.execute("""
        with lines as (
          select doc_id, source, s.x['pos'] as pos,
                 trim(s.x['line']) as line
          from pages_pd,
               lateral unnest(list_transform(
                 string_split(text, chr(10)),
                 (l, i) -> {'line': l, 'pos': i})) as s(x)
          where trim(s.x['line']) <> ''
        ),
        dfreq as (
          select source, line, count(distinct doc_id) df_docs
          from lines group by 1, 2
        ),
        flagged as (
          select l.*, (d.df_docs >= 3) as bp
          from lines l join dfreq d using (source, line)
        )
        select p.doc_id,
               coalesce(string_agg(case when not f.bp then f.line end,
                        chr(10) order by f.pos), '') as text,
               coalesce(sum(case when f.bp then 1 else 0 end), 0) as rem
        from pages_pd p left join flagged f using (doc_id)
        group by p.doc_id
    """).fetchall()
    assert {i: (t, int(r)) for i, t, r in oracle} == got


def test_rebalance_uniform(spark):
    # 3 sources with 600/300/100 rows -> uniform target keeps the
    # smallest whole and downsamples the others to ~100 each
    rows = [(i, "big" if i < 600 else ("mid" if i < 900 else "small"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = rebalance_sources(df, salt="r")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100  # binding source kept whole
    assert abs(counts["big"] - 100) <= 25
    assert abs(counts["mid"] - 100) <= 20
    # deterministic
    assert out.exceptAll(rebalance_sources(df, salt="r")).count() == 0


def test_rebalance_target_shares(spark):
    rows = [(i, "a" if i < 800 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = rebalance_sources(df, target={"a": 3.0, "b": 1.0}, salt="t")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # binding source: b (200/0.25=800 < 800/0.75=1067) kept whole;
    # a downsampled to ~600 for a 3:1 mix
    assert counts["b"] == 200
    assert abs(counts["a"] - 600) <= 40
    # a source with target share 0 is dropped
    out2 = rebalance_sources(df, target={"a": 1.0}, salt="t")
    assert out2.where(F.col("source") == "b").count() == 0


def test_pack_assign_invariants(spark):
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 700 + 50).alias("n_tokens"),
    )
    packed = pack_assign(df, budget=2048, n_buckets=8, salt="p")
    # every doc in exactly one pack
    assert packed.count() == 2_000
    stats = pack_stats(packed, 2048).collect()
    # pre-overflow total < budget: total - last doc's tokens < budget
    last = packed.withColumn(
        "__last",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("pack_bucket", "pack_id")
            .orderBy(F.desc("pack_pos"))
        ),
    ).where(F.col("__last") == 1).select(
        "pack_bucket", "pack_id", F.col("n_tokens").alias("last_tokens")
    )
    joined = {
        (r["pack_bucket"], r["pack_id"]): (r["tokens"], r["last_tokens"])
        for r in spark.createDataFrame(stats).join(
            last, ["pack_bucket", "pack_id"]
        ).collect()
    }
    for (b, p), (tot, lt) in joined.items():
        assert tot - lt < 2048, (b, p)
    eff = packing_efficiency(packed, 2048).collect()[0]
    assert eff["n_docs"] == 2_000
    assert eff["utilization"] > 0.85  # lanes fill well past the tails


def test_pack_md5_matches_duckdb(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 90 + 10).alias("n_tokens"),
    )
    got = {
        r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_pos"])
        for r in pack_assign(
            df, budget=256, n_buckets=4, salt="q", basis="md5"
        ).collect()
    }
    con = duckdb.connect()
    oracle = con.execute("""
        with t as (
          select i as doc_id, i % 90 + 10 as n_tokens,
                 cast(('0x' || substr(md5(i::varchar || ':q#b'), 1, 8))
                      as bigint) % 4 as b,
                 substr(md5(i::varchar || ':q'), 1, 15) as h
          from range(300) s(i)
        ),
        w as (
          select doc_id, b,
                 coalesce(sum(n_tokens) over
                   (partition by b order by h, doc_id
                    rows between unbounded preceding and 1 preceding), 0)
                   as prev,
                 row_number() over
                   (partition by b order by h, doc_id) as pos
          from t
        )
        select doc_id, b, cast(floor(prev / 256) as int), pos from w
    """).fetchall()
    assert {i: (b, p, pos) for i, b, p, pos in oracle} == got


def test_doc_domains_and_blocklist(spark):
    from voluptuous_spark.textops import (
        doc_domains,
        drop_blocklisted,
        flag_blocklisted,
    )

    rows = [
        (0, "see https://Example.com/page and http://sub.example.com/x"),
        (1, "links to https://ads.evil.com/track?id=1 here"),
        (2, "mentions https://evil.com twice https://evil.com/a"),
        (3, "no urls at all"),
        (4, "https://good.org/path plus http://evil.company.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    doms = {(r["doc_id"], r["domain"]) for r in doc_domains(df).collect()}
    assert (0, "example.com") in doms and (0, "sub.example.com") in doms
    assert (2, "evil.com") in doms
    # distinct per doc: evil.com appears once for doc 2
    assert sum(1 for d in doms if d[0] == 2) == 1
    assert not any(d[0] == 3 for d in doms)

    flagged = {r["doc_id"]: r["blocked_domain"] for r in
               flag_blocklisted(df, ["evil.com"]).collect()}
    assert flagged[1] == "ads.evil.com"  # subdomain blocked
    assert flagged[2] == "evil.com"
    assert flagged[0] is None and flagged[3] is None
    # evil.company.org is NOT a subdomain of evil.com
    assert flagged[4] is None

    kept = sorted(r["doc_id"] for r in
                  drop_blocklisted(df, ["evil.com"]).collect())
    assert kept == [0, 3, 4]
    # plan: pure projection/filter, no Exchange
    plan = (flag_blocklisted(df, ["evil.com"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_cap_per_domain(spark):
    from voluptuous_spark.textops import cap_per_domain

    df = spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "megasite.com")
        .otherwise("small.org").alias("source"),
    )
    capped = cap_per_domain(df, 50, salt="c")
    counts = {r["source"]: r["n"] for r in
              capped.groupBy("source").agg(F.count("*").alias("n"))
              .collect()}
    assert counts["megasite.com"] == 50  # mega-site capped
    assert counts["small.org"] == 50
    # deterministic
    assert capped.exceptAll(cap_per_domain(df, 50, salt="c")).count() == 0
