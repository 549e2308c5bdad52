"""Driver-contract extension queries, set 2: Union/Switch, ExactSequence,
Number, Optional(default=...), Unordered (greedy), complex
Required(Any(...)) keys, and ``transformers2`` = Capitalize + DefaultTo +
SetTo + Set + the Remove marker (its effect is hash-checked via the
``has_regionkey`` flag). IsTrue moved into entry_ext ``truthy_parse``,
FqdnUrl into ``url_email_checks``, Literal into ``equal_literal``.
Merged into __spark_entry__.queries()/oracle_sql()."""

from __future__ import annotations

from pyspark.sql import functions as F

from voluptuous_spark import (
    ALLOW_EXTRA,
    Any,
    Capitalize,
    DefaultTo,
    ExactSequence,
    In,
    Number,
    Optional,
    Range,
    Remove,
    Required,
    Schema,
    Set,
    SetTo,
    Union,
    Unordered,
)


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _union_value(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    res = Schema(
        {"value": Union(Range(min=0.0, max=50.0), In([99.0, 100.0]))},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["event_id"])
    return res.violations.select("event_id", "message", "error_type")


def _exactseq_pair(spark, sf_dir):
    # also exercises sequence-of-mapping schemas ([{...}] over an
    # array<struct> column, reference schema_builder.py:578-631 recursing
    # into _compile_mapping): per-element struct validation with the
    # runtime index in the violation path
    df = _t(spark, sf_dir, "events").select(
        "event_id",
        F.array(
            F.coalesce("value", F.lit(-1.0)),
            (F.col("user_id") % 600).cast("double"),
        ).alias("pair"),
        F.array(
            F.struct((F.col("user_id") % 11).cast("int").alias("a"),
                     F.col("event_type").alias("b")),
            F.struct((F.col("user_id") % 13).cast("int").alias("a"),
                     F.col("event_type").alias("b")),
        ).alias("recs"),
    )
    res = Schema(
        {"pair": ExactSequence([Range(min=0.0, max=50.0),
                                Range(min=0.0, max=500.0)]),
         "recs": [{"a": Range(min=0, max=9), "b": str}]},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["event_id"])
    return res.violations.select("event_id", "message", "error_type")


def _number_bal(spark, sf_dir):
    df = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.printf(F.lit("%.2f"), F.col("c_acctbal")).alias("bal")
    )
    res = Schema(
        {"bal": Number(precision=6, scale=2)}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["c_custkey"])
    return res.violations.select("c_custkey", "message", "error_type")


def _optional_default(spark, sf_dir):
    df = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 4 != 0, F.col("value")).alias("v"),
    )
    res = Schema(
        {Optional("v", default=-1.0): float}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["event_id"])
    return res.valid.select("event_id", "v")


def _unordered_pair(spark, sf_dir):
    # integral-valued doubles so the greedy error's str(value)
    # interpolation renders identically in Spark and DuckDB
    df = _t(spark, sf_dir, "events").select(
        "event_id",
        F.array(
            (F.col("user_id") % 7).cast("double"),
            (F.col("user_id") % 97).cast("double"),
        ).alias("pair"),
    )
    res = Schema(
        {"pair": Unordered([Range(min=0.0, max=6.0),
                            Range(min=20.0, max=90.0)])},
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["event_id"])
    return res.violations.select("event_id", "message", "error_type")


def _required_anyof(spark, sf_dir):
    df = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 5 == 0, F.col("value")).alias("a"),
        F.when(F.col("user_id") % 7 == 0, F.col("value")).alias("b"),
    )
    res = Schema(
        {Required(Any("a", "b")): object}, extra=ALLOW_EXTRA
    ).validate(df, id_cols=["event_id"])
    return res.violations.select("event_id", "message", "error_type")


def _transformers2(spark, sf_dir):
    df = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.lower("n_name").alias("lname"),
        F.when(F.col("n_nationkey") % 2 == 0, F.col("n_name")).alias(
            "maybe_name"
        ),
        F.array("n_name", "n_name").alias("arr"),
        F.lit(0).alias("answer"),
        "n_regionkey",
    )
    res = Schema(
        {
            "lname": Capitalize(),
            "maybe_name": DefaultTo("UNKNOWN"),
            "arr": Set(),
            "answer": SetTo(42),
            Remove("n_regionkey"): int,
        },
        extra=ALLOW_EXTRA,
    ).validate(df, id_cols=["n_nationkey"])
    # Remove marker effect (schema_builder.py:1217-1246) is hash-checked:
    # the pruned column must be absent from the validated output
    return res.valid.select(
        "n_nationkey", "lname", "maybe_name",
        F.array_join("arr", ",").alias("arr_str"), "answer",
        F.lit("n_regionkey" in res.valid.columns).alias("has_regionkey"),
    )


EXTRA2_QUERIES = {
    "union_value": _union_value,
    "exactseq_pair": _exactseq_pair,
    "number_bal": _number_bal,
    "optional_default": _optional_default,
    "unordered_pair": _unordered_pair,
    "required_anyof": _required_anyof,
    "transformers2": _transformers2,
}


EXTRA2_ORACLES = {
    "union_value": """
        -- deepest-error rule: first branch (Range) error surfaces
        SELECT event_id,
               CASE WHEN NOT (value >= 0.0) THEN 'value must be at least 0.0'
                    ELSE 'value must be at most 50.0' END AS message,
               'RangeInvalid' AS error_type
        FROM events
        WHERE value IS NOT NULL
          AND NOT (value >= 0.0 AND value <= 50.0)
          AND value NOT IN (99.0, 100.0)
    """,
    "exactseq_pair": """
        SELECT event_id,
               CASE
                 WHEN coalesce(value, -1.0) < 0.0
                   THEN 'value must be at least 0.0'
                 WHEN coalesce(value, -1.0) > 50.0
                   THEN 'value must be at most 50.0'
                 WHEN user_id % 600 > 500
                   THEN 'value must be at most 500.0'
               END AS message,
               'RangeInvalid' AS error_type
        FROM events
        WHERE NOT (coalesce(value, -1.0) BETWEEN 0.0 AND 50.0
                   AND user_id % 600 BETWEEN 0 AND 500)
        UNION ALL
        -- recs[0].a = user_id % 11, recs[1].a = user_id % 13, both
        -- validated against Range(0, 9) element-wise
        SELECT event_id, 'value must be at most 9' AS message,
               'RangeInvalid' AS error_type
        FROM events WHERE user_id % 11 > 9
        UNION ALL
        SELECT event_id, 'value must be at most 9' AS message,
               'RangeInvalid' AS error_type
        FROM events WHERE user_id % 13 > 9
    """,
    "number_bal": """
        SELECT c_custkey, 'Precision must be equal to 6' AS message,
               'Invalid' AS error_type
        FROM customer
        WHERE length(regexp_replace(printf('%.2f', c_acctbal),
                                    '[^0-9]', '', 'g')) <> 6
    """,

    "optional_default": """
        SELECT event_id,
               coalesce(CASE WHEN user_id % 4 <> 0 THEN value END, -1.0) AS v
        FROM events
    """,
    "unordered_pair": """
        -- greedy matcher (validators.py:1072-1088): element #0
        -- (user_id%7, always 0..6) consumes Range(0,6) first; element #1
        -- must then satisfy Range(20,90) or is reported with the
        -- reference's 'Element #i (v)' message
        SELECT event_id,
               'Element #1 (' || CAST(CAST(user_id % 97 AS DOUBLE) AS VARCHAR)
                 || ') is not valid against any validator' AS message,
               'Invalid' AS error_type
        FROM events
        WHERE NOT (user_id % 97 BETWEEN 20 AND 90)
    """,



    "required_anyof": """
        -- the reference emits TWO errors per unsatisfied complex-Required
        -- group: the group error (schema_builder.py:311-325) and the
        -- generic 'required key not provided' (:397-404)
        SELECT event_id, m.message,
               'RequiredFieldInvalid' AS error_type
        FROM events
        CROSS JOIN (
            SELECT 'at least one of [''a'', ''b''] is required' AS message
            UNION ALL SELECT 'required key not provided'
        ) m
        WHERE NOT ((user_id % 5 = 0 AND value IS NOT NULL)
                OR (user_id % 7 = 0 AND value IS NOT NULL))
    """,
    "transformers2": """
        SELECT n_nationkey,
               upper(substr(lower(n_name), 1, 1))
                 || substr(lower(n_name), 2) AS lname,
               CASE WHEN n_nationkey % 2 = 0 THEN n_name
                    ELSE 'UNKNOWN' END AS maybe_name,
               n_name AS arr_str,
               42 AS answer,
               FALSE AS has_regionkey
        FROM nation
    """,
}
