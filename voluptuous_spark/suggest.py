"""Constraint suggestion: profile a table and emit a ready-to-run
:class:`~voluptuous_spark.Schema` (the automated-data-validation loop —
profile once, validate every later delivery against what was observed).

The reference has no analog (it validates what you declare); this is a
north-star extension in the spirit of its DSL: the suggester SPEAKS the
DSL, emitting ``Required``/``Optional`` keys and ``Range``/``In``/
``Length`` validators, so a suggested schema is an ordinary Schema —
inspectable, editable, and compiled to the same vectorized plan.

Two profile sources:

- ``suggest_constraints(df)`` — profiles the DataFrame: ONE wide
  aggregation (the ``column_stats`` shape: counts, typed min/max,
  approx-distinct, string length bounds), plus one follow-up agg over
  just the low-cardinality columns to fetch their value sets (bounded
  collect_set — at most ``max_in_values + 1`` values are ever kept).
- ``suggest_from_stats(merged)`` — builds constraints from an existing
  merged SKETCH table (``CheckpointedValidation.merged_stats`` /
  ``merged_stream_stats`` output): zero reads of the original data, so
  last week's checkpointed run can gate next week's delivery without
  re-profiling 10^12 rows. Value sets aren't in the sketches, so
  categorical columns fall back to presence/length rules.

Suggested rules per column:
  - observed null_rate == 0           -> Required(col) (nulls violate)
  - 0 < null_rate <= null_tolerance   -> Required(col) still (flag rare
                                         nulls); above -> Optional(col)
  - numeric                           -> Range(min, max), optionally
                                         widened by ``range_slack``
  - string, distinct <= max_in_values -> In(sorted observed values)
  - string, high-cardinality          -> Length(min_len, max_len)
  - other types                       -> presence only
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dsl import ALLOW_EXTRA, All, In, Length, Optional, Range, Required
from .schema import Schema


def _numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def suggest_constraints(
    df: DataFrame,
    cols: typing.Sequence[str] | None = None,
    max_in_values: int = 20,
    null_tolerance: float = 0.0,
    range_slack: float = 0.0,
) -> dict:
    """Profile ``df`` and return the constraint spec: a dict
    ``{col: {"required": bool, "null_rate": float, "kind":
    "range"|"in"|"length"|"none", ...params}}``. Two aggregations total
    regardless of column count (see module docstring)."""
    cols = list(cols or df.columns)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise ValueError(
            f"columns not in the DataFrame: {unknown} "
            f"(available: {sorted(by_name)})"
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        x = F.col(c)
        aggs.append(F.sum(x.isNull().cast("long")).alias(f"__nc_{c}"))
        aggs.append(F.approx_count_distinct(x).alias(f"__d_{c}"))
        if _numeric(by_name[c]):
            d = x.cast("double")
            d = F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)
            aggs.append(F.min(d).alias(f"__mn_{c}"))
            aggs.append(F.max(d).alias(f"__mx_{c}"))
        elif isinstance(by_name[c], T.StringType):
            aggs.append(F.min(F.length(x)).alias(f"__ln_{c}"))
            aggs.append(F.max(F.length(x)).alias(f"__lx_{c}"))
    row = df.agg(*aggs).first()

    # follow-up: value sets for low-cardinality string columns only.
    # collect_set buffers DISTINCT values per partition; the slice cap
    # is applied after, so keep the candidate set honest: a column whose
    # approx-distinct exceeds the cap (with HLL headroom) never enters.
    in_cands = [
        c for c in cols
        if isinstance(by_name[c], T.StringType)
        and row[f"__d_{c}"] <= max_in_values * 1.2
    ]
    values = {}
    if in_cands:
        vrow = df.agg(*[
            F.slice(
                F.array_sort(F.collect_set(F.col(c))),
                1, max_in_values + 1,
            ).alias(c)
            for c in in_cands
        ]).first()
        values = {c: list(vrow[c]) for c in in_cands}

    n = row["__n"] or 0
    spec = {}
    for c in cols:
        nc = row[f"__nc_{c}"]
        null_rate = (nc / n) if n else 0.0
        ent: dict = {
            "required": null_rate <= null_tolerance,
            "null_rate": round(null_rate, 6),
            "kind": "none",
        }
        if _numeric(by_name[c]) and row[f"__mn_{c}"] is not None:
            lo, hi = row[f"__mn_{c}"], row[f"__mx_{c}"]
            pad = (hi - lo) * range_slack
            ent.update(kind="range", min=lo - pad, max=hi + pad,
                       integral=isinstance(
                           by_name[c], (T.IntegerType, T.LongType,
                                        T.ShortType, T.ByteType)))
        elif c in values and len(values[c]) <= max_in_values:
            ent.update(kind="in", values=values[c])
        elif isinstance(by_name[c], T.StringType) \
                and row[f"__ln_{c}"] is not None:
            ent.update(kind="length", min_len=row[f"__ln_{c}"],
                       max_len=row[f"__lx_{c}"])
        spec[c] = ent
    return spec


def suggest_from_stats(merged: DataFrame, null_tolerance: float = 0.0,
                       range_slack: float = 0.0) -> dict:
    """Constraint spec from a MERGED sketch-stats table (the
    ``merged_stats`` / ``merged_stream_stats`` output schema) — zero
    reads of the profiled data. Numeric columns get Range bounds from
    the folded min/max; non-numerics get presence rules only (value
    sets aren't carried by sketches)."""
    spec = {}
    for r in merged.collect():
        ent = {
            "required": (r["null_rate"] or 0.0) <= null_tolerance,
            "null_rate": round(r["null_rate"] or 0.0, 6),
            "kind": "none",
        }
        if r["mean"] is not None and r["min_value"] is not None:
            lo, hi = float(r["min_value"]), float(r["max_value"])
            pad = (hi - lo) * range_slack
            ent.update(kind="range", min=lo - pad, max=hi + pad,
                       integral=False)
        spec[r["column"]] = ent
    return spec


def schema_from_spec(spec: dict, extra=ALLOW_EXTRA) -> Schema:
    """Compile a constraint spec into an ordinary Schema: Required/
    Optional markers + Range/In/Length validators — the suggested
    schema validates through the same vectorized plan as a hand-written
    one, and can be ``.extend``-ed with hand rules afterwards."""
    mapping = {}
    for c, ent in spec.items():
        kind = ent.get("kind", "none")
        if kind == "range":
            lo, hi = ent["min"], ent["max"]
            if ent.get("integral"):
                lo, hi = int(lo), int(hi)
            v = Range(min=lo, max=hi)
        elif kind == "in":
            v = In(ent["values"])
        elif kind == "length":
            v = All(str, Length(min=ent["min_len"], max=ent["max_len"]))
        else:
            v = object
        key = Required(c) if ent.get("required") else Optional(c)
        mapping[key] = v
    return Schema(mapping, extra=extra)


def suggest_schema(
    df: DataFrame,
    cols: typing.Sequence[str] | None = None,
    max_in_values: int = 20,
    null_tolerance: float = 0.0,
    range_slack: float = 0.0,
    extra=ALLOW_EXTRA,
) -> tuple[Schema, dict]:
    """Profile ``df`` and return ``(schema, spec)`` — the one-call form:
    ``suggest_schema(last_week)[0].validate(this_week)`` gates a new
    delivery against everything observed last week."""
    spec = suggest_constraints(
        df, cols=cols, max_in_values=max_in_values,
        null_tolerance=null_tolerance, range_slack=range_slack,
    )
    return schema_from_spec(spec, extra=extra), spec
