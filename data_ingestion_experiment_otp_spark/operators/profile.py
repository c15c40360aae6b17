"""Corpus profiling / data-quality audit (engine addition, §2.10 family).

The audit pass a training-data pipeline runs before committing a dataset
version: per column — row count, null count, exact distinct count, numeric
min/max, string length statistics. One scan per table computes every
metric as a single wide aggregate row (all metrics partial-aggregate
map-side), then `stack` unpivots to one row per column — no per-column
rescans, which is the difference between 2 scans and 18 at 100 TB.

Exact `count(DISTINCT)` is used so the audit is oracle-checkable; at
extreme cardinalities swap `approx_count_distinct` per column (the HLL
trade documented in `agg_approx_distinct`).

Reference parity: the reference has no profiling; this is engine-target
surface grounded on the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load

# (table, column, kind) — kind drives which metrics apply
_PROFILE_COLS = (
    ("documents", "doc_id", "num"),
    ("documents", "lang", "str"),
    ("documents", "source", "str"),
    ("documents", "n_chars", "num"),
    ("events", "event_id", "num"),
    ("events", "user_id", "num"),
    ("events", "event_type", "str"),
    ("events", "value", "num"),
)


def _profile_table(df: DataFrame, table: str, cols) -> DataFrame:
    aggs = [F.count("*").alias("n_rows")]
    for c, kind in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if kind == "num":
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"{c}__min"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"{c}__max"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avglen"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
            aggs.append(F.round(F.avg(F.length(c)), 4).alias(f"{c}__avglen"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__avglen"
        for c, _ in cols
    )
    return wide.selectExpr(
        f"'{table}' AS table_name",
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, avg_len)",
    )


def _oracle_for(table: str, cols) -> str:
    parts = []
    for c, kind in cols:
        if kind == "num":
            mn = f"round(CAST(min({c}) AS DOUBLE), 6)"
            mx = f"round(CAST(max({c}) AS DOUBLE), 6)"
            al = "CAST(NULL AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            al = f"round(avg(length({c})), 4)"
        parts.append(
            f"SELECT '{table}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"'{c}' AS column_name, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {al} AS avg_len "
            f"FROM {table}"
        )
    return " UNION ALL ".join(parts)


@register(
    "meta_profile_tables",
    oracle=" UNION ALL ".join(
        _oracle_for(t, [(c, k) for tt, c, k in _PROFILE_COLS if tt == t])
        for t in ("documents", "events")
    ),
    tags=("profile", "audit"),
)
def meta_profile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column audit of documents + events: nulls, exact distincts,
    numeric min/max, string mean length — one wide aggregate per table,
    unpivoted with `stack`."""
    out = None
    for t in ("documents", "events"):
        cols = [(c, k) for tt, c, k in _PROFILE_COLS if tt == t]
        part = _profile_table(load(spark, sf_dir, t), t, cols)
        out = part if out is None else out.unionByName(part)
    return out
