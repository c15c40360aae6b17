"""Scalar-function surface (SURVEY.md §2.8): math, date, array, and
conditional built-ins exercised in one oracle-checked projection each.

The reference's scalar usage is regex/split/trim/concat/base64/JSON/
datetime (each cited and covered by the extraction queries, §2.3); the
rows here are the engine-target additions — all pure `pyspark.sql.
functions`, whole-stage-codegen'd, zero Python.

Cross-engine notes baked into the oracles:
- Spark `dayofweek` is 1=Sunday..7; DuckDB `dayofweek` is 0=Sunday..6 —
  the Spark side subtracts 1.
- Spark `log` is natural log; DuckDB's is `ln`.
- Spark array indexing via `element_at` is 1-based, same as DuckDB lists.
- `sequence(1, n)` == DuckDB `range(1, n+1)` (end-exclusive there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load


@register(
    "fn_scalars",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           round(ln(l_extendedprice), 6) AS log_price,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           dayofweek(l_shipdate) AS ship_dow,
           date_trunc('month', l_shipdate)::DATE AS ship_month_start,
           datediff('day', DATE '1992-01-01', l_shipdate) AS days_since_epoch,
           len(range(1, l_linenumber + 1)) AS seq_len,
           list_contains(range(1, l_linenumber + 1), 3) AS has_three,
           list_reduce(list_prepend(0, range(1, l_linenumber + 1)), (s, x) -> s + x) AS seq_sum,
           list_transform(range(1, l_linenumber + 1), x -> x * 2)[1] AS first_doubled,
           array_to_string(list_sort(map_keys(MAP {'flag': l_returnflag, 'stat': l_linestatus})), ',') AS map_keys_sorted,
           MAP {'flag': l_returnflag, 'stat': l_linestatus}['flag'][1] AS map_flag,
           cardinality(MAP {'flag': l_returnflag, 'stat': l_linestatus}) AS map_n,
           CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS ret_label,
           coalesce(nullif(l_linestatus, 'O'), 'open') AS status_label
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags=("scalar", "math", "date", "array", "map", "conditional"),
)
def fn_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.8 scalar-function surface — math (`abs`, `pow`, `log`,
    `round`), date (`year`, `month`, `dayofweek`, `date_trunc`,
    `datediff`), array higher-order (`sequence`, `size`, `array_contains`,
    `aggregate`, `transform`, `element_at`), map (`create_map`,
    `map_keys`, `element_at`, `size`), and conditional (`when/otherwise`,
    `coalesce`/`nullif`) — in ONE codegen'd projection over the filtered
    lineitem scan. The per-family variants (fn_scalar_math_date /
    fn_scalar_map / fn_scalar_array_cond) remain registered for pytest
    parity."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    m = F.create_map(
        F.lit("flag"), F.col("l_returnflag"),
        F.lit("stat"), F.col("l_linestatus"),
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        F.trunc("l_shipdate", "month").alias("ship_month_start"),
        F.datediff("l_shipdate", F.lit("1992-01-01").cast("date")).alias("days_since_epoch"),
        F.size(seq).alias("seq_len"),
        F.array_contains(seq, 3).alias("has_three"),
        F.aggregate(seq, F.lit(0), lambda s, x: s + x).alias("seq_sum"),
        F.element_at(F.transform(seq, lambda x: x * 2), 1).alias("first_doubled"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_sorted"),
        F.element_at(m, "flag").alias("map_flag"),
        F.size(m).alias("map_n"),
        F.when(F.col("l_returnflag") == "R", "returned").otherwise("kept").alias("ret_label"),
        F.coalesce(F.nullif("l_linestatus", F.lit("O")), F.lit("open")).alias("status_label"),
    )


@register(
    "fn_scalar_math_date",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           round(ln(l_extendedprice), 6) AS log_price,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           dayofweek(l_shipdate) AS ship_dow,
           date_trunc('month', l_shipdate)::DATE AS ship_month_start,
           datediff('day', DATE '1992-01-01', l_shipdate) AS days_since_epoch
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags=("scalar", "math", "date"),
)
def fn_scalar_math_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math (`abs`, `pow`, `log`, `round`) and date (`year`, `month`,
    `dayofweek`, `date_trunc`, `datediff`) built-ins over the lineitem
    scan — one projection, fully codegen'd, the filter pushed to parquet."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        F.trunc("l_shipdate", "month").alias("ship_month_start"),
        F.datediff("l_shipdate", F.lit("1992-01-01").cast("date")).alias("days_since_epoch"),
    )


@register(
    "fn_scalar_map",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)})), ',') AS keys_sorted,
           MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'][1] AS type_val,
           cardinality(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS n_entries
    FROM events
    WHERE event_id % 25 = 0
    """,
    tags=("scalar", "map"),
)
def fn_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map built-ins (`create_map`, `map_keys`, `element_at`, `size`) —
    emitted as sorted-key strings and looked-up values, the type-stable
    cross-engine projection of a map column."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("n_entries"),
    )


@register(
    "fn_scalar_array_cond",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           len(range(1, l_linenumber + 1)) AS seq_len,
           list_contains(range(1, l_linenumber + 1), 3) AS has_three,
           list_reduce(list_prepend(0, range(1, l_linenumber + 1)), (s, x) -> s + x) AS seq_sum,
           list_transform(range(1, l_linenumber + 1), x -> x * 2)[1] AS first_doubled,
           CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS ret_label,
           coalesce(nullif(l_linestatus, 'O'), 'open') AS status_label
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags=("scalar", "array", "conditional"),
)
def fn_scalar_array_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array (`sequence`, `size`, `array_contains`, `aggregate`,
    `transform`, `element_at`) and conditional (`when/otherwise`,
    `coalesce`/`nullif`) built-ins — the same higher-order-function
    machinery the embedding arithmetic and fingerprint fold rely on,
    pinned here on exact integer semantics."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.size(seq).alias("seq_len"),
        F.array_contains(seq, 3).alias("has_three"),
        F.aggregate(seq, F.lit(0), lambda s, x: s + x).alias("seq_sum"),
        F.element_at(F.transform(seq, lambda x: x * 2), 1).alias("first_doubled"),
        F.when(F.col("l_returnflag") == "R", "returned").otherwise("kept").alias("ret_label"),
        F.coalesce(F.nullif("l_linestatus", F.lit("O")), F.lit("open")).alias("status_label"),
    )


@register(
    "fn_strings",
    oracle="""
    SELECT doc_id,
           levenshtein(left(text, 15), 'the quick brown') AS lev,
           reverse(lang) AS rlang,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded,
           split_part(source, '_', 1) AS src_head,
           strpos(text, 'spark') AS spark_pos,
           repeat(lang, 2) AS lang2
    FROM documents
    """,
    tags=("scalar", "string"),
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface beyond the regex/extract chain: levenshtein
    edit distance (the fuzzy-match primitive — join-key normalization and
    near-dup candidate scoring both reduce to it), reverse, pad, delimiter
    split, substring position, repeat. All JVM built-ins in one codegen'd
    projection; levenshtein is O(len²) per row, so at scale cap operand
    length (done here: 15 chars) or pre-filter with a cheap length/prefix
    gate before paying it."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein(F.substring("text", 1, 15), F.lit("the quick brown")).alias("lev"),
        F.reverse("lang").alias("rlang"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded"),
        F.substring_index("source", "_", 1).alias("src_head"),
        F.instr("text", "spark").alias("spark_pos"),
        F.repeat("lang", 2).alias("lang2"),
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN value = 0 THEN NULL ELSE round(100.0 / value, 6) END AS per_unit,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_or_null,
           CASE WHEN value >= 0 THEN round(sqrt(value), 6) END AS root
    FROM events
    WHERE event_id < 2000
    """,
    tags=("scalar", "robustness"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (ANSI mode's production posture):
    `try_divide` / `try_cast` / guarded math return NULL instead of
    failing the 100 TB job on the one malformed row in partition 9473.
    The reference's equivalent is its bare try/except returning 200 OK
    (`api/main.py:241-249`) — data loss; NULL-and-continue keeps the row
    auditable. Oracle recomputes each NULL case explicitly."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.lit(100.0), F.col("value")), 6).alias("per_unit"),
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k_or_null"),
        F.round(
            F.when(F.col("value") >= 0, F.sqrt("value")), 6
        ).alias("root"),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT lower(source) AS source_ci,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS source
          FROM documents)
    GROUP BY lower(source)
    """,
    tags=("scalar", "collation"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): group case-mangled
    source labels under the UTF8_LCASE collation — the engine-native way
    to make comparisons/grouping case-insensitive WITHOUT rewriting every
    expression in lower() (and, unlike lower(), collation survives into
    joins, ORDER BY, and DISTINCT with the same declaration). The output
    key is lowercased for the cross-engine hash only; the grouping itself
    runs on the collated column."""
    d = load(spark, sf_dir, "documents")
    mangled = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("source")
    )
    collated = mangled.select(F.expr("collate(source, 'UTF8_LCASE')").alias("source"))
    return collated.groupBy("source").agg(F.count("*").alias("n")).select(
        F.lower("source").alias("source_ci"), "n"
    )
